"""Bounded-residency pin for the connected-components fixpoint.

Before the r12 optimization pass, every fixpoint iteration's
localCheckpoint (labels snapshots + the edge relation) stayed resident
for the life of the SparkContext — one whole ladder of dead RDDs per
invocation, the same accumulation class test_checkpoint_residency.py
pins for the kmv / pipeline_health checkpoints, and a measurable
monotonic drag on long sessions (the bench loops this operator's four
consumers).  Now each iteration frees its predecessor, the edge
checkpoint is freed at exit, and the ONE surviving checkpoint (the
final labels — the function's return value) is registry-bounded under
the ``connected_components_labels`` tag, so repeated invocations hold
a constant block population.
"""

from __future__ import annotations

from iceberg_hybrid_spark.functions.dedup import connected_components


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _pairs(spark, offset: int = 0):
    # two chains and an isolated pair; offset varies ids across runs so
    # a stale cached relation can't masquerade as a fresh result
    rows = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
    return spark.createDataFrame(
        [(a + offset, b + offset) for a, b in rows], ["id_a", "id_b"]
    )


def test_connected_components_residency_bounded(spark):
    comps = {
        r.node: r.component
        for r in connected_components(_pairs(spark)).collect()
    }
    assert comps[3] == 1 and comps[23] == 20 and comps[11] == 10
    baseline = _persistent_rdd_count(spark)
    # repeated invocations (the scheduled / bench shape): the persistent
    # RDD population must not grow — each run frees its predecessor's
    # final checkpoint and every intermediate of its own
    for i in range(1, 4):
        out = {
            r.node: r.component
            for r in connected_components(_pairs(spark, 100 * i)).collect()
        }
        assert out[3 + 100 * i] == 1 + 100 * i
        assert _persistent_rdd_count(spark) == baseline


def test_connected_components_consume_before_next_invocation(spark):
    """Pin the documented RETURN CONTRACT: invocation N+1 frees
    invocation N's checkpoint blocks, so a result held lazily across
    the next invocation fails on execution (missing checkpoint blocks)
    rather than silently returning stale rows.  Every in-repo consumer
    builds-and-consumes serially; this pins what a NEW caller that
    doesn't must expect."""
    import time

    first = connected_components(_pairs(spark))
    assert first.count() == 9  # consumed while its blocks are live: fine
    second = connected_components(_pairs(spark, 1000))
    # re-executing the FIRST result after the second invocation ran
    # must fail: its localCheckpoint blocks were freed by the registry
    # (unpersist is non-blocking, so allow the removal a moment to land
    # — a localCheckpoint is non-replayable, so once the blocks are
    # gone the only possible outcome is an error, never stale rows)
    raised = None
    deadline = time.time() + 10
    while time.time() < deadline and raised is None:
        try:
            first.collect()
            time.sleep(0.2)
        except Exception as e:  # noqa: BLE001 — the error IS the pin
            raised = e
    assert raised is not None, (
        "collecting invocation N's labels after invocation N+1 must "
        "fail (bounded-residency RETURN CONTRACT)"
    )
    assert second.count() == 9  # the live invocation is unaffected
