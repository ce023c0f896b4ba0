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
