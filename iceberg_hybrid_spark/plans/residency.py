"""Bounded-residency localCheckpoint registry (r12).

localCheckpoint(eager=True) materializes blocks that outlive the
DataFrame unless explicitly unpersisted; operators that checkpoint per
invocation (scheduled monitors, streaming micro-batches) would
accumulate one checkpoint per run.  This registry keeps AT MOST ONE
resident checkpoint per (tag, SparkContext): each call unpersists the
previous checkpoint registered under its tag before creating its own.

RETURN CONTRACT for callers: lineage is truncated, so a DataFrame
returned by invocation N of a tag must be fully consumed before
invocation N+1 runs in the same context — N+1 frees N's blocks, and
executing N's result afterwards fails with missing-block errors.
Scheduled monitors and foreachBatch drains consume-then-discard, which
is exactly this contract.  tests/test_checkpoint_residency.py pins
that the persistent-RDD count does not grow across invocations."""

from __future__ import annotations

from pyspark.sql import DataFrame

_CHECKPOINT_RESIDENCY: dict = {}


def free_checkpoint(df: DataFrame | None) -> None:
    """Unpersist a checkpointed DataFrame's materialized blocks.

    The ONE shared copy of the guarded LogicalRDD reach-through
    (private JVM internals — a Spark upgrade that changes the py4j
    surface breaks exactly this function, nowhere else).  Safe on
    None, on never-persisted frames, and on stopped/replaced contexts:
    failures mean there is nothing to free."""
    if df is None:
        return
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def checkpoint_bounded(df: DataFrame, tag: str) -> DataFrame:
    """localCheckpoint(eager) with bounded residency: unpersist the
    previous checkpoint registered under ``tag`` for this SparkContext
    (reached through its LogicalRDD plan node — private JVM internals,
    guarded; the regression test fails if the block count grows)."""
    return register_checkpointed(df.localCheckpoint(eager=True), tag)


def register_checkpointed(out: DataFrame, tag: str) -> DataFrame:
    """Bounded-residency registration for an ALREADY-checkpointed
    DataFrame: free the previous checkpoint registered under ``tag``
    (same contract as :func:`checkpoint_bounded` — the caller of
    invocation N must consume its result before invocation N+1 runs).
    For operators that materialize internally (e.g. the
    connected-components fixpoint, whose return value IS its final
    iteration's checkpoint) and only need the cross-invocation bound."""
    app_id = out.sparkSession.sparkContext.applicationId
    # Evict bookkeeping for OTHER applicationIds: a replaced
    # SparkContext gets a fresh id, so entries under old ids are
    # unreachable forever and would pin dead py4j handles in a
    # long-lived driver (test suites, notebooks, schedulers).  The
    # registry therefore serves one active context at a time — the
    # library's own deployment shape; interleaving two live contexts
    # would merely drop the older one's unpersist bookkeeping.
    for k in [k for k in _CHECKPOINT_RESIDENCY if k[1] != app_id]:
        _CHECKPOINT_RESIDENCY.pop(k, None)
    ctx_key = (tag, app_id)
    free_checkpoint(_CHECKPOINT_RESIDENCY.get(ctx_key))
    _CHECKPOINT_RESIDENCY[ctx_key] = out
    return out
