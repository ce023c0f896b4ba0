"""Bounded-residency pins for the localCheckpoint-ing operators.

The r11 advisor found pipeline_health's localCheckpoint accumulating
blocks across repeated scheduled invocations; r11 fixed it with an
unpersist-previous pattern, and the r11 verdict (What's wrong #2/#3)
asked for two things this file delivers:

1. the same fix applied to kmv_source_overlap_sketch's bottom-K
   checkpoint (queries/pipeline.py, `_checkpoint_bounded`);
2. a COMMITTED regression test that FAILS if the persistent-RDD count
   grows across repeated invocations — the unpersist path reaches
   through private JVM internals (`_jdf.queryExecution().analyzed()
   .rdd()`) behind a broad except, so any Spark-internals change that
   silently breaks it must turn the suite red, not silently restore
   the leak.
"""

from __future__ import annotations

import pytest

from iceberg_hybrid_spark.queries.lake_ops import embedding_pq_ann_appended
from iceberg_hybrid_spark.queries.pipeline import (
    _checkpoint_bounded,
    kmv_source_overlap_sketch,
    pipeline_health,
)

SF_DIR = "/root/testdata/sf0.001"


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_checkpoint_bounded_frees_previous(spark):
    base = _persistent_rdd_count(spark)
    df = spark.range(100).toDF("id")
    first = _checkpoint_bounded(df, "residency_unit_tag")
    assert first.count() == 100
    after_first = _persistent_rdd_count(spark)
    assert after_first == base + 1
    # five more invocations under the same tag: the count must NOT grow
    for _ in range(5):
        out = _checkpoint_bounded(spark.range(100).toDF("id"),
                                  "residency_unit_tag")
        assert out.count() == 100
    assert _persistent_rdd_count(spark) == after_first


def test_checkpoint_bounded_tags_are_independent(spark):
    base = _persistent_rdd_count(spark)
    a = _checkpoint_bounded(spark.range(10).toDF("id"), "residency_tag_a")
    b = _checkpoint_bounded(spark.range(10).toDF("id"), "residency_tag_b")
    assert a.count() == b.count() == 10
    # two distinct tags hold two slots; re-running one frees only its own
    _checkpoint_bounded(spark.range(10).toDF("id"), "residency_tag_a")
    assert _persistent_rdd_count(spark) == base + 2
    assert b.count() == 10  # tag_b's blocks untouched


@pytest.mark.parametrize(
    "op",
    [pipeline_health, kmv_source_overlap_sketch, embedding_pq_ann_appended],
    ids=["pipeline_health", "kmv_sketch", "pq_append"],
)
def test_scheduled_operators_do_not_accumulate_blocks(spark, op):
    """Three scheduled runs of each checkpointing operator: the
    persistent-RDD population after run N+1 equals the population
    after run 1 (the previous run's checkpoint is freed, the new one
    registered — net zero growth).  Fails on the pre-r11 behavior
    (monotone growth, one leaked checkpoint per run)."""
    op(spark, SF_DIR).collect()  # establish this operator's slot
    baseline = _persistent_rdd_count(spark)
    for _ in range(2):
        rows = op(spark, SF_DIR).collect()
        assert rows  # the operator still returns its relation
        assert _persistent_rdd_count(spark) == baseline
