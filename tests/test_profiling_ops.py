"""Semantic invariants for the round-9 profiling operators: the
context-length packing sweep must agree with the single-size packer and
behave monotonically in the window size; the ANALYZE-style column
profile must match independently computed statistics."""

import os

import pyspark.sql.functions as F

from iceberg_hybrid_spark.queries.advanced import column_stats_profile
from iceberg_hybrid_spark.queries.pipeline import (
    packing_efficiency_sweep,
    sequence_packing,
    strip_boilerplate_text,
)
from iceberg_hybrid_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_packing_sweep_agrees_with_single_size_packer(spark):
    sweep = {r.ctx: r for r in packing_efficiency_sweep(spark, SF_DIR).collect()}
    assert set(sweep) == {512, 1024, 2048, 4096}
    single = sequence_packing(spark, SF_DIR).collect()
    # n_bins is per-lang max(bin)+1 — windows the corpus NEEDS, counting
    # windows an oversize doc spills through, so compare against the
    # same max-based count, not the occupied-group count (which skips
    # bins an oversize doc jumped over)
    per_lang_max = {}
    for r in single:
        per_lang_max[r.lang] = max(per_lang_max.get(r.lang, -1), r.bin)
    assert sweep[512].n_bins == sum(m + 1 for m in per_lang_max.values())
    assert sweep[512].total_tokens == sum(r.bin_tokens for r in single)
    # the sweep never under-counts occupied windows
    assert sweep[512].n_bins >= len({(r.lang, r.bin) for r in single})


def test_packing_sweep_monotonicity(spark):
    rows = packing_efficiency_sweep(spark, SF_DIR).collect()
    by_ctx = sorted(rows, key=lambda r: r.ctx)
    tokens = {r.total_tokens for r in by_ctx}
    assert len(tokens) == 1, "total tokens are ctx-independent"
    bins = [r.n_bins for r in by_ctx]
    assert bins == sorted(bins, reverse=True), "bigger windows, fewer bins"
    oversize = [r.oversize_docs for r in by_ctx]
    assert oversize == sorted(oversize, reverse=True)
    for r in by_ctx:
        assert r.capacity_tokens == r.n_bins * r.ctx
        assert r.fill_ratio > 0.0


def test_strip_boilerplate_removes_shared_block_keeps_prose(spark, tmp_path):
    """An 8-token block planted in 3 docs is stripped from all three;
    each document's unique prose survives byte-exactly (md5-checked);
    a 2-doc shared block is below the df >= 3 bar and stays."""
    import hashlib

    boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    rare = "r1 r2 r3 r4 r5 r6 r7 r8"  # shared by only 2 docs: kept
    # tokens FLANKING the boilerplate are doc-unique, so the only
    # df >= 3 window is the block itself (a shared neighbor would put
    # the straddling window over the bar too — correct, but not what
    # this test pins)
    docs = {
        1: (f"alpha one1 {boiler} tail1 end1", "alpha one1 tail1 end1"),
        2: (f"beta two2 {boiler} tail2 end2", "beta two2 tail2 end2"),
        3: (f"gamma th3 {boiler} tail3 end3", "gamma th3 tail3 end3"),
        4: (f"delta four {rare} tail four", None),  # nothing stripped
        5: (f"epsi five {rare} tail five", None),
    }
    rows = [(i, t, "en", "s") for i, (t, _) in docs.items()]
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("bigint")).coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = {r.doc_id: r for r in strip_boilerplate_text(spark, sf).collect()}
    assert set(out) == {1, 2, 3}, out  # rare block never reaches df >= 3
    for i in (1, 2, 3):
        expect = docs[i][1]
        r = out[i]
        assert r.removed_tokens == 8 and r.kept_tokens == 4, r
        assert r.cleaned_md5 == hashlib.md5(expect.encode()).hexdigest(), r


def test_column_stats_match_direct_computation(spark):
    out = {r.col_name: r for r in column_stats_profile(spark, SF_DIR).collect()}
    orders = load_table(spark, SF_DIR, "orders")
    n = orders.count()
    for r in out.values():
        assert r.n_rows == n
    direct = orders.agg(
        F.countDistinct("o_orderkey").alias("k"),
        F.countDistinct("o_orderstatus").alias("s"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("cn"),
    ).collect()[0]
    assert out["o_orderkey"].ndv_exact == direct.k
    assert out["o_orderstatus"].ndv_exact == direct.s
    assert out["o_totalprice"].min_num == direct.mn
    assert out["o_totalprice"].max_num == direct.mx
    assert out["o_custkey"].n_nulls == direct.cn
    # representation contract: numeric columns carry no string min/max
    assert out["o_orderkey"].min_str is None
    assert out["o_orderstatus"].min_num is None
    # date column formats as YYYY-MM-DD
    assert len(out["o_orderdate"].min_str) == 10


def test_column_stats_planted_nulls_and_ndv(spark, tmp_path):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    from datetime import datetime

    rows = [
        (1, 10, "A", 5.0, datetime(2024, 1, 1), "P1"),
        (2, None, "A", 7.5, datetime(2024, 6, 15), "P2"),
        (3, 10, "B", None, datetime(2024, 12, 31), "P1"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "orders.parquet")
    )
    out = {r.col_name: r for r in column_stats_profile(spark, sf).collect()}
    assert out["o_custkey"].n_nulls == 1 and out["o_custkey"].ndv_exact == 1
    assert out["o_totalprice"].n_nulls == 1
    assert out["o_totalprice"].min_num == 5.0
    assert out["o_totalprice"].max_num == 7.5
    assert out["o_orderstatus"].ndv_exact == 2
    assert out["o_orderdate"].min_str == "2024-01-01"
    assert out["o_orderdate"].max_str == "2024-12-31"
    # tiny cardinalities: the sketch must sit inside its bound
    assert all(r.approx_within_bounds for r in out.values())


def test_column_stats_all_null_and_empty_table(spark, tmp_path):
    """An all-NULL column must profile (ndv 0, bounds TRUE — not an ANSI
    DIVIDE_BY_ZERO), and an empty table must still return one row per
    column, matching the oracle's per-column aggregates."""
    from datetime import datetime

    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    schema = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    rows = [
        (1, None, "A", 5.0, datetime(2024, 1, 1), "P1"),
        (2, None, "B", 6.0, datetime(2024, 2, 1), "P2"),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(sf, "orders.parquet"))
    out = {r.col_name: r for r in column_stats_profile(spark, sf).collect()}
    assert out["o_custkey"].ndv_exact == 0
    assert out["o_custkey"].n_nulls == 2
    assert out["o_custkey"].approx_within_bounds is True
    # empty table: one row per profiled column, all zeros/NULLs
    sf2 = str(tmp_path / "sf2")
    os.makedirs(sf2, exist_ok=True)
    spark.createDataFrame([], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(sf2, "orders.parquet"))
    empty = column_stats_profile(spark, sf2).collect()
    assert len(empty) == 6
    for r in empty:
        assert r.n_rows == 0 and r.ndv_exact == 0
        assert r.approx_within_bounds is True
        assert r.min_num is None and r.min_str is None
