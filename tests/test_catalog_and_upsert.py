"""HyCatalog namespace surface, MOR upsert, metrics port."""

import pytest

from iceberg_hybrid_spark.control.metrics import Metrics
from iceberg_hybrid_spark.lake.catalog import HyCatalog, NoSuchTable
from iceberg_hybrid_spark.lake.table import HyTable


@pytest.fixture()
def catalog(spark, tmp_path):
    return HyCatalog(spark, str(tmp_path / "wh"))


def test_catalog_lifecycle(spark, catalog):
    df = spark.range(10).toDF("id")
    assert not catalog.table_exists("analytics.user_events")
    catalog.create_table("analytics.user_events", df)
    catalog.create_table("analytics.page_views", df)
    catalog.create_table("sales.orders", df)
    assert catalog.table_exists("analytics.user_events")
    assert catalog.list_namespaces() == ["analytics", "sales"]
    assert catalog.list_tables("analytics") == [
        "analytics.page_views", "analytics.user_events"
    ]
    t = catalog.load_table("analytics.user_events")
    assert t.read().count() == 10
    assert catalog.drop_table("analytics.page_views")
    assert catalog.list_tables("analytics") == ["analytics.user_events"]
    assert not catalog.drop_table("analytics.page_views")  # idempotent
    with pytest.raises(NoSuchTable):
        catalog.load_table("analytics.nope")
    with pytest.raises(ValueError):
        catalog.load_table("no_namespace")


def test_catalog_pagination(spark, catalog):
    df = spark.range(1).toDF("id")
    for i in range(5):
        catalog.create_table(f"ns.t{i}", df)
    page, more = catalog.list_tables_paginated("ns", page_size=2, offset=2)
    assert page == ["ns.t2", "ns.t3"] and more
    page, more = catalog.list_tables_paginated("ns", page_size=2, offset=4)
    assert page == ["ns.t4"] and not more
    with pytest.raises(ValueError):
        catalog.list_tables_paginated("ns", page_size=20_000)


def test_upsert_mor_single_commit(spark, tmp_path):
    t = HyTable(spark, str(tmp_path / "t"))
    t.create(spark.range(0, 100).selectExpr("id", "CAST(0 AS LONG) AS version"))
    src = spark.createDataFrame(
        [(5, 1), (50, 1), (200, 1)], "id long, version long"
    )
    snap = t.upsert_mor(src, ["id"])
    assert snap.operation == "upsert_mor"
    assert snap.sequence_number == 2  # ONE commit for data + delete
    assert t.read().count() == 101  # 100 - 2 replaced + 3 source
    versions = {r.id: r.version for r in t.read().collect() if r.id in (5, 50, 200, 7)}
    assert versions[5] == 1 and versions[50] == 1 and versions[200] == 1
    assert versions[7] == 0  # untouched
    # repeated upsert of the same keys keeps exactly-one-row-per-key
    t.upsert_mor(spark.createDataFrame([(5, 2)], "id long, version long"), ["id"])
    rows = t.read(preds=[("id", "=", 5)]).collect()
    assert len(rows) == 1 and rows[0].version == 2


def test_upsert_mor_then_compact(spark, tmp_path):
    t = HyTable(spark, str(tmp_path / "t"))
    t.create(spark.range(0, 50).selectExpr("id", "id AS v"))
    t.upsert_mor(spark.createDataFrame([(1, -1)], "id long, v long"), ["id"])
    t.rewrite_data_files(target_file_size_bytes=10**9)
    assert all(f.content == "data" for f in t.current_snapshot().manifest)
    assert t.read().count() == 50
    assert t.read(preds=[("id", "=", 1)]).collect()[0].v == -1


def test_metrics(spark):
    m = Metrics(spark)
    m.increment("files_copied", 3)
    m.increment("files_copied", 2)
    m.observe("mirror_lag_seconds", 12.5)
    # executor-side increments via accumulator
    acc = m.counter("rows_seen")
    spark.sparkContext.parallelize(range(100), 4).foreach(lambda _: acc.add(1))
    snap = m.snapshot()
    assert snap["files_copied"] == 5
    assert snap["rows_seen"] == 100
    assert snap["mirror_lag_seconds"] == 12.5


def test_incremental_view_maintenance_equals_full_recompute(spark, tmp_path):
    """The changelog-delta-maintained aggregate equals a full recompute
    of the final snapshot — the IVM correctness invariant, checked
    against the live table rather than the fixture-derived oracle."""
    from pyspark.sql import functions as F

    from iceberg_hybrid_spark.lake.table import HyTable
    from iceberg_hybrid_spark.queries.lake_ops import (
        incremental_view_maintenance,
    )
    from iceberg_hybrid_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r["lang"]: (r["n_docs"], r["total_chars"])
        for r in incremental_view_maintenance(spark, sf).collect()
    }

    # full recompute of the same final state, built independently
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    t = HyTable(spark, str(tmp_path / "ivm_ref"))
    t.create(docs.filter(F.col("doc_id") % 3 == 0).coalesce(1))
    t.append(docs.filter(F.col("doc_id") % 3 == 1).coalesce(1))
    t.delete_where([("lang", "=", "de")])
    want = {
        r["lang"]: (r["n_docs"], r["total_chars"])
        for r in t.read()
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
        )
        .collect()
    }
    assert got == want
    assert "de" not in got  # fully-deleted group dropped out
