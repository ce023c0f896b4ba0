"""Merge-on-read deletes (equality + position delete files) — the
reference's ContentType trio (legacy FileRef.java:3-4, ContentType.java:2)."""

import pytest

from iceberg_hybrid_spark.lake.table import HyTable


@pytest.fixture()
def table(spark, tmp_path):
    t = HyTable(spark, str(tmp_path / "tbl"))
    df = spark.range(0, 100).selectExpr("id", "id % 5 AS grp")
    t.create(df.repartitionByRange(4, "id"))
    return t


def test_equality_delete_subtracts_on_read(table):
    snap = table.delete_where_mor([("grp", "=", 2)], delete_cols=["id"])
    assert snap.operation == "delete_mor"
    # no data file rewritten — manifest gained exactly one delete file
    kinds = [f.content for f in snap.manifest]
    assert kinds.count("equality_delete") == 1
    assert kinds.count("data") == 4
    assert table.read().count() == 80
    assert table.read(preds=[("grp", "=", 2)]).count() == 0
    # time travel before the delete still sees the rows
    assert table.read(seq=1).count() == 100


def test_equality_delete_sequence_rule(spark, table):
    """Rows re-inserted AFTER the delete must survive (Iceberg sequence
    semantics: deletes only apply to older data files)."""
    table.delete_where_mor([("id", "<", 10)], delete_cols=["id"])
    assert table.read().count() == 90
    table.append(spark.createDataFrame([(5, 0)], "id long, grp long"))
    rows = table.read(preds=[("id", "=", 5)]).collect()
    assert len(rows) == 1  # the re-inserted row is visible


def test_position_delete(table):
    snap = table.delete_positions_mor([("id", ">=", 95)])
    assert [f.content for f in snap.manifest].count("position_delete") == 1
    assert table.read().count() == 95
    assert table.read(preds=[("id", ">=", 90)]).count() == 5


def test_mixed_deletes_and_compaction(spark, table):
    table.delete_where_mor([("grp", "=", 0)], delete_cols=["id"])   # -20
    table.delete_positions_mor([("id", "=", 1)])                    # -1
    assert table.read().count() == 79
    # compaction materializes the deletes into pure data files
    snap = table.rewrite_data_files(target_file_size_bytes=10**9)
    assert all(f.content == "data" for f in snap.manifest)
    assert table.read().count() == 79


def test_mor_delete_no_match_is_noop(table):
    seq = table.current_snapshot().sequence_number
    table.delete_where_mor([("id", ">", 10_000)], delete_cols=["id"])
    assert table.current_snapshot().sequence_number == seq


def test_mor_on_partitioned_table(spark, tmp_path):
    t = HyTable(spark, str(tmp_path / "ptbl"))
    t.create(
        spark.range(0, 60).selectExpr("id", "id % 3 AS part"),
        partition_by=["part"],
    )
    t.delete_where_mor([("part", "=", 1)], delete_cols=["id"])
    assert t.read().count() == 40
    assert t.read(preds=[("part", "=", 1)]).count() == 0
