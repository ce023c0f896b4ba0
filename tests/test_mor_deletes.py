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


# ---- COW rewrites over MOR deletes (resurrection guard) --------------------


def test_cow_delete_preserves_equality_deletes(table):
    """A COW rewrite re-adds rows at a new higher added_seq, so without a
    delete-applying read the old equality delete would stop applying and
    MOR-deleted rows would be resurrected."""
    table.delete_where_mor([("grp", "=", 2)], delete_cols=["id"])    # -20
    table.delete_where([("grp", "=", 3)])                            # -20 COW
    assert table.read().count() == 60
    assert table.read(preds=[("grp", "=", 2)]).count() == 0
    # every data file was rewritten -> the equality delete is fully
    # materialized and its ref dropped from the manifest
    assert all(f.content == "data" for f in table.current_snapshot().manifest)


def test_cow_update_preserves_equality_deletes(table):
    table.delete_where_mor([("id", "<", 10)], delete_cols=["id"])    # -10
    table.update_where([("id", ">=", 90)], {"grp": "grp + 100"})
    assert table.read().count() == 90
    assert table.read(preds=[("id", "<", 10)]).count() == 0
    assert table.read(preds=[("id", "=", 95)]).collect()[0].grp == 100


def test_cow_merge_preserves_equality_deletes(spark, table):
    table.delete_where_mor([("id", "<", 10)], delete_cols=["id"])    # -10
    src = spark.createDataFrame([(50, 999)], "id long, grp long")
    table.merge(src, ["id"])
    assert table.read().count() == 90
    assert table.read(preds=[("id", "=", 50)]).collect()[0].grp == 999
    assert table.read(preds=[("id", "<", 10)]).count() == 0


def test_cow_delete_preserves_position_deletes(table):
    table.delete_positions_mor([("id", "=", 7)])                     # -1
    table.delete_where([("grp", "=", 4)])                            # -20 COW
    assert table.read().count() == 79
    assert table.read(preds=[("id", "=", 7)]).count() == 0
    # all referenced files rewritten -> position delete pruned
    assert all(f.content == "data" for f in table.current_snapshot().manifest)


def test_upsert_mor_then_cow_merge(spark, table):
    """MOR upsert's equality delete must keep hiding the old key version
    through a later COW merge of the same file."""
    table.upsert_mor(
        spark.createDataFrame([(5, 500), (200, 0)], "id long, grp long"), ["id"]
    )
    assert table.read().count() == 101
    table.merge(spark.createDataFrame([(6, 600)], "id long, grp long"), ["id"])
    assert table.read().count() == 101
    five = table.read(preds=[("id", "=", 5)]).collect()
    assert len(five) == 1 and five[0].grp == 500
    assert table.read(preds=[("id", "=", 6)]).collect()[0].grp == 600


def test_partial_cow_keeps_needed_delete_file(spark, table):
    """A COW rewrite touching only SOME files must keep the equality
    delete ref alive for the untouched ones."""
    table.delete_where_mor([("grp", "=", 1)], delete_cols=["id"])    # -20
    # merge with a tight key range -> only the file containing id=2
    table.merge(spark.createDataFrame([(2, 700)], "id long, grp long"), ["id"])
    kinds = [f.content for f in table.current_snapshot().manifest]
    assert kinds.count("equality_delete") == 1   # still needed elsewhere
    assert table.read().count() == 80            # grp=1 rows still hidden
    assert table.read(preds=[("grp", "=", 1)]).count() == 0


def test_read_tag_applies_mor_deletes(table):
    """A tag pinned after an MOR delete must replay the delete files,
    not load them as data (regression: read_tag used to pass the full
    manifest — including delete files — straight to the scan)."""
    table.delete_where_mor([("grp", "=", 2)], delete_cols=["id"])
    table.create_tag("after_delete")
    tagged = table.read_tag("after_delete")
    assert tagged.count() == 80
    assert set(tagged.columns) == {"id", "grp"}  # no __file/__pos/__seq leak
    assert tagged.filter("grp = 2").count() == 0


def test_read_branch_applies_mor_deletes(spark, table):
    table.delete_positions_mor([("id", ">=", 95)])
    table.create_branch("pinned")
    # main moves on; the branch stays at the post-delete snapshot
    table.append(spark.createDataFrame([(500, 0)], "id long, grp long"))
    branched = table.read_branch("pinned")
    assert branched.count() == 95
    assert set(branched.columns) == {"id", "grp"}


def test_many_delete_files_stay_linear(spark, table):
    """Plan growth regression: 15 equality-delete commits must read
    correctly and produce a plan LINEAR in delete files.  The pre-fix
    apply path split the scan into old/new branches per delete file
    (2^15 = 32768 scan leaves — unplannable); the folded EXISTS
    anti-join keeps one join per delete-column-set."""
    for i in range(15):
        table.delete_where_mor([("id", "=", i)], delete_cols=["id"])
    df = table.read()
    assert df.count() == 85
    assert df.filter("id < 15").count() == 0
    # the analyzed plan must contain exactly ONE anti-join over the
    # folded delete relation, not one (or 2^N) per file
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftAnti") == 1, plan[:2000]
