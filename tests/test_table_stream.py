"""Streaming consumption of a HyTable: file-stream appends and pull-based
incremental snapshot tailing."""

from pyspark.sql import functions as F

from iceberg_hybrid_spark.lake.table import HyTable
from iceberg_hybrid_spark.streaming.table_stream import (
    IncrementalTableReader,
    stream_commit_history,
    stream_table_appends,
)


def _mk(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id % 5 AS k")


def test_stream_table_appends_delivers_commits(spark, tmp_table_root, tmp_path):
    t = HyTable(spark, tmp_table_root)
    t.create(_mk(spark, 0, 100))
    seen = []

    def sink(batch_df, batch_id):
        seen.append(batch_df.count())

    ckpt = str(tmp_path / "ckpt")
    q = (
        stream_table_appends(spark, t)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sum(seen) == 100

    t.append(_mk(spark, 100, 250))
    q = (
        stream_table_appends(spark, t)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # second run delivers ONLY the appended files (checkpointed source)
    assert sum(seen) == 250


def test_incremental_reader_tails_snapshots(spark, tmp_table_root):
    t = HyTable(spark, tmp_table_root)
    t.create(_mk(spark, 0, 50))
    # from_seq=0 → the create counts as the first batch
    reader = IncrementalTableReader(t, from_seq=0)
    b1 = reader.next_batch()
    assert b1.count() == 50
    assert reader.next_batch() is None  # caught up
    t.append(_mk(spark, 50, 80))
    t.append(_mk(spark, 80, 200))
    b2 = reader.next_batch()  # both commits in one fast-forward batch
    assert b2.count() == 150
    assert reader.next_batch() is None


def test_stream_commit_history_delivers_commits(spark, tmp_table_root, tmp_path):
    t = HyTable(spark, tmp_table_root)
    t.create(_mk(spark, 0, 10))
    t.append(_mk(spark, 10, 20))
    rows: list = []

    def sink(batch_df, batch_id):
        rows.extend(batch_df.collect())

    ckpt = str(tmp_path / "ckpt-hist")

    def drain():
        q = (
            stream_commit_history(spark, t)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert sorted(r.sequence_number for r in rows) == [1, 2]
    assert [r.operation for r in sorted(rows, key=lambda r: r.sequence_number)] == [
        "create", "append",
    ]
    # a new commit arrives as a NEW micro-batch only (exactly-once)
    t.append(_mk(spark, 20, 25))
    drain()
    assert sorted(r.sequence_number for r in rows) == [1, 2, 3]
    by_seq = {r.sequence_number: r for r in rows}
    assert by_seq[3].parent_id == by_seq[2].snapshot_id
    assert by_seq[3].staged is False


def test_incremental_reader_defaults_to_head(spark, tmp_table_root):
    t = HyTable(spark, tmp_table_root)
    t.create(_mk(spark, 0, 50))
    reader = IncrementalTableReader(t)  # start AT the head
    assert reader.next_batch() is None
    t.append(_mk(spark, 50, 60))
    assert reader.next_batch().count() == 10


def test_changelog_tailer_streams_inserts_and_deletes(spark, tmp_table_root):
    from iceberg_hybrid_spark.streaming.table_stream import ChangelogTailer

    t = HyTable(spark, tmp_table_root)
    t.create(_mk(spark, 0, 50))
    tailer = ChangelogTailer(t)          # start at head: only future commits
    assert tailer.next_batch() is None   # caught up
    t.append(_mk(spark, 50, 70))         # pure append
    b1 = tailer.next_batch()
    rows = b1.collect()
    assert {r.id for r in rows} == set(range(50, 70))
    assert all(r._change_type == "insert" for r in rows)
    assert tailer.next_batch() is None
    t.delete_where([("id", "<", 5)])     # destructive commit
    b2 = tailer.next_batch().collect()
    assert {r.id for r in b2 if r._change_type == "delete"} == set(range(0, 5))
    assert not [r for r in b2 if r._change_type == "insert"]
    assert tailer.next_batch() is None
