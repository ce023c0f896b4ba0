"""Streaming frame-level video dedup (r11 verdict stretch #7): a
stream of REAL AVI payloads dedups decoded frames incrementally
against the accumulated fingerprint state table."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_hybrid_spark.lake.table import HyTable
from iceberg_hybrid_spark.sources.multimodal import media_avi_from_documents
from iceberg_hybrid_spark.sources.tables import load_table
from iceberg_hybrid_spark.streaming.ingest import (
    FRAME_STATE_DDL,
    frame_dedup_ingest_batch,
    start_frame_dedup_ingest,
)

SF_DIR = "/root/testdata/sf0.001"

VIDEO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])


def _videos(spark, lo, hi):
    docs = load_table(spark, SF_DIR, "documents").filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )
    return media_avi_from_documents(docs).select("media_id", "payload")


def _expected_novel(dids):
    """Congruence replay of the fixture: frame content is a pure
    function of (doc_id % 72, frame_idx); a frame is novel iff its
    video is the smallest id in its mod-72 class long enough to
    contain that frame index."""
    n = {d: 2 + d % 5 for d in dids}
    out = {}
    for d in dids:
        novel = 0
        for f in range(n[d]):
            keeper = min(
                d2 for d2 in dids if d2 % 72 == d % 72 and n[d2] > f
            )
            novel += keeper == d
        out[d] = novel
    return out


def test_frame_dedup_ingest_batches_accumulate_state(spark, tmp_path):
    """Two sequential batches over ids 0..143: ids 72..143 collide with
    the 0..71 classes, so batch-2 videos reuse batch-1 footage and
    report fewer novel frames; the state holds one row per DISTINCT
    frame and a re-delivery is a no-op."""
    state = HyTable(spark, str(tmp_path / "state"))
    state.create(spark.createDataFrame([], FRAME_STATE_DDL))
    report = HyTable(spark, str(tmp_path / "report"))
    report.create(spark.createDataFrame(
        [],
        "video_id bigint, n_frames bigint, novel_frames bigint,"
        " batch_seq bigint",
    ))

    n1 = frame_dedup_ingest_batch(
        _videos(spark, 0, 72), state, report, batch_seq=1
    )
    # batch 1: every class is fresh — every frame novel
    assert n1 == sum(2 + d % 5 for d in range(72))
    n2 = frame_dedup_ingest_batch(
        _videos(spark, 72, 144), state, report, batch_seq=2
    )
    assert 0 < n2 < sum(2 + d % 5 for d in range(72, 144))

    expected = _expected_novel(list(range(144)))
    got = {
        r.video_id: r.novel_frames for r in report.read().collect()
    }
    assert got == expected
    # state: one row per distinct (class, frame_idx) frame
    distinct_frames = len({
        (d % 72, f) for d in range(144) for f in range(2 + d % 5)
    })
    assert state.read().count() == n1 + n2 == distinct_frames

    # re-delivery of batch 2 is a no-op for the STATE and the REPORT
    # (batch_seq 2 already reported — the cms-style torn-batch guard)
    rows_before = report.read().count()
    assert frame_dedup_ingest_batch(
        _videos(spark, 72, 144), state, report, batch_seq=2
    ) == 0
    assert state.read().count() == distinct_frames
    assert report.read().count() == rows_before
    # and the report rows still carry the ORIGINAL novel counts (they
    # are derived from the state's batch_seq-tagged rows, not from the
    # retry's empty novel set)
    got2 = {
        r.video_id: r.novel_frames
        for r in report.read().filter("batch_seq = 2").collect()
    }
    assert got2 == {d: expected[d] for d in range(72, 144)}


def test_start_frame_dedup_ingest_stream(spark, tmp_path):
    """The foreachBatch streaming form over a parquet inbox: final
    state equals the batch-mode dedup of the whole corpus."""
    inbox = str(tmp_path / "inbox")
    _videos(spark, 0, 40).coalesce(1).write.mode("append").parquet(inbox)
    _videos(spark, 72, 112).coalesce(1).write.mode("append").parquet(inbox)

    state = HyTable(spark, str(tmp_path / "state"))
    state.create(spark.createDataFrame([], FRAME_STATE_DDL))
    q = start_frame_dedup_ingest(
        spark, inbox, VIDEO_SCHEMA, state, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    dids = list(range(40)) + list(range(72, 112))
    distinct_frames = len({
        (d % 72, f) for d in dids for f in range(2 + d % 5)
    })
    assert state.read().count() == distinct_frames
    # claimed keeper per fingerprint is the smallest capable video id
    for r in state.read().limit(20).collect():
        assert r.video_id == min(
            d for d in dids
            if d % 72 == r.video_id % 72 and (2 + d % 5) > r.frame_idx
        )
