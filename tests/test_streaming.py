"""Structured Streaming: windowed aggs, session windows, stateful
tracking, foreachBatch drain, late-data watermark policy."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from iceberg_hybrid_spark import streaming as ST


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, ST.EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _ts(minute, hour=10, day=1):
    return dt.datetime(2024, 1, day, hour, minute)


@pytest.fixture()
def events_dir(tmp_path):
    return str(tmp_path / "events")


def _run_to_memory(spark, df, name, checkpoint, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_counts(spark, events_dir, tmp_path):
    _write_events(spark, events_dir, [
        (1, _ts(5), 100, "click", 1.0),
        (2, _ts(20), 100, "click", 2.0),
        (3, _ts(5, hour=11), 100, "view", 3.0),
    ])
    stream = ST.read_event_stream(spark, events_dir)
    # complete mode: emit all windows each batch (append would hold
    # windows open until the watermark passes their end)
    out = _run_to_memory(
        spark,
        ST.windowed_event_counts(stream, window="1 hour"),
        "win_counts", str(tmp_path / "cp1"), "complete",
    ).collect()
    got = {(r.window_start.hour, r.event_type): r.event_count for r in out}
    assert got == {(10, "click"): 2, (11, "view"): 1}


def test_session_windows(spark, events_dir, tmp_path):
    _write_events(spark, events_dir, [
        (1, _ts(0), 7, "click", 1.0),
        (2, _ts(10), 7, "click", 1.0),   # same session (10 min gap)
        (3, _ts(55), 7, "click", 1.0),   # 45 min gap → new session
    ])
    stream = ST.read_event_stream(spark, events_dir)
    out = _run_to_memory(
        spark,
        ST.session_window_counts(stream, gap="30 minutes"),
        "sessions", str(tmp_path / "cp2"), "complete",
    ).collect()
    assert len(out) == 2
    assert sorted(r.event_count for r in out) == [1, 2]


def test_session_window_gap_and_finalization_semantics(spark, events_dir, tmp_path):
    """Pins the two rules the streaming_session_windows oracle encodes:
    TOUCHING event intervals merge (an event exactly GAP after the
    previous one CONTINUES the session; only diff > gap starts a new
    one), and append mode emits only sessions whose end <= final
    watermark — trailing sessions are withheld."""
    _write_events(spark, events_dir, [
        # user 1: exactly 30:00 gap → ONE session (touching intervals
        # merge), end = last event + gap = 01:00
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "click", 1.0),
        (2, dt.datetime(2024, 1, 1, 0, 30, 0), 1, "click", 1.0),
        # user 2: 30:01 gap → TWO sessions
        (3, dt.datetime(2024, 1, 1, 0, 0, 0), 2, "click", 1.0),
        (4, dt.datetime(2024, 1, 1, 0, 30, 1), 2, "click", 1.0),
        # user 3: the watermark anchor (max ts 10:00 → watermark 08:00);
        # its own session ends 10:30 > watermark → withheld
        (5, dt.datetime(2024, 1, 1, 10, 0, 0), 3, "click", 1.0),
    ])
    stream = ST.read_event_stream(spark, events_dir)
    out = (
        ST.session_window_counts(stream, gap="30 minutes", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("sess_semantics")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp_sess"))
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination()
    rows = spark.sql("SELECT * FROM sess_semantics").collect()
    got = {(r.user_id, r.session_start, r.session_end, r.event_count) for r in rows}
    assert got == {
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), dt.datetime(2024, 1, 1, 1, 0, 0), 2),
        (2, dt.datetime(2024, 1, 1, 0, 0, 0), dt.datetime(2024, 1, 1, 0, 30, 0), 1),
        (2, dt.datetime(2024, 1, 1, 0, 30, 1), dt.datetime(2024, 1, 1, 1, 0, 1), 1),
        # user 3's unfinalized session must NOT appear
    }


def test_stateful_tracker_accumulates_across_batches(spark, events_dir, tmp_path):
    """State survives micro-batches AND restarts: the second run resumes
    from the checkpoint and continues the per-key counts."""
    cp = str(tmp_path / "cp3")
    collected = []

    def run_once():
        stream = ST.read_event_stream(spark, events_dir, max_files_per_trigger=1)
        tracked = ST.status_transition_tracker(stream)
        q = (
            tracked.writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_events(spark, events_dir, [
        (1, _ts(0), 5, "click", 1.0),
        (2, _ts(1), 5, "view", 1.0),
    ])
    run_once()
    final1 = max(collected, key=lambda r: r.total_events)
    assert final1.total_events == 2 and final1.transitions == 1
    # append a second file — a fresh query resumes from the checkpoint
    collected.clear()
    _write_events(spark, events_dir, [(3, _ts(2), 5, "purchase", 1.0)])
    run_once()
    assert len(collected) == 1
    assert collected[0].total_events == 3
    assert collected[0].last_event_type == "purchase"
    assert collected[0].transitions == 2


def test_foreach_batch_drains_backlog(spark, events_dir, tmp_path):
    _write_events(spark, events_dir, [
        (i, _ts(i % 60), i % 3, "click", float(i)) for i in range(30)
    ])
    seen = []

    def handler(batch_df, batch_id):
        seen.append(batch_df.count())

    stream = ST.read_event_stream(spark, events_dir)
    q = ST.sync_events_foreach_batch(stream, handler, str(tmp_path / "cp4"))
    q.awaitTermination(120)
    assert sum(seen) == 30


def test_late_data_dropped_past_watermark(spark, events_dir, tmp_path):
    """Events older than the watermark are dropped once the watermark has
    advanced — the late-data policy, pinned."""
    cp = str(tmp_path / "cp5")
    collected = []

    def run_once():
        stream = ST.read_event_stream(spark, events_dir, max_files_per_trigger=1)
        agg = ST.windowed_event_counts(stream, window="1 hour", watermark="1 hour")
        q = (
            agg.writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: events at hour 10 and hour 20 → watermark advances to 19:00
    _write_events(spark, events_dir, [
        (1, _ts(5, hour=10), 1, "click", 1.0),
        (2, _ts(0, hour=20), 1, "click", 1.0),
    ])
    run_once()
    # hour-10 window is final (closed by the watermark)
    assert any(r.window_start.hour == 10 and r.event_count == 1 for r in collected)
    # batch 2: a straggler for hour 10 arrives — must be dropped
    collected.clear()
    _write_events(spark, events_dir, [(3, _ts(30, hour=10), 1, "click", 99.0)])
    run_once()
    assert not any(r.window_start.hour == 10 for r in collected)


def test_stream_stream_interval_join(spark, events_dir, tmp_path):
    """Purchases joined to same-user clicks within the preceding hour —
    stream-stream join with watermark-bounded state."""
    from iceberg_hybrid_spark.streaming.sync_stream import clicks_to_purchases_join

    _write_events(spark, events_dir, [
        (1, _ts(0), 7, "click", 1.0),
        (2, _ts(30), 7, "purchase", 9.0),   # matches click 1 (30 min gap)
        (3, _ts(0, hour=13), 7, "purchase", 5.0),  # no click within 1h
        (4, _ts(10), 8, "click", 1.0),      # other user
    ])
    stream = ST.read_event_stream(spark, events_dir)
    clicks = stream.filter("event_type = 'click'")
    purchases = stream.filter("event_type = 'purchase'")
    joined = clicks_to_purchases_join(clicks, purchases, "1 hour")
    out = _run_to_memory(spark, joined, "ssjoin", str(tmp_path / "cp6"), "append").collect()
    assert len(out) == 1
    assert out[0].purchase_id == 2 and out[0].click_id == 1


def test_streaming_gopher_gate_matches_batch(spark, tmp_path):
    """The pipeline quality gate over a stream: the same map-only flag
    projection runs per micro-batch (maxFilesPerTrigger=1 → multiple
    batches) and the drained totals equal the batch query's."""
    import shutil

    from iceberg_hybrid_spark.queries.pipeline import (
        gopher_gate_flags,
        gopher_quality_gate,
    )
    from iceberg_hybrid_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    # split the documents table into multiple files → multiple triggers
    src_dir = str(tmp_path / "docs_stream")
    load_table(spark, sf_dir, "documents").repartition(4).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    flags = gopher_gate_flags(stream)
    out = _run_to_memory(
        spark, flags, "gate_stream", str(tmp_path / "ckpt"), "append"
    )
    got = {
        (r.lang, r.docs, r.passed)
        for r in out.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("p_all").alias("passed"))
        .collect()
    }
    want = {
        (r.lang, r.doc_count, r.pass_all)
        for r in gopher_quality_gate(spark, sf_dir).collect()
    }
    assert got == want
    shutil.rmtree(src_dir, ignore_errors=True)
