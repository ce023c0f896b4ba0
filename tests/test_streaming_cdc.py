"""Streaming CDC ingestion: a change stream upserted into a HyTable via
foreachBatch + upsert_mor (the equality-delete streaming-writer pattern),
and streaming exact dedup with a watermark."""

import datetime as dt

from pyspark.sql import types as SPARK_T

from iceberg_hybrid_spark.lake.table import HyTable

CDC_SCHEMA = SPARK_T.StructType([
    SPARK_T.StructField("id", SPARK_T.LongType()),
    SPARK_T.StructField("value", SPARK_T.StringType()),
    SPARK_T.StructField("op_ts", SPARK_T.TimestampType()),
])


def _write(spark, path, rows):
    spark.createDataFrame(rows, CDC_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_streaming_cdc_upsert(spark, tmp_path):
    cdc_dir = str(tmp_path / "cdc")
    table = HyTable(spark, str(tmp_path / "t"))
    table.create(
        spark.createDataFrame(
            [(i, "orig", dt.datetime(2024, 1, 1)) for i in range(10)], CDC_SCHEMA
        )
    )
    _write(spark, cdc_dir, [
        (1, "updated", dt.datetime(2024, 1, 2)),
        (100, "inserted", dt.datetime(2024, 1, 2)),
    ])

    def apply_batch(batch_df, _id):
        if batch_df.limit(1).count():
            # last writer per key wins within the batch
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            w = Window.partitionBy("id").orderBy(F.desc("op_ts"))
            latest = (
                batch_df.withColumn("rn", F.row_number().over(w))
                .filter("rn = 1").drop("rn")
            )
            table.upsert_mor(latest, ["id"])

    q = (
        spark.readStream.schema(CDC_SCHEMA).parquet(cdc_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.id: r.value for r in table.read().collect()}
    assert len(rows) == 11
    assert rows[1] == "updated" and rows[100] == "inserted" and rows[2] == "orig"
    # second wave resumes from the checkpoint
    _write(spark, cdc_dir, [(1, "updated2", dt.datetime(2024, 1, 3))])
    q2 = (
        spark.readStream.schema(CDC_SCHEMA).parquet(cdc_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert {r.value for r in table.read(preds=[("id", "=", 1)]).collect()} == {"updated2"}


def test_streaming_exact_dedup(spark, tmp_path):
    """dropDuplicates on a keyed stream with a watermark — streaming exact
    dedup (duplicate events across micro-batches are emitted once)."""
    src = str(tmp_path / "events")
    _write(spark, src, [
        (1, "a", dt.datetime(2024, 1, 1, 10)),
        (1, "a", dt.datetime(2024, 1, 1, 10)),   # in-batch dup
        (2, "b", dt.datetime(2024, 1, 1, 10, 30)),
    ])
    seen = []

    def collect_batch(df, _id):
        seen.extend(df.collect())

    def run():
        stream = spark.readStream.schema(CDC_SCHEMA).parquet(src)
        deduped = stream.withWatermark("op_ts", "1 hour").dropDuplicates(["id"])
        q = (
            deduped.writeStream.foreachBatch(collect_batch)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "cp2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert sorted(r.id for r in seen) == [1, 2]
    # cross-batch dup of id=1 is suppressed by the state store
    _write(spark, src, [(1, "a", dt.datetime(2024, 1, 1, 10, 45))])
    seen.clear()
    run()
    assert [r.id for r in seen] == []


def test_streaming_incremental_corpus_dedup(spark, tmp_path):
    """Incremental corpus ingestion with exact dedup via the library's
    streaming ingest (streaming/ingest.py): documents arrive in
    micro-batches; each batch is fingerprinted, deduped in-batch,
    anti-joined against the NARROW fingerprint state table (never the
    corpus text), and only novel docs are appended.  Final state equals
    batch exact-dedup of the whole corpus; re-delivery is a no-op."""
    from pyspark.sql import types as T

    from iceberg_hybrid_spark.streaming.ingest import (
        FINGERPRINT_DDL,
        start_dedup_ingest,
    )

    DOC_SCHEMA = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    inbox = str(tmp_path / "inbox")
    corpus = HyTable(spark, str(tmp_path / "corpus"))
    corpus.create(spark.createDataFrame([], DOC_SCHEMA))
    fps = HyTable(spark, str(tmp_path / "fps"))
    fps.create(spark.createDataFrame([], FINGERPRINT_DDL))

    batches = [
        [(1, "alpha"), (2, "beta"), (3, "alpha")],        # in-batch dup
        [(4, "beta"), (5, "gamma")],                       # dup of prior batch
        [(6, "alpha"), (7, "delta"), (8, "delta")],        # mixed
    ]
    for rows in batches:
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(inbox)

    q = start_dedup_ingest(
        spark, inbox, DOC_SCHEMA, corpus, fps, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = {(r.doc_id, r.text) for r in corpus.read().collect()}
    # availableNow may fold all inbox files into one micro-batch, so the
    # survivor per duplicate text is the min doc_id across ALL batches —
    # matching batch-mode exact dedup over the full corpus.
    assert got == {(1, "alpha"), (2, "beta"), (5, "gamma"), (7, "delta")}
    assert fps.read().count() == 4  # state tracks corpus 1:1

    # late re-delivery of already-seen texts is a no-op
    spark.createDataFrame([(9, "alpha"), (10, "beta")], DOC_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(inbox)
    q2 = start_dedup_ingest(
        spark, inbox, DOC_SCHEMA, corpus, fps, str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    assert corpus.read().count() == 4
    assert fps.read().count() == 4


def test_streaming_near_dup_ingest(spark, tmp_path):
    """Incremental NEAR-dup ingestion: batch 2 contains a lightly edited
    copy of a batch-1 document (near-dup, dropped), a verbatim
    redelivery (1.0 Jaccard, dropped), and a genuinely new document
    (kept).  In-batch near-dups resolve to the min id."""
    from pyspark.sql import types as T

    from iceberg_hybrid_spark.streaming.ingest import (
        BAND_STATE_DDL,
        start_near_dup_ingest,
    )

    DOC_SCHEMA = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest before the rain begins to fall")
    edited = base.replace("lazy", "sleepy")          # 1-token edit: near-dup
    other = ("completely different content about distributed query engines "
             "processing parquet tables with adaptive shuffle partitioning "
             "under heavy concurrent analytical load every single night")

    inbox = str(tmp_path / "inbox")
    corpus = HyTable(spark, str(tmp_path / "corpus"))
    corpus.create(spark.createDataFrame([], DOC_SCHEMA))
    bands = HyTable(spark, str(tmp_path / "bands"))
    bands.create(spark.createDataFrame([], BAND_STATE_DDL))

    # batch 1: base + an in-batch near-dup of it (min id 1 survives)
    spark.createDataFrame(
        [(1, base), (2, base.replace("deep", "dark"))], DOC_SCHEMA
    ).coalesce(1).write.mode("append").parquet(inbox)
    q = start_near_dup_ingest(
        spark, inbox, DOC_SCHEMA, corpus, bands, str(tmp_path / "ck")
    )
    q.awaitTermination(180)
    assert {r.doc_id for r in corpus.read().collect()} == {1}

    # batch 2: edited near-dup (drop), verbatim redelivery (drop), new (keep)
    spark.createDataFrame(
        [(3, edited), (4, base), (5, other)], DOC_SCHEMA
    ).coalesce(1).write.mode("append").parquet(inbox)
    q2 = start_near_dup_ingest(
        spark, inbox, DOC_SCHEMA, corpus, bands, str(tmp_path / "ck")
    )
    q2.awaitTermination(180)
    assert {r.doc_id for r in corpus.read().collect()} == {1, 5}
    # band state tracks exactly the committed docs
    assert {r.doc_id for r in bands.read().select("doc_id").distinct().collect()} == {1, 5}


def test_near_dup_ingest_same_batch_redelivery(spark, tmp_path):
    """Batch-fold independence: a verbatim re-delivery folded into the
    SAME micro-batch (identical doc_id + text rows) must not commit the
    survivor twice — the pair relation cannot see same-id duplicates
    (id_a < id_b never pairs a row with its own copy), so the batch
    entry point collapses exact-row duplicates first."""
    from pyspark.sql import types as T

    from iceberg_hybrid_spark.streaming.ingest import (
        BAND_STATE_DDL,
        near_dup_ingest_batch,
    )

    DOC_SCHEMA = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    text = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest before the rain begins to fall")
    corpus = HyTable(spark, str(tmp_path / "corpus"))
    corpus.create(spark.createDataFrame([], DOC_SCHEMA))
    bands = HyTable(spark, str(tmp_path / "bands"))
    bands.create(spark.createDataFrame([], BAND_STATE_DDL))

    batch = spark.createDataFrame([(1, text), (1, text)], DOC_SCHEMA)
    n = near_dup_ingest_batch(batch, corpus, bands)
    assert n == 1
    assert corpus.read().count() == 1  # one ROW, not just one distinct id


def test_dedup_ingest_repairs_torn_state_commit(spark, tmp_path):
    """A prior attempt that died between the corpus commit and the
    fingerprint commit must not cause duplicates on retry: the next
    batch repairs the state from the corpus's incremental diff before
    anti-joining."""
    from pyspark.sql import types as T

    from iceberg_hybrid_spark.streaming.ingest import (
        FINGERPRINT_DDL,
        dedup_ingest_batch,
    )

    DOC_SCHEMA = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    corpus = HyTable(spark, str(tmp_path / "corpus"))
    corpus.create(spark.createDataFrame([], DOC_SCHEMA))
    fps = HyTable(spark, str(tmp_path / "fps"))
    fps.create(spark.createDataFrame([], FINGERPRINT_DDL))

    batch = spark.createDataFrame([(1, "alpha"), (2, "beta")], DOC_SCHEMA)
    # simulate the torn first attempt: corpus committed, state not
    corpus.append(batch)
    assert fps.read().count() == 0

    # retry of the same batch: repair + anti-join -> nothing re-appended
    n = dedup_ingest_batch(batch, corpus, fps)
    assert n == 0
    assert corpus.read().count() == 2            # no duplicates
    assert fps.read().count() == 2               # state repaired

    # and normal progress afterwards still works
    n2 = dedup_ingest_batch(
        spark.createDataFrame([(3, "alpha"), (4, "gamma")], DOC_SCHEMA),
        corpus, fps,
    )
    assert n2 == 1
    assert corpus.read().count() == 3
