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
    """Incremental corpus ingestion with exact dedup — the streaming form
    of the dedup pipeline's end stage: documents arrive in micro-batches;
    each batch is fingerprinted (md5), deduped within itself, anti-joined
    against the fingerprints already committed, and only novel docs are
    appended.  The final table must equal batch exact-dedup of the whole
    corpus (first-arrival wins), regardless of how the batches split or
    repeat documents."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    DOC_SCHEMA = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    inbox = str(tmp_path / "inbox")
    corpus = HyTable(spark, str(tmp_path / "corpus"))
    corpus.create(spark.createDataFrame([], DOC_SCHEMA))

    def ingest(batch_df, _id):
        if not batch_df.limit(1).count():
            return
        fp = F.md5(F.col("text").cast("binary"))
        # within-batch dedup: min doc_id per fingerprint wins
        w = Window.partitionBy("fp").orderBy("doc_id")
        fresh = (
            batch_df.withColumn("fp", fp)
            .withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .drop("rn")
        )
        seen = corpus.read().select(F.md5(F.col("text").cast("binary")).alias("fp"))
        novel = fresh.join(seen, "fp", "left_anti").drop("fp")
        if novel.limit(1).count():
            corpus.append(novel)

    batches = [
        [(1, "alpha"), (2, "beta"), (3, "alpha")],        # 3 dups 1 in-batch
        [(4, "beta"), (5, "gamma")],                       # 4 dups prior batch
        [(6, "alpha"), (7, "delta"), (8, "delta")],        # mixed
    ]
    for rows in batches:
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(inbox)

    q = (
        spark.readStream.schema(DOC_SCHEMA).parquet(inbox)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r.doc_id, r.text) for r in corpus.read().collect()}
    # availableNow may fold all inbox files into one micro-batch, so the
    # survivor per duplicate text is the min doc_id across ALL batches —
    # matching batch-mode exact dedup over the full corpus.
    assert got == {(1, "alpha"), (2, "beta"), (5, "gamma"), (7, "delta")}

    # late re-delivery of already-seen texts is a no-op
    spark.createDataFrame([(9, "alpha"), (10, "beta")], DOC_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(inbox)
    q2 = (
        spark.readStream.schema(DOC_SCHEMA).parquet(inbox)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert corpus.read().count() == 4
