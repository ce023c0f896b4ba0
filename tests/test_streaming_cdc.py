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


# ---------------------------------------------------------------------------
# Independent verification of the pinned CDC bounds artifact.
#
# The bounds literals in _cdc_oracle.py are COLLECTED from cdc_chunk_bounds
# itself, so a bug in the Spark boundary rule would reproduce verbatim in
# the oracle (only downstream stages are independently recomputed by
# DuckDB).  This pure-Python XXH64 — written from the public xxHash spec,
# no Spark, no Arrow — recomputes several documents' bounds from the raw
# sf0.01 text and must agree with the pinned literals, breaking that
# circularity.
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h):
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _xxh64_bytes(data: bytes, seed: int) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            k1, k2, k3, k4 = (
                int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                for j in range(4)
            )
            v1 = (_rotl((v1 + k1 * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + k2 * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + k3 * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + k4 * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _fmix(h)


def _xxh64_long(value: int, seed: int) -> int:
    # Spark's XXH64.hashLong: the 8-byte single-chunk path applied to the
    # long's value directly (= little-endian bytes of the long).
    h = (seed + _P5 + 8) & _M64
    h ^= (_rotl(((value & _M64) * _P2) & _M64, 31) * _P1) & _M64
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _fmix(h)


def _py_cdc_bounds(text: str) -> list[int]:
    """cdc_chunk_bounds re-derived from its docstring contract, not its
    Spark expression tree: cut at window i (1-based, i >= 2) iff the
    chained xxhash64 of the 3-token window has its low 4 bits zero."""
    w = text.split(" ")
    n = len(w)
    m = n - 2
    wh = [_xxh64_bytes(t.encode("utf-8"), 42) for t in w]
    cuts = []
    if m >= 2:
        for j in range(m):  # window j covers tokens j, j+1, j+2
            a = _xxh64_long(wh[j + 1], _xxh64_long(wh[j], 42))
            a = _xxh64_long(wh[j + 2], _xxh64_long(a, 42))
            i = j + 1
            if i >= 2 and (a & 15) == 0:
                cuts.append(i)
    return [1] + cuts + [n + 1]


def test_xxh64_replication_matches_spark(spark):
    """Anchor the pure-Python XXH64 to Spark's before trusting it."""
    from pyspark.sql import functions as F

    rows = spark.createDataFrame(
        [("",), ("a",), ("hello world",), ("x" * 100,)], "s string"
    ).select("s", F.xxhash64("s").alias("h"), F.xxhash64(F.lit(7).cast("long"), F.xxhash64("s")).alias("h2")).collect()
    for r in rows:
        mine = _xxh64_bytes(r.s.encode("utf-8"), 42)
        assert mine - (1 << 64) * (mine >> 63) == r.h
        chained = _xxh64_long(mine, _xxh64_long(7, 42))
        assert chained - (1 << 64) * (chained >> 63) == r.h2


def test_pinned_cdc_bounds_match_pure_python_recomputation():
    """The pinned artifact itself — not just its downstream — verified
    against an implementation that shares no code with the one under
    test (gen_cdc_oracle.py collects from cdc_chunk_bounds)."""
    import re

    import pyarrow.parquet as pq

    from iceberg_hybrid_spark.queries._cdc_oracle import CDC_CHUNK_OVERLAP_SQL

    pinned = {
        int(m.group(1)): [int(x) for x in m.group(2).split(",")]
        for m in re.finditer(
            r"\(CAST\((\d+) AS BIGINT\), \[([0-9, ]+)\]::BIGINT\[\]\)",
            CDC_CHUNK_OVERLAP_SQL,
        )
    }
    assert len(pinned) >= 100  # the whole sf0.01 documents table is pinned

    tbl = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    text_by_id = dict(zip(tbl["doc_id"], tbl["text"]))
    # a spread of documents incl. many-cut and few-cut shapes
    for doc_id in (0, 2, 5, 7, 8, 10, 11, 50, 123, 499):
        assert _py_cdc_bounds(text_by_id[doc_id]) == pinned[doc_id], doc_id


def test_prune_band_state_drops_deleted_docs_only(spark, tmp_path):
    """Band-state maintenance: rows for documents deleted from the
    corpus are removed, live documents' rows are untouched, and a later
    batch still ingests correctly against the pruned state."""
    from pyspark.sql import types as T

    from iceberg_hybrid_spark.streaming.ingest import (
        BAND_STATE_DDL,
        near_dup_ingest_batch,
        prune_band_state,
    )

    DOC_SCHEMA = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    a = ("the quick brown fox jumps over the lazy dog and then runs far "
         "away into the deep green forest before the rain begins to fall")
    b = ("completely unrelated second document that talks about query "
         "engines shuffles partitions and the cost of wide transformations")
    corpus = HyTable(spark, str(tmp_path / "corpus"))
    corpus.create(spark.createDataFrame([], DOC_SCHEMA))
    bands = HyTable(spark, str(tmp_path / "bands"))
    bands.create(spark.createDataFrame([], BAND_STATE_DDL))

    assert near_dup_ingest_batch(
        spark.createDataFrame([(1, a), (2, b)], DOC_SCHEMA), corpus, bands
    ) == 2
    rows_before = bands.read().count()
    per_doc = {r.doc_id for r in bands.read().select("doc_id").distinct().collect()}
    assert per_doc == {1, 2}

    # no-op prune: nothing deleted yet
    assert prune_band_state(corpus, bands) == 0
    assert bands.read().count() == rows_before

    corpus.delete_where([("doc_id", "=", 1)])
    removed = prune_band_state(corpus, bands)
    assert removed > 0
    left = {r.doc_id for r in bands.read().select("doc_id").distinct().collect()}
    assert left == {2}

    # ingestion still works against the pruned state: a near-dup of the
    # LIVE doc b is dropped, a fresh doc is admitted
    n = near_dup_ingest_batch(
        spark.createDataFrame(
            [(3, b), (4, "entirely new text about something else with many "
                         "different words than before in every position")],
            DOC_SCHEMA,
        ),
        corpus, bands,
    )
    assert n == 1
    assert {r.doc_id for r in corpus.read().select("doc_id").collect()} == {2, 4}
