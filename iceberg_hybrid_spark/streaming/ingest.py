"""Streaming corpus ingestion with exact dedup — the streaming form of
the dedup pipeline's end stage (keep first arrival per content
fingerprint), designed for 100 TB state:

- the dedup state is a NARROW side table of md5 fingerprints (16 bytes
  per document), committed in the same cadence as the corpus appends —
  each micro-batch anti-joins against fingerprints, never against the
  corpus text, so per-batch state IO is ~1/1000th of rescanning text;
- within-batch duplicates resolve to the min id (same canonical rule as
  ``functions.dedup.exact_dup_groups``);
- the anti-join is a plain equi-join on the 128-bit digest: AQE
  broadcasts the (small) batch side against the (large) state side at
  scale — the batch never sees more than one shuffle;
- idempotent: re-delivered documents hit an existing fingerprint and are
  dropped, so at-least-once delivery upstream composes into
  effectively-once corpus state (the HyTable commit itself is atomic).

≙ the reference's write-side dedup discipline composed with its
streaming sync worker (SURVEY §3.2); the same pattern extends to any
content key (simhash buckets, URL canonicalization) by swapping the
fingerprint expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..lake.table import HyTable
from ..plans.residency import checkpoint_bounded

FINGERPRINT_DDL = "fp string, corpus_seq bigint"


def fingerprint(text_col: str = "text"):
    """Content fingerprint used for dedup state: md5 over raw bytes."""
    return F.md5(F.col(text_col).cast("binary"))


def _unsynced_corpus_rows(corpus: HyTable, state: HyTable) -> DataFrame | None:
    """Corpus rows committed after the state table's recorded
    ``corpus_seq`` watermark — non-empty exactly when a prior batch died
    between its corpus commit and its state commit.  The repair reads
    only the incremental diff (bounded by the torn batch), never the
    whole corpus."""
    synced = state.read().agg(F.max("corpus_seq")).collect()[0][0] or 0
    head = corpus.current_snapshot()
    cur = head.sequence_number if head else 0
    if cur <= synced:
        return None
    missing = (
        corpus.read() if synced == 0 else corpus.incremental_read(synced, cur)
    )
    if not missing.limit(1).count():
        return None
    return missing.withColumn("_corpus_seq", F.lit(cur).cast("bigint"))


def dedup_ingest_batch(
    batch_df: DataFrame,
    corpus: HyTable,
    fingerprints: HyTable,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Apply one micro-batch: returns the number of novel documents
    appended.  Usable directly for batch backfills too.

    Effectively-once under batch retries despite the corpus and state
    commits being two separate (each individually atomic) commits: every
    fingerprint row carries the corpus sequence it corresponds to, and
    the batch starts by REPAIRING the state — if a prior attempt died
    between the two commits, the fingerprints of the torn batch are
    recomputed from the corpus's incremental diff (bounded by that
    batch) before the anti-join runs, so the retry drops the already-
    committed documents instead of duplicating them."""
    repair = _unsynced_corpus_rows(corpus, fingerprints)
    if repair is not None:
        fingerprints.append(
            repair.select(
                fingerprint(text_col).alias("fp"),
                F.col("_corpus_seq").alias("corpus_seq"),
            )
        )
    if not batch_df.limit(1).count():
        return 0
    w = Window.partitionBy("fp").orderBy(id_col)
    fresh = (
        batch_df.withColumn("fp", fingerprint(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .drop("_rn")
    )
    seen = fingerprints.read().select("fp")
    novel = fresh.join(seen, "fp", "left_anti")
    # one pass over the novel rows feeds both commits; bounded across
    # micro-batches (at most one resident checkpoint for this operator)
    novel = checkpoint_bounded(novel, "dedup_ingest_novel")
    n = novel.count()
    if n:
        snap = corpus.append(novel.drop("fp"))
        fingerprints.append(
            novel.select(
                "fp",
                F.lit(snap.sequence_number).cast("bigint").alias("corpus_seq"),
            )
        )
    return n


BAND_STATE_DDL = "doc_id bigint, band int, band_key string, corpus_seq bigint"


def near_dup_ingest_batch(
    batch_df: DataFrame,
    corpus: HyTable,
    bands_state: HyTable,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.3,
) -> int:
    """Apply one micro-batch of NEAR-dup-deduplicated ingestion: keep a
    batch document only if no already-committed document (nor a
    lower-id batch survivor) is a verified near-duplicate.

    State = the corpus plus a persisted LSH band table
    (``minhash_band_rows`` of every committed doc).  Per batch:

    1. in-batch near-dup resolution — LSH candidates → exact-Jaccard
       verify → connected components → min-id canonical survives
       (identical semantics to the batch pipeline in queries/llm.py);
    2. batch-vs-state candidates — equi-join of the batch's band rows
       against the band-state table on (band, band_key): candidate
       volume tracks true near-dup density, never |batch| × |corpus|;
    3. verification reads shingles ONLY for the candidate corpus docs
       (semi-joined scan), so corpus text IO is proportional to the
       candidate set;
    4. survivors append to the corpus and their band rows to the state
       table — both manifest-commits, so redelivery is idempotent at
       the content level (a redelivered doc is a 1.0-Jaccard match of
       its committed copy and is dropped).

    Effectively-once under batch retries: band rows carry the corpus
    sequence they correspond to, and the batch starts by repairing the
    state from the corpus's incremental diff if a prior attempt died
    between the corpus commit and the state commit (same discipline as
    ``dedup_ingest_batch``).

    Returns the number of documents appended.
    """
    from ..functions import dedup as D
    from ..functions.text import shingle_hashes

    repair = _unsynced_corpus_rows(corpus, bands_state)
    if repair is not None:
        bands_state.append(
            D.minhash_band_rows(repair, id_col, text_col, num_hashes, bands, k)
            .join(repair.select(id_col, "_corpus_seq"), id_col)
            .select(
                F.col(id_col).cast("bigint"),
                "band",
                "band_key",
                F.col("_corpus_seq").alias("corpus_seq"),
            )
        )
    if not batch_df.limit(1).count():
        return 0
    # Batch-fold independence under at-least-once delivery: a verbatim
    # re-delivery folded into the SAME micro-batch duplicates every row
    # (same id, same text) — the pair relation can't see it (id_a < id_b
    # never pairs a row with its own copy), so without this both copies
    # of every survivor would reach the corpus.  Exact-row distinct is
    # deterministic and collapses the one-batch fold to the two-batch
    # result (where the state join drops the re-delivery instead).
    batch_df = batch_df.dropDuplicates()
    # 1) in-batch resolution
    pairs = D.minhash_lsh_candidates(
        batch_df, id_col, text_col, num_hashes, bands, k
    )
    sh = batch_df.select(
        F.col(id_col), shingle_hashes(F.col(text_col), k).alias("_sh")
    )
    verified = (
        pairs.join(
            sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("sh_a")), "id_a"
        )
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("sh_b")), "id_b")
        .filter(D.ngram_jaccard(F.col("sh_a"), F.col("sh_b")) >= threshold)
        .select("id_a", "id_b")
    )
    comps = D.connected_components(verified, "id_a", "id_b")
    batch_canon = D.dedup_keep_canonical(batch_df, comps, id_col)

    # 2) candidates against committed state
    batch_bands = D.minhash_band_rows(
        batch_canon, id_col, text_col, num_hashes, bands, k
    )
    state = bands_state.read()
    cand = (
        batch_bands.alias("b")
        .join(
            state.alias("s"),
            (F.col("b.band") == F.col("s.band"))
            & (F.col("b.band_key") == F.col("s.band_key")),
        )
        .select(
            F.col(f"b.{id_col}").alias("batch_id"),
            F.col(f"s.{id_col}").alias("corpus_id"),
        )
        .distinct()
    )
    # 3) verify candidates only: corpus text scanned semi-joined to them
    corpus_sh = (
        corpus.read()
        .join(cand.select(F.col("corpus_id").alias(id_col)).distinct(), id_col, "left_semi")
        .select(F.col(id_col).alias("corpus_id"), shingle_hashes(F.col(text_col), k).alias("sh_c"))
    )
    batch_sh = batch_canon.select(
        F.col(id_col).alias("batch_id"), shingle_hashes(F.col(text_col), k).alias("sh_b")
    )
    dup_of_corpus = (
        cand.join(corpus_sh, "corpus_id")
        .join(batch_sh, "batch_id")
        .filter(D.ngram_jaccard(F.col("sh_b"), F.col("sh_c")) >= threshold)
        .select(F.col("batch_id").alias(id_col))
        .distinct()
    )
    survivors = batch_canon.join(dup_of_corpus, id_col, "left_anti")
    survivors = checkpoint_bounded(survivors, "near_dup_ingest_survivors")
    n = survivors.count()
    if n:
        snap = corpus.append(survivors)
        bands_state.append(
            D.minhash_band_rows(survivors, id_col, text_col, num_hashes, bands, k)
            .select(
                F.col(id_col).cast("bigint"),
                "band",
                "band_key",
                F.lit(snap.sequence_number).cast("bigint").alias("corpus_seq"),
            )
        )
    return n


def start_near_dup_ingest(
    spark: SparkSession,
    inbox_dir: str,
    schema,
    corpus: HyTable,
    bands_state: HyTable,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.3,
    available_now: bool = True,
):
    """Tail ``inbox_dir`` and near-dup-dedup-ingest each micro-batch
    (see :func:`near_dup_ingest_batch`).  Banding parameters pass through
    so callers can match the batch pipeline's verified recall regime
    (e.g. 32 hashes x 16 two-row bands, queries/llm.py
    ``minhash_near_dup``)."""

    def drain(batch_df: DataFrame, _batch_id: int) -> None:
        near_dup_ingest_batch(
            batch_df, corpus, bands_state, text_col, id_col,
            num_hashes, bands, k, threshold,
        )

    writer = (
        spark.readStream.schema(schema)
        .parquet(inbox_dir)
        .writeStream.foreachBatch(drain)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_dedup_ingest(
    spark: SparkSession,
    inbox_dir: str,
    schema,
    corpus: HyTable,
    fingerprints: HyTable,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
):
    """Tail ``inbox_dir`` (file stream) and dedup-ingest every
    micro-batch into ``corpus``, maintaining the ``fingerprints`` state
    table.  Exactly-once per inbox file via the checkpoint; duplicate
    content across redeliveries is dropped by the state anti-join."""

    def drain(batch_df: DataFrame, _batch_id: int) -> None:
        dedup_ingest_batch(batch_df, corpus, fingerprints, text_col, id_col)

    writer = (
        spark.readStream.schema(schema)
        .parquet(inbox_dir)
        .writeStream.foreachBatch(drain)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


HLL_REGISTER_DDL = "lang string, bucket bigint, mr int"


def hll_ingest_batch(
    batch_df: DataFrame,
    registers: HyTable,
    group_col: str = "lang",
    text_col: str = "text",
) -> None:
    """Fold one micro-batch into the persisted HLL register table:
    compute the batch's (group, bucket, max-rho) registers and merge
    them into state by register-wise max — the textbook mergeable-sketch
    update, so the final state is IDENTICAL to the batch sketch over the
    union of all deliveries regardless of how the stream folded them
    into micro-batches, and redeliveries are absorbed idempotently
    (max is idempotent).  State is <= groups x 1024 rows whatever the
    corpus — the whole point: streaming cardinality tracking without
    retaining the corpus."""
    from ..functions import sketch as SK
    from ..functions import text as T

    if not batch_df.limit(1).count():
        return
    # Degenerate-layout rescue, the streaming twin of the loader rescue
    # (sources/tables.py): a single-file inbox delivery is typically ONE
    # parquet row group, so Spark's byte-range splits put every row in
    # one input partition and the CPU-heavy shingle explode runs on one
    # task regardless of cores.  The other ingest folds shuffle before
    # their heavy work (dropDuplicates / fingerprint windows) and are
    # rescued implicitly; the HLL fold is explode-straight-off-the-scan,
    # so it redistributes the bounded micro-batch first.  Measured on
    # the 64x corpus: 57 s -> 6 s per fold.
    sc = batch_df.sparkSession.sparkContext
    if batch_df.rdd.getNumPartitions() < sc.defaultParallelism:
        batch_df = batch_df.repartition(sc.defaultParallelism)
    sh = batch_df.select(
        group_col, F.explode(T.shingles(text_col, 3)).alias("s")
    )
    br = SK.hll_registers(sh, group_col)
    merged = (
        registers.read()
        .unionByName(br)
        .groupBy(group_col, "bucket")
        .agg(F.max("mr").alias("mr"))
    )
    # materialize before the overwrite truncates the table the read
    # lazily references (bounded relation: <= groups x 1024 rows;
    # bounded ACROSS batches by the residency registry)
    merged = checkpoint_bounded(merged, "hll_ingest_merged")
    registers.overwrite(merged)


def prune_band_state(
    corpus: HyTable, bands_state: HyTable, id_col: str = "doc_id"
) -> int:
    """Maintenance: drop LSH band rows whose document no longer lives in
    the corpus (deleted or compacted away).  Stale band rows are a COST,
    not a correctness issue — a candidate against a deleted id joins to
    no corpus text at the verify stage and drops out — but on a
    churn-heavy 100 TB table the dead rows grow linearly with total
    deletes and every batch's band join pays for them forever; this is
    the dedup-state analogue of snapshot expiration, run on the same
    maintenance cadence.

    Deliberately does NOT touch the exact-dedup FINGERPRINT state: a
    deleted document's fingerprint is a TOMBSTONE — at-least-once
    upstreams re-deliver old content indefinitely, and a pruned
    fingerprint would silently resurrect a document an operator deleted.
    Re-admitting content after deletion is an explicit operator action
    (delete the fingerprint row), never a side effect of maintenance.

    One key-partitioned semi-join; returns the number of rows removed."""
    state = bands_state.read()
    live = corpus.read().select(id_col)
    kept = checkpoint_bounded(
        state.join(live, id_col, "left_semi"), "prune_band_state_kept"
    )
    removed = state.count() - kept.count()
    if removed:
        bands_state.overwrite(kept)
    return removed


CMS_CELL_DDL = (
    "r int, cell bigint, cnt bigint, batch_seq bigint, batch_fp bigint"
)


def cms_ingest_batch(
    batch_df: DataFrame,
    counted: HyTable,
    cells: HyTable,
    text_col: str = "text",
    id_col: str = "doc_id",
    depth: int = 4,
    width: int = 1024,
) -> int:
    """Fold one micro-batch into a persisted count-min cell table —
    streaming heavy-hitter tracking with EXACTLY-ONCE-EFFECT counting
    under at-least-once delivery.

    CMS cell counts are additive, and SUM — unlike the HLL path's
    register-wise max — is NOT idempotent: a redelivered document folded
    twice doubles its tokens' counts.  So the batch first resolves to
    one row per content fingerprint (min id) and anti-joins the
    ``counted`` fingerprint state, exactly the dedup-ingest discipline,
    and only the NOVEL documents' token cells are summed into state.

    The two state commits (cells overwrite, fingerprint append) are each
    atomic but not joint, so a crash between them must not double-count
    on retry.  Discipline: the folded cell table carries ``batch_seq`` =
    the fingerprint-table sequence this fold corresponds to; a retry
    recomputes the same novel set (same batch files, same fingerprint
    state), sees the cells already folded at that sequence, skips the
    fold, and completes the fingerprint append.  Either crash point
    replays to the same final state:

    - die after fold, before fp append → retry: novel set unchanged,
      ``max(batch_seq) == expected`` → skip fold, append fps;
    - die after both → stream replays the batch → novel set empty →
      no-op.

    The skip-if-folded rule is guarded by CONTENT, not sequence alone:
    the folded cell table also carries ``batch_fp`` — an order-free
    bit_xor of the novel set's fingerprint hashes — and a batch that
    reaches a matching ``batch_seq`` with a DIFFERENT novel set (a
    deleted checkpoint, or direct API use replaying non-verbatim)
    raises instead of silently skipping its fold, which would have
    permanently undercounted those documents' tokens with no signal.
    Callers inside the checkpointed stream never trip it — Structured
    Streaming replays the same batch files verbatim.

    State is <= depth x width cells plus 16 bytes per distinct text.
    Returns the number of novel documents counted."""
    from ..functions import sketch as SK
    from ..functions import text as T

    if not batch_df.limit(1).count():
        return 0
    head = counted.current_snapshot()
    expected = (head.sequence_number if head else 0) + 1
    w = Window.partitionBy("fp").orderBy(id_col)
    fresh = (
        batch_df.withColumn("fp", fingerprint(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .drop("_rn")
    )
    novel = fresh.join(counted.read().select("fp"), "fp", "left_anti")
    novel = checkpoint_bounded(novel, "cms_ingest_novel")
    n = novel.count()
    if n == 0:
        return 0
    novel_fp = novel.agg(
        F.expr("bit_xor(xxhash64(fp))").alias("bfp")
    ).collect()[0][0]
    cur = cells.read()
    if "batch_fp" not in cur.columns:
        # Read-compat: state written before the torn-batch guard existed
        # has no batch_fp column.  Treat those folds as fp-unknown (NULL)
        # so a checkpointed stream resumes across the upgrade instead of
        # failing on the missing column; the content guard below only
        # fires when a fingerprint IS recorded and disagrees.
        cur = cur.withColumn("batch_fp", F.lit(None).cast("bigint"))
    state = cur.agg(
        F.max("batch_seq").alias("seq"), F.max("batch_fp").alias("bfp")
    ).collect()[0]
    synced = state["seq"] or 0
    if synced < expected:
        tok = novel.select(F.explode(T.tokens(text_col)).alias("w"))
        delta = SK.cms_cells(tok, depth=depth, width=width)
        merged = (
            cells.read()
            .select("r", "cell", "cnt")
            .unionByName(delta)
            .groupBy("r", "cell")
            .agg(F.sum("cnt").alias("cnt"))
            .withColumn("batch_seq", F.lit(expected).cast("bigint"))
            .withColumn("batch_fp", F.lit(novel_fp).cast("bigint"))
        )
        # materialize before the overwrite truncates the table the
        # read lazily references (bounded: <= depth x width rows;
        # bounded ACROSS batches by the residency registry)
        merged = checkpoint_bounded(merged, "cms_ingest_merged")
        cells.overwrite(merged)
    elif (
        synced == expected
        and state["bfp"] is not None
        and state["bfp"] != novel_fp
    ):
        raise RuntimeError(
            "cms_ingest_batch: fold at batch_seq="
            f"{expected} already committed for a DIFFERENT novel set "
            f"(state batch_fp={state['bfp']}, this batch={novel_fp}); "
            "skipping would permanently undercount — replay must be "
            "verbatim (same batch files against the same fingerprint "
            "state)"
        )
    counted.append(
        novel.select(
            "fp", F.lit(expected).cast("bigint").alias("corpus_seq")
        )
    )
    return n


def start_cms_ingest(
    spark: SparkSession,
    inbox_dir: str,
    schema,
    counted: HyTable,
    cells: HyTable,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    depth: int = 4,
    width: int = 1024,
    available_now: bool = True,
):
    """Tail ``inbox_dir`` and maintain the count-min cell state table per
    micro-batch (see :func:`cms_ingest_batch`)."""

    def drain(batch_df: DataFrame, _batch_id: int) -> None:
        cms_ingest_batch(
            batch_df, counted, cells, text_col, id_col, depth, width
        )

    writer = (
        spark.readStream.schema(schema)
        .parquet(inbox_dir)
        .writeStream.foreachBatch(drain)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_hll_ingest(
    spark: SparkSession,
    inbox_dir: str,
    schema,
    registers: HyTable,
    checkpoint_dir: str,
    group_col: str = "lang",
    text_col: str = "text",
    available_now: bool = True,
):
    """Tail ``inbox_dir`` and maintain the HLL register state table per
    micro-batch (see :func:`hll_ingest_batch`)."""

    def drain(batch_df: DataFrame, _batch_id: int) -> None:
        hll_ingest_batch(batch_df, registers, group_col, text_col)

    writer = (
        spark.readStream.schema(schema)
        .parquet(inbox_dir)
        .writeStream.foreachBatch(drain)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- frame-level video dedup ingest ------------------------------------------
# The streaming form of queries/multimodal.py::video_frame_dedup (the
# r11 round's clip-reuse detector): a stream of videos dedups FRAMES
# incrementally against the accumulated frame-fingerprint state, so an
# ingestion pipeline can drop or downweight mostly-recycled footage as
# it arrives instead of re-scanning the corpus.  State is narrow (one
# row per distinct frame fingerprint), never the payload bytes.

FRAME_STATE_DDL = (
    "fp string, video_id bigint, frame_idx int, batch_seq bigint"
)


def video_frame_rows(batch_df: DataFrame,
                     id_col: str = "media_id",
                     payload_col: str = "payload") -> DataFrame:
    """(video, payload) -> one row per decoded FRAME with its pixel
    fingerprint, via the REAL AVI decoder (uncompressed-RGB or MJPG) —
    map-only Arrow stage, linear in footage."""
    import hashlib

    import pandas as pd
    from pyspark.sql import types as SPARK_T

    from ..sources.multimodal import avi_decode

    def frame_fps(batches):
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                frames, _fps = avi_decode(bytes(p))
                for f in range(frames.shape[0]):
                    rows.append((
                        int(mid),
                        f,
                        frames.shape[0],
                        hashlib.md5(frames[f].tobytes()).hexdigest(),
                    ))
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_idx", "n_frames", "fp"]
            ).astype({"frame_idx": "int32", "n_frames": "int32"})

    return batch_df.mapInPandas(
        frame_fps,
        SPARK_T.StructType([
            SPARK_T.StructField("video_id", SPARK_T.LongType()),
            SPARK_T.StructField("frame_idx", SPARK_T.IntegerType()),
            SPARK_T.StructField("n_frames", SPARK_T.IntegerType()),
            SPARK_T.StructField("fp", SPARK_T.StringType()),
        ]),
    )


def frame_dedup_ingest_batch(
    batch_df: DataFrame,
    frame_state: HyTable,
    report: HyTable | None = None,
    id_col: str = "media_id",
    payload_col: str = "payload",
    batch_seq: int | None = None,
) -> int:
    """Apply one micro-batch of videos: decode every frame ONCE (the
    frame relation is checkpointed — decode is this operator's dominant
    cost and feeds both the state anti-join and the report), claim the
    batch's FIRST occurrence of each new fingerprint (window by
    (video_id, frame_idx) — the same canonical-keeper rule as the batch
    operator), anti-join against the accumulated state, append the
    novel frames to the state table, and (optionally) append a
    per-video report row (video_id, n_frames, novel_frames, batch_seq)
    to ``report``.  Returns the number of novel frames.

    Effectively-once under at-least-once re-delivery when ``batch_seq``
    is supplied (the streaming drain passes the foreachBatch id): state
    rows carry the batch_seq that admitted them, the report is derived
    from the STATE's rows for this batch_seq (so a retry that finds
    zero new fingerprints still reports the original novel counts), and
    a batch_seq already present in the report skips the append instead
    of duplicating rows — the same torn-batch discipline as
    cms_ingest_batch.

    Sequential micro-batches reproduce batch semantics exactly: a
    frame is novel iff no frame with the same fingerprint precedes it
    in (video_id, frame_idx) order across ALL batches, provided videos
    arrive in id order across batches (the replay oracle's contract)."""
    seq = -1 if batch_seq is None else int(batch_seq)
    frames = checkpoint_bounded(
        video_frame_rows(batch_df, id_col, payload_col),
        "frame_dedup_ingest_frames",
    )
    w = Window.partitionBy("fp").orderBy("video_id", "frame_idx")
    first = (
        frames.withColumn("_rn", F.row_number().over(w))
        .withColumn("_claimed", F.col("_rn") == 1)
        .drop("_rn")
    )
    # no .distinct() on the state side: LEFT ANTI produces the same
    # rows whether or not the right side carries duplicates, and state
    # fps are unique by construction anyway — the distinct was a full
    # shuffle of the (corpus-growing) state table per micro-batch
    # (guide §2.4: a distinct on data that is already unique)
    seen = frame_state.read().select("fp")
    flagged = (
        first.join(seen.hint("shuffle_hash"), "fp", "left_anti")
        .filter(F.col("_claimed"))
        .select("fp", "video_id", "frame_idx", "n_frames")
    )
    flagged = checkpoint_bounded(flagged, "frame_dedup_ingest_flagged")
    n = flagged.count()
    if n:
        frame_state.append(
            flagged.select(
                "fp", "video_id", "frame_idx",
                F.lit(seq).cast("bigint").alias("batch_seq"),
            )
        )
    if report is not None:
        # the re-delivery guard scans the report only when the manifest
        # says it has rows at all (row counts are snapshot metadata —
        # a fresh table answers without a Spark job); the scan itself
        # is unchanged, so the effectively-once discipline is intact
        head = report.current_snapshot()
        report_has_rows = head is not None and any(
            f.row_count for f in head.manifest
        )
        if batch_seq is not None and report_has_rows and report.read().filter(
            F.col("batch_seq") == seq
        ).limit(1).count():
            return n  # re-delivered batch: report rows already landed
        # novel counts come from the STATE's rows for this batch_seq
        # (not from `flagged`): a retry after a torn state-then-crash
        # attempt sees flagged empty but the state remembers what this
        # batch admitted.  batch_seq None (ad-hoc batch use) keeps the
        # direct flagged counts.
        novel_src = (
            frame_state.read().filter(F.col("batch_seq") == seq)
            if batch_seq is not None
            else flagged
        )
        per_video = (
            frames.select("video_id", "n_frames").distinct()
            .join(
                novel_src.groupBy("video_id")
                .agg(F.count(F.lit(1)).cast("bigint").alias("novel_frames")),
                "video_id",
                "left",
            )
            .select(
                "video_id",
                F.col("n_frames").cast("bigint").alias("n_frames"),
                F.coalesce("novel_frames", F.lit(0)).alias("novel_frames"),
                F.lit(seq).cast("bigint").alias("batch_seq"),
            )
        )
        report.append(per_video)
    return n


def start_frame_dedup_ingest(
    spark: SparkSession,
    inbox_dir: str,
    schema,
    frame_state: HyTable,
    checkpoint_dir: str,
    report: HyTable | None = None,
    available_now: bool = True,
):
    """Tail ``inbox_dir`` (parquet files of (media_id, payload) videos)
    and dedup frames incrementally against the fingerprint state table
    (see :func:`frame_dedup_ingest_batch`)."""

    def drain(batch_df: DataFrame, batch_id: int) -> None:
        frame_dedup_ingest_batch(
            batch_df, frame_state, report, batch_seq=batch_id
        )

    writer = (
        spark.readStream.schema(schema)
        .parquet(inbox_dir)
        .writeStream.foreachBatch(drain)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
