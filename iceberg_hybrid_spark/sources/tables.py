"""Parquet lake sources.

The driver's testdata is one parquet file per table per scale factor
(``/root/testdata/sf*/<name>.parquet``).  On a real 100 TB lake each
"table" would be a directory of many files — ``spark.read.parquet`` takes
either, so nothing here changes at scale.  Filters and projections applied
by callers push down into the scan (Catalyst → parquet footer min/max).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always broadcast in joins.
DIM_TABLES = frozenset({"region", "nation", "supplier"})

# Expression-heavy corpus tables: per-row work (shingle folds, simhash
# vote folds, window chunking, Arrow kernels) dominates their queries,
# so a degenerate scan split count serializes the whole query.  The
# relational fact tables (lineitem/orders/events) are deliberately NOT
# here: their queries are shuffle/join-bound, and an extra pre-join
# exchange measurably loses (A/B at sf0.1: q3 0.98 s with vs 0.41 s
# without) — the first groupBy/join shuffle already spreads their work.
FOLD_HEAVY_TABLES = frozenset({"documents", "embeddings"})

# Rescue width for degenerate scans.  A CONSTANT, not defaultParallelism,
# on purpose: round-robin repartition (sort-before-shuffle, so the layout
# is a pure function of input order and width) feeds seeded KMeans
# training (IVF / SemDeDup), whose fitted centroids are pinned as oracle
# literals — a core-count-dependent width would make the trained model,
# and therefore correctness, depend on the machine.  64 saturates any
# plausible local executor count; the guard never fires on a real
# many-file corpus, so this is not a cluster-size assumption.
_RESCUE_PARTITIONS = 64


def _ensure_scan_parallelism(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Rescue degenerate scan granularity: when a fold-heavy table arrives as
    fewer splits than the constant rescue width (single-file fixtures,
    one-row-group parquet — which CANNOT split below a row group — or a
    non-splittable codec), round-robin repartition to that width so
    per-row expression work runs on every core instead of one.

    This is Spark's own documented remedy for unsplittable inputs, made
    conditional: at 100 TB a fact scan has thousands of row-group splits
    and the guard is a no-op (no shuffle added); it only fires when the
    alternative is a serialized map stage.  An explicit partition count
    pins the exchange against AQE coalescing (584 KB of documents would
    otherwise re-merge into one partition and re-serialize the fold).
    Round-robin repartition is value-neutral and Catalyst pushes filters
    and column pruning through it into the scan (verified in
    docs/PLANS.md: PushedFilters survive).

    The trigger is MACHINE-INDEPENDENT by design: it compares the scan's
    split count against the constant rescue width, never against
    defaultParallelism.  The rescued layout feeds seeded distributed
    KMeans training (IVF / SemDeDup) whose fitted centroids are pinned
    as oracle literals, so both the width (the constant below) and the
    *decision to fire* must be a pure function of the input files — a
    core-count-dependent trigger would silently change the trained
    model, and therefore correctness, between hosts."""
    if df.rdd.getNumPartitions() < _RESCUE_PARTITIONS:
        return df.repartition(_RESCUE_PARTITIONS)
    return df


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Per-session DataFrame cache.  The testdata lake is immutable and a
# DataFrame is just an analyzed plan, so re-handing the same object out
# skips the file listing + footer schema read (several py4j round trips
# per call — measured ~0.2-0.5 s of plan-build time per multi-table
# query).  Keyed weakly on the session so a stopped session's plans
# never leak into its successor.
_CACHE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    per_session = _CACHE.setdefault(spark, {})
    key = (os.path.abspath(sf_dir), name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # The events parquet stores ts as INT64 TIMESTAMP(NANOS), which a
        # vanilla Spark session rejects outright (PARQUET_TYPE_ILLEGAL).
        # Callers may hand us a SparkSession we didn't build (the harness
        # does), so set the legacy conf here at runtime — it's a session
        # conf, idempotent, and safe to flip before every events read.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the file; with nanosAsLong it arrives
        # as int64 nanos.  Floor-divide to micros (matches DuckDB's
        # ns→µs truncation) and restore a proper timestamp column.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if name in FOLD_HEAVY_TABLES:
        df = _ensure_scan_parallelism(spark, df)
    per_session[key] = df
    return df


# --- deterministic corpus sampling ------------------------------------------
# Shared hash-sample predicate for the audit-tier calibrators' sampled
# production twins (minhash_estimate_calibration_sampled,
# dedup_modality_agreement_sampled, kmv_source_overlap_sampled): keep a
# document iff the first hex nibble of md5(doc_id || ':cal') is <= the
# threshold nibble.  md5 over the same byte string is identical in Spark
# and DuckDB (the domain_mix_sample trick), so BOTH engines evaluate the
# exact same predicate — no RNG state, reproducible across runs, and the
# sample composes with any downstream per-pair operator because
# membership is a pure function of doc_id.  The default nibble '3' keeps
# 4/16 = ~25% of documents; a 100 TB deployment tightens the threshold
# (more hex digits, smaller prefix) so the expected sample size stays
# FIXED as the corpus grows — that is the knob that turns the
# corpus-wide audit queries into fixed-cost scheduled monitors.
DOC_SAMPLE_NIBBLE = "3"


def duck_doc_sample_where(
    col: str = "doc_id", nibble: str = DOC_SAMPLE_NIBBLE
) -> str:
    """DuckDB text of the sample predicate over column ``col`` — the
    byte-identical twin of ``sample_documents``'s Spark filter.
    ``nibble`` may be a multi-character hex prefix for finer rates:
    '3' keeps 4/16, '00' keeps 1/256, '00f' keeps 16/4096 — the knob a
    growing corpus tightens to hold the expected SAMPLE SIZE fixed."""
    n = len(nibble)
    return f"substr(md5({col}::VARCHAR || ':cal'), 1, {n}) <= '{nibble}'"


DUCK_DOC_SAMPLE_WHERE = duck_doc_sample_where()


# The fixed-SIZE sample contract for the SCHEDULED monitors: every
# run derives the hex-prefix threshold from the live corpus count so
# the expected sample stays ~this many documents as the corpus grows —
# the knob that makes pipeline_health and the calibrator twins
# fixed-cost at 100 TB (docs/SCALING.md: fixed-fraction 2.9x at 64x
# vs fixed-size 1.9x).
PIPELINE_SAMPLE_TARGET_DOCS = 1200


def nibble_for_target(corpus_docs: int, target_docs: int) -> str:
    """The hex-prefix threshold that keeps an expected ``target_docs``
    out of ``corpus_docs`` — the mechanical form of the fixed-size
    sample knob (schedule: recompute from the corpus row count each
    run; the returned prefix is deterministic, so two runs at the same
    corpus size sample the same documents).

    Uses an 8-hex-digit prefix (2^32 buckets): the threshold is the
    largest prefix value P such that (P+1)/2^32 <= target/corpus,
    floored at one bucket.  One bucket is worth corpus/2^32 documents,
    so the expected sample stays within one document of the target
    through ~10^12-doc corpora (a 4-digit prefix's 65,536 buckets
    already overshoot a 1,200-doc target 12x at 10^9 docs — real
    100 TB corpora need the finer knob).  Rates above 1 return the
    accept-everything threshold.  Pure INTEGER arithmetic (``//``, not
    ``int(/)``) so the in-SQL twin (``(4294967296 * target) // n`` in
    DuckDB, ``duck_doc_sample_where_fixed_size``) derives the identical
    threshold bit-for-bit from the same corpus count."""
    if corpus_docs <= 0 or target_docs >= corpus_docs:
        return "ffffffff"
    buckets = max(1, (4294967296 * target_docs) // corpus_docs)
    return format(buckets - 1, "08x")


def duck_doc_sample_where_fixed_size(
    col: str = "doc_id",
    target: int = PIPELINE_SAMPLE_TARGET_DOCS,
    table: str = "documents",
) -> str:
    """DuckDB text of the FIXED-SIZE sample predicate: the threshold is
    derived INSIDE SQL from the live corpus count (scalar subquery), so
    the oracle and the Spark side (``sample_documents_fixed_size``,
    which derives the same threshold via ``nibble_for_target`` from
    ``docs.count()``) agree bit-for-bit at every corpus size — integer
    division, ``greatest(1, ·)`` floor, lowercase 8-hex padding all
    mirror the Python arithmetic exactly."""
    thr = (
        f"(SELECT CASE WHEN n <= 0 OR {target} >= n THEN 'ffffffff' "
        f"ELSE lower(lpad(to_hex(greatest(1, (4294967296 * {target}) // n)"
        f" - 1), 8, '0')) END "
        f"FROM (SELECT COUNT(*) AS n FROM {table}) AS _corpus_n)"
    )
    return f"substr(md5({col}::VARCHAR || ':cal'), 1, 8) <= {thr}"


DUCK_DOC_SAMPLE_WHERE_FIXED_SIZE = duck_doc_sample_where_fixed_size()


def sample_documents(docs: DataFrame, nibble: str = DOC_SAMPLE_NIBBLE) -> DataFrame:
    """Deterministic hash-sample of a documents relation (see above).

    Evaluates map-side in the scan stage (a pure projection predicate —
    Catalyst pushes it into the parquet scan), so everything downstream
    of the filter runs on the sampled relation only."""
    from pyspark.sql import functions as F

    return docs.filter(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":cal"))),
            1,
            len(nibble),
        )
        <= nibble
    )


def sample_documents_fixed_size(
    docs: DataFrame, target: int = PIPELINE_SAMPLE_TARGET_DOCS
) -> DataFrame:
    """Fixed-SIZE deterministic sample: count the corpus (a
    parquet-metadata count — row-group stats, no data scan), derive the
    hex-prefix threshold with ``nibble_for_target``, and filter with it.
    The expected sample size stays ~``target`` documents no matter how
    large the corpus grows — the scheduled-monitor form of the sample
    knob.  ``duck_doc_sample_where_fixed_size`` is the byte-identical
    SQL twin (same count, same integer derivation, same predicate)."""
    return sample_documents(docs, nibble_for_target(docs.count(), target))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every lake table as a temp view (for spark.sql queries)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
