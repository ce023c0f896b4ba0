"""LLM-data-pipeline queries: text analysis, dedup, similarity search.

These are the north-star operators (BASELINE.json): each is expressed as
shuffle-bounded DataFrame ops — no driver-side loops, no row-at-a-time
Python UDFs — so the same plan runs over a 100 TB documents table.

The DuckDB oracles mirror the exact arithmetic shape (same operand order,
same rounding) so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dedup as D
from ..plans.barrier import stop_predicate_pushdown
from ..functions import similarity as S
from ..functions import text as T
from ..functions.text import round_stable
from ..sources.tables import (
    DUCK_DOC_SAMPLE_WHERE_FIXED_SIZE,
    load_table,
    sample_documents,
    sample_documents_fixed_size,
)
from ._ivf_oracle import EMBEDDING_IVF_SQL
from ._recall_oracle import ANN_RECALL_SQL
from ._ivfpq_oracle import EMBEDDING_IVFPQ_SQL
from ._pq_oracle import EMBEDDING_PQ_SQL
from ._semdedup_oracle import SEMANTIC_DEDUP_SQL
from ._cdc_oracle import CDC_CHUNK_OVERLAP_SQL
from ._minhash_calib_oracle import (
    MINHASH_CALIB_SAMPLED_SQL,
    MINHASH_CALIB_SQL,
)
from ._simhash_oracle import (
    SIMHASH_CALIBRATION_SQL,
    SIMHASH_FPS_VALUES,
    SIMHASH_NEAR_DUP_SQL,
)
from .spec import QuerySpec

# DuckDB fragment computing distinct 3-token shingles from `text`.
_DUCK_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))"
)


# --- text analysis ----------------------------------------------------------

def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tc = T.token_count("text")
    return (
        docs.select("lang", tc.alias("tc"), "n_chars")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("tc").cast("bigint").alias("total_tokens"),
            T.round_stable(F.avg("tc"), 4).alias("avg_tokens"),
            T.round_stable(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("lang")
    )


DOC_TOKEN_STATS_SQL = """
SELECT lang,
       COUNT(*) AS doc_count,
       CAST(SUM(tc) AS BIGINT) AS total_tokens,
       ROUND(AVG(tc) - 0.000000001, 4) + 0.0 AS avg_tokens,
       ROUND(AVG(n_chars) - 0.000000001, 4) + 0.0 AS avg_chars
FROM (SELECT lang, n_chars, len(string_split(text, ' ')) AS tc FROM documents) d
GROUP BY lang ORDER BY lang
"""


def bpe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting under a BPE-ish regex pre-tokenizer next to the
    whitespace count: per language, both totals and their ratio — the
    estimate a training-data pipeline uses to convert corpus size into
    a token budget (whitespace alone undercounts punctuation-heavy and
    numeric text).  Map-only + one partial-agg shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    ws = T.token_count("text")
    bpe = T.bpe_token_count("text")
    return (
        docs.select("lang", ws.alias("ws"), bpe.alias("bpe"))
        .groupBy("lang")
        .agg(
            F.sum("ws").cast("bigint").alias("whitespace_tokens"),
            F.sum("bpe").cast("bigint").alias("bpe_tokens"),
            T.round_stable(F.sum("bpe") / F.sum("ws"), 4).alias("inflation"),
        )
        .orderBy("lang")
    )


BPE_TOKEN_BUDGET_SQL = r"""
SELECT lang,
       CAST(SUM(ws) AS BIGINT) AS whitespace_tokens,
       CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
       ROUND(SUM(bpe) * 1.0 / SUM(ws) - 0.000000001, 4) + 0.0 AS inflation
FROM (
  SELECT lang,
         len(string_split(text, ' ')) AS ws,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+')) AS bpe
  FROM documents
) d
GROUP BY lang ORDER BY lang
"""


def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").cast("bigint").alias("token_count"),
        T.distinct_token_count("text").cast("bigint").alias("distinct_tokens"),
        T.lexical_diversity("text").alias("lexical_diversity"),
        T.stopword_ratio("text").alias("stopword_ratio"),
        T.quality_score("text").alias("quality_score"),
    ).orderBy("doc_id")


DOC_QUALITY_SQL = """
SELECT doc_id,
       tc AS token_count,
       dt AS distinct_tokens,
       ROUND(dt / tc - 0.000000001, 4) + 0.0 AS lexical_diversity,
       ROUND(sc / tc - 0.000000001, 4) + 0.0 AS stopword_ratio,
       ROUND(0.5 * (dt / tc)
             + 0.3 * least((sc / tc) * 10.0, 1.0)
             + 0.2 * least(tc / 100.0, 1.0) - 0.000000001, 4) + 0.0 AS quality_score
FROM (
  SELECT doc_id,
         len(string_split(text, ' ')) AS tc,
         len(list_distinct(string_split(text, ' '))) AS dt,
         len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS sc
  FROM documents
) d
ORDER BY doc_id
"""


def language_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic vs. labeled lang — confusion counts."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", T.language_guess("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("lang", "lang_pred")
    )


LANGUAGE_PREDICTION_SQL = """
SELECT lang,
       CASE WHEN ROUND(sc / tc - 0.000000001, 4) >= 0.04 THEN 'en' ELSE 'other' END AS lang_pred,
       COUNT(*) AS doc_count
FROM (
  SELECT lang,
         len(string_split(text, ' ')) AS tc,
         len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS sc
  FROM documents
) d
GROUP BY 1, 2 ORDER BY lang, lang_pred
"""


# --- dedup ------------------------------------------------------------------

def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dup_groups(docs).orderBy("fingerprint")


DEDUP_EXACT_SQL = """
SELECT md5(text) AS fingerprint,
       MIN(doc_id) AS canonical_id,
       COUNT(*) AS dup_count
FROM documents GROUP BY 1 ORDER BY fingerprint
"""


def shingle_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-canonical rolling fingerprint (document fingerprinting op)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.shingle_fingerprint("text").alias("fingerprint")
    ).orderBy("doc_id")


SHINGLE_FINGERPRINT_SQL = f"""
SELECT doc_id,
       md5(array_to_string(list_sort({_DUCK_SHINGLES}), '|')) AS fingerprint
FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d
ORDER BY doc_id
"""


def near_dup_shingle_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most similar document pairs by 3-gram shingle Jaccard,
    blocked on a length bucket (n_chars//16) — the EXACT BASELINE of the
    near-dup family.

    Blocking turns the full cross join into per-bucket self-joins, but
    the sweep remains QUADRATIC in per-block density: when corpus growth
    concentrates into the same (lang, length-bucket) blocks, pair volume
    grows as the square of block size (measured: 17.5x wall at 16x data,
    ~4096x pairs / ~110x wall at 64x — docs/SCALING.md r8).  Top-k has
    no prunable threshold, so no filter is sound within these semantics;
    at scale the remedy is OPERATOR CHOICE — MinHash banding (22x
    cheaper at 64x, recall argument) or the PPJoin threshold join
    (exactness guarantee) supersede this sweep, and this query exists as
    the ground-truth baseline they are audited against.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 16).cast("bigint").alias("bucket"),
        # 64-bit hashed shingles: 8-byte longs through the shuffle instead
        # of k-word strings; jaccard equal up to ~n²/2⁶⁴ collisions.
        T.shingle_hashes("text").alias("sh"),
    ).repartition(F.col("lang"), F.col("bucket"))
    # The explicit hash-repartition materializes the shingle arrays once
    # behind a shuffle boundary and co-locates the self-join; the partition
    # count is left to spark.sql.shuffle.partitions / AQE so the join
    # parallelism scales with the cluster, not a literal.
    # Blocking on (lang, length-bucket) keeps candidate generation
    # near-linear — near-duplicates share language and similar length.
    a = d.alias("a")
    # shuffle_hash (not broadcast): a broadcast build side would be a
    # SECOND copy of the shingle-computation subtree, while the shuffle
    # join's build side is a ReusedExchange — shingles computed once.
    b = d.alias("b").hint("shuffle_hash")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    # jaccard is computed inside the join stage (arrays never shuffle
    # again) and top-k runs as TakeOrderedAndProject — per-partition heaps
    # + driver merge of 20 rows, no global sort.
    scored = pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        D.ngram_jaccard(F.col("a.sh"), F.col("b.sh")).alias("jaccard"),
    )
    return scored.orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b")).limit(20)


NEAR_DUP_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, n_chars // 16 AS bucket, {_DUCK_SHINGLES} AS sh
  FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w FROM documents) x
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
             / (len(a.sh) + len(b.sh)
                - len(list_filter(a.sh, s -> list_contains(b.sh, s))))
             - 0.000000001, 4) + 0.0 AS jaccard
FROM d a JOIN d b
  ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
ORDER BY jaccard DESC, doc_a ASC, doc_b ASC
LIMIT 20
"""


def jaccard_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (PPJoin,
    Xiao/Wang/Lin/Yu, WWW'08): every document pair with 3-gram shingle
    Jaccard >= 0.3 — the same similarity and threshold as the
    MinHash-LSH family, but with a completeness GUARANTEE instead of a
    banding recall argument (dedup of legal/medical corpora wants
    exactly this).  Each document's distinct shingles are ordered
    RAREST-FIRST (global frequency, value tie-break); the prefix-filter
    theorem says two sets with J >= t must share an element within
    their first |x| - ceil(t·|x|) + 1 elements under any one global
    order, so the candidate join runs on prefix shingles only — and
    rare shingles collide seldom, which is what bounds candidates at
    corpus scale.  The full WWW'08 filter stack is applied:

    - **canonical asymmetric prefixes**: pairs are oriented by the
      global document order (set size, then id); the SMALLER side only
      indexes its first ``n - ceil(2t/(1+t)·n) + 1`` elements (the
      paper's indexing prefix — at t=0.3, ``n - ceil(6n/13) + 1``,
      ~54% of the doc vs the 70% probing prefix), because the required
      overlap against any same-or-larger partner is at least
      ``2t/(1+t)·n``, so the first shared element of a qualifying pair
      must land that early in the smaller doc;
    - **length filter** on the join condition — ``J >= t`` forces
      ``overlap <= min(|x|,|y|)`` and ``overlap >= t/(1+t)(|x|+|y|)``,
      hence ``min(|x|,|y|)/max(|x|,|y|) >= t``; at t=0.3 the
      integer-exact form is ``10*min(n) >= 3*max(n)``, pruning every
      size-mismatched collision BEFORE the pair ever materializes;
    - **positional filter** on the FIRST and LAST shared prefix
      elements — both docs are sorted by the SAME global (freq, hash)
      order, so any shared element smaller than the first prefix match
      would itself be an earlier prefix match; the true overlap is
      exactly ``1 + overlap(>first)`` and exactly
      ``pmatch + overlap(>last)``, each bounded via the remaining
      suffix lengths ``min(|x|-i, |y|-j)`` at the match positions, and
      pairs where both bounds fall below the required overlap
      ``alpha = ceil(t/(1+t)·(|x|+|y|)) = ceil(3(|x|+|y|)/13)`` are
      pruned before verification.

    All three only remove pairs exact verification would reject, so
    the output is bit-identical to the plain-prefix form — and the
    brute-force oracle certifies that, not just the arithmetic.
    Verification itself reuses the last-match decomposition: every
    shared element up to the last prefix match is one of the counted
    ``pmatch`` matches, so ``overlap = pmatch + |tail_a ∩ tail_b|``
    with the tails sliced after the last-match positions — exact, and
    the intersect never re-touches the prefix region.  Measured on the
    16x salted corpus (docs/SCALING.md r8): pairs reaching
    verification 10,368,861 (prefix-only) -> 5,126,336 (full stack,
    2.0x), join rows cut ~25% by the short index prefix; wall floor
    22.0 s -> 11.0 s at 16x and 7.7 s -> 4.9 s at 1x (plus one fewer
    relation: n/prefixes/verify arrays all derive from the single
    rarest-first aggregate).  At t as low as 0.3 the
    prefixes are 54-70% of every document, so candidate volume tracks
    the corpus's shingle-frequency spectrum — growth stays exactly
    linear (16.0x pairs at 16x data, constant per-doc), which is the
    correct asymptotic for an exactness-guaranteed similarity join.

    Scale shape: one shingle-frequency counting shuffle, one groupBy
    re-assembling each doc's rarest-first order (the sort is per-doc
    inside the aggregate — struct(freq, shingle) arrays, no global rank
    and no global sort), an equi-join of index-prefix against
    probe-prefix shingles whose volume tracks rare-shingle collisions
    AFTER length pruning, a per-pair counting/min/max aggregate
    (replacing the old DISTINCT — same single shuffle) applying the
    positional bounds, and exact tail verification only on surviving
    candidates.  Shingles are 8-byte xxhash64 longs Spark-side (the
    shuffle-width trick the whole ngram family uses); the oracle
    recomputes with STRING shingles — Jaccard is hash-invariant up to
    ~n²/2⁶⁴ collisions.  Oracle: brute-force ALL-PAIRS Jaccard in
    DuckDB — any pair the filter stack misses fails the value gate, so
    the gate certifies the theorem's implementation, not just the
    arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    el = docs.select(
        "doc_id", F.explode(T.shingle_hashes("text")).alias("h")
    )
    freq = el.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    # per-doc rarest-first order without a global rank: struct(c, h)
    # sorts lexicographically, so sort_array IS the frequency order.
    # Everything downstream (set size n, prefixes, verification hash
    # arrays) derives from this ONE relation — the shingle hashing of
    # the raw text runs once per element branch, never re-joined
    # against a separate per-doc array relation.
    ordered = (
        el.join(freq, "h")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("c", "h"))).alias("ord"))
        # hash-only view of the same global order, for tail verification
        .withColumn("hs", F.expr("transform(ord, s -> s.h)"))
        .withColumn("n", F.size("ord"))
    )
    # Two prefix relations off the same rarest-first order (posexplode
    # keeps each element's 0-based position in the FULL order — slice
    # starts at 1 — for the positional filter; n rides along for the
    # length filter), integer-exact lengths at t = 0.3:
    #   probe (any side):     p = n - ceil(3n/10)  + 1  (~70% of n)
    #   index (smaller side): p = n - ceil(6n/13)  + 1  (~54% of n)
    base = ordered

    def _prefix(rel, length_expr):
        return (
            rel.select(
                "doc_id",
                "n",
                F.posexplode(
                    F.slice(F.col("ord"), F.lit(1), F.expr(length_expr))
                ).alias("pos", "s"),
            )
            .select(
                "doc_id", "n", "pos",
                F.col("s.c").alias("c"), F.col("s.h").alias("h"),
            )
        )

    idx = _prefix(base, "n - ((6 * n + 12) DIV 13) + 1")
    probe = _prefix(base, "n - ((3 * n + 9) DIV 10) + 1")
    # Canonical orientation (size, then id): side a is the SMALLER doc
    # and contributes only its short index prefix.  The length filter
    # sits INSIDE the join condition, so size-mismatched hash
    # collisions never become rows of the candidate relation at all.
    cand = (
        idx.alias("a")
        .join(
            probe.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (
                (F.col("a.n") < F.col("b.n"))
                | (
                    (F.col("a.n") == F.col("b.n"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))
                )
            )
            & (F.col("a.n") * 10 >= F.col("b.n") * 3),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(
            F.count(F.lit(1)).alias("pmatch"),
            # first/last shared prefix element under the global (c, h)
            # order — min/max(struct) IS that order; positions tag along
            F.min(
                F.struct(
                    F.col("a.c").alias("c"),
                    F.col("a.h").alias("h"),
                    F.col("a.pos").alias("pa"),
                    F.col("b.pos").alias("pb"),
                )
            ).alias("fm"),
            F.max(
                F.struct(
                    F.col("a.c").alias("c"),
                    F.col("a.h").alias("h"),
                    F.col("a.pos").alias("pa"),
                    F.col("b.pos").alias("pb"),
                )
            ).alias("lm"),
        )
        # positional filter, both valid bounds (0-based positions, must
        # reach alpha = ceil(3*(na+nb)/13)):
        #   first match:  overlap == 1 + overlap(>fm)
        #                         <= 1 + min(na-1-fm.pa, nb-1-fm.pb)
        #   last match:   every shared element < lm sits before lm in
        #                 BOTH sorted docs, hence inside both joined
        #                 prefixes, hence IS a counted match — so
        #                 overlap == pmatch + overlap(>lm)
        #                         <= pmatch + min(na-1-lm.pa, nb-1-lm.pb)
        .filter(
            F.expr(
                "least(1 + least(na - 1 - fm.pa, nb - 1 - fm.pb),"
                " pmatch + least(na - 1 - lm.pa, nb - 1 - lm.pb))"
                " >= (3 * (na + nb) + 12) DIV 13"
            )
        )
        .select("id_a", "id_b", "na", "nb", "pmatch", "lm")
    )
    # Exact verification via the SAME sorted-order decomposition: every
    # shared element <= lm is one of the pmatch prefix-prefix matches,
    # and every shared element > lm sits strictly after lm's position
    # in BOTH docs — so overlap = pmatch + |tail_a ∩ tail_b| with the
    # tails sliced after the last-match positions.  Bit-identical to
    # intersecting the full arrays, but the per-pair intersect runs on
    # the (usually short) tails only — measured 15.6 s -> 9.8 s on the
    # 16x corpus.  The doc->array join sides stay corpus-sized (never
    # candidate-sized); the wide arrays ride the join output inside one
    # codegen stage, not a shuffle.
    ha = ordered.select(F.col("doc_id").alias("id_a"), F.col("hs").alias("hsa"))
    hb = ordered.select(F.col("doc_id").alias("id_b"), F.col("hs").alias("hsb"))
    o = F.col("pmatch") + F.size(
        F.array_intersect(
            F.expr("slice(hsa, lm.pa + 2, na)"),
            F.expr("slice(hsb, lm.pb + 2, nb)"),
        )
    )
    verified = (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .select(
            # canonical orientation is (smaller set, larger set);
            # normalize back to numeric id order for the output contract
            F.least("id_a", "id_b").alias("out_a"),
            F.greatest("id_a", "id_b").alias("out_b"),
            round_stable(
                o / F.greatest(F.col("na") + F.col("nb") - o, F.lit(1)), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.3)
        .select(
            F.col("out_a").alias("id_a"),
            F.col("out_b").alias("id_b"),
            "jaccard",
        )
    )
    return verified.orderBy("id_a", "id_b")


PREFIX_FILTER_SQL = f"""
WITH sets AS (
  SELECT doc_id, {_DUCK_SHINGLES} AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) x
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
             / GREATEST(len(a.sh) + len(b.sh)
                        - len(list_filter(a.sh, s -> list_contains(b.sh, s))), 1)
             - 0.000000001, 4) + 0.0 AS jaccard
FROM sets a JOIN sets b ON a.doc_id < b.doc_id
WHERE ROUND(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
            / GREATEST(len(a.sh) + len(b.sh)
                       - len(list_filter(a.sh, s -> list_contains(b.sh, s))), 1)
            - 0.000000001, 4) + 0.0 >= 0.3
ORDER BY id_a, id_b
"""


def minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs verified by exact shingle Jaccard.

    Banding is 32 hashes in 16 bands of 2 rows: candidate probability is
    1-(1-J²)^16, so random pairs (J ~ 0.001) essentially never collide
    (~16·J² each) while true near-dups — every planted pair in this
    corpus sits at J >= 0.8 — are missed with probability (1-0.64)^16 ~
    8e-8.  The earlier 16×1-row banding admitted ANY single matching
    slot, which made 2.6% of ALL pairs candidates (139k of 12.5M at
    sf0.1) — a dense relation in disguise; 2-row bands collapse the
    candidate volume to true-duplicate density (4.4k pairs at sf0.1),
    which is what survives a 100 TB corpus.

    Oracle: the exact all-pairs Jaccard >= 0.3 relation.  The two agree
    exactly when banding recall is 1.0 over the threshold pairs actually
    present — verified bit-identical at sf0.001, sf0.01 and sf0.1
    (deterministic: fixed xxhash64 seeds; no fixture pair lies below
    J = 0.8).  A hypothetical adversarial pair barely above 0.3 has a
    ~1-(1-0.09)^16 ~ 78% candidate chance — callers needing the exact
    relation at the boundary use the blocked-exact
    ``near_dup_shingle_pairs``.
    Recall is additionally pinned by planted-duplicate unit tests.
    """
    return _minhash_near_dup(load_table(spark, sf_dir, "documents"))


def _minhash_near_dup(docs: DataFrame, ordered: bool = True) -> DataFrame:
    """Body of ``minhash_near_dup`` over an arbitrary documents relation
    (full corpus, or a hash-sample — banding and verify are per-pair, so
    the pair relation over a filtered corpus equals the full relation
    restricted to surviving endpoints).  ``ordered=False`` skips the
    output sort for internal consumers (component labelling, agreement
    aggregation) whose next step is a key shuffle that destroys the
    order anyway — the global sort is a range exchange + sample pass
    paid for nothing (guide §2.4: an orderBy used only to make output
    deterministic)."""
    cands = D.minhash_lsh_candidates(docs, num_hashes=32, bands=16)
    d = docs.select("doc_id", T.shingle_hashes("text").alias("sh"))
    verified = (
        cands.join(d.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(d.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            # barrier: keep the threshold filter above the candidate
            # joins — fused into a join residual the array_intersect
            # runs per probe pair outside codegen CSE (3x, see
            # near_dup_threshold_sweep / plans/barrier.py)
            stop_predicate_pushdown(
                D.ngram_jaccard(F.col("sh_a"), F.col("sh_b"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.3)
    )
    return verified.orderBy("id_a", "id_b") if ordered else verified


# The oracle is the *exact* pair relation the LSH path approximates; they
# coincide because banding recall is 1.0 on this corpus (see docstring).
# DuckDB computes Jaccard over string shingles, Spark over 64-bit hashed
# shingles — equal up to ~n²/2⁶⁴ hash collisions, same as NEAR_DUP_SQL.
MINHASH_NEAR_DUP_SQL = f"""
WITH d AS (
  SELECT doc_id, {_DUCK_SHINGLES} AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) x
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
             / (len(a.sh) + len(b.sh)
                - len(list_filter(a.sh, s -> list_contains(b.sh, s))))
             - 0.000000001, 4) + 0.0 AS jaccard
FROM d a JOIN d b ON a.doc_id < b.doc_id
-- filter on the ROUNDED jaccard, matching ngram_jaccard's 4dp output
WHERE ROUND(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
            / (len(a.sh) + len(b.sh)
               - len(list_filter(a.sh, s -> list_contains(b.sh, s))))
            - 0.000000001, 4) + 0.0 >= 0.3
ORDER BY id_a, id_b
"""


# --- similarity search ------------------------------------------------------

def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup dedup pipeline: MinHash-LSH candidates → exact
    Jaccard verification → connected components → surviving corpus size
    per cluster decision.  Oracle: DuckDB recomputes the components with
    a recursive min-label-reachability CTE over the exact-Jaccard edge
    relation (valid for the same recall-1.0 reason as
    MINHASH_NEAR_DUP_SQL); cluster correctness additionally pinned in
    tests with planted duplicate groups."""
    docs = load_table(spark, sf_dir, "documents")
    # unordered pair body: the component labelling shuffles by node id,
    # so the public form's output sort would be pure overhead here
    verified = _minhash_near_dup(docs, ordered=False)
    comps = D.connected_components(verified, "id_a", "id_b")
    kept = D.dedup_keep_canonical(docs, comps)
    return (
        comps.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .crossJoin(kept.agg(F.count(F.lit(1)).alias("surviving_docs")))
        .orderBy("component")
    )


NEAR_DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE d AS (
  SELECT doc_id, {_DUCK_SHINGLES} AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) x
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE ROUND(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
              / (len(a.sh) + len(b.sh)
                 - len(list_filter(a.sh, s -> list_contains(b.sh, s))))
              - 0.000000001, 4) + 0.0 >= 0.3
), sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b AS src, id_a AS dst FROM pairs
), reach(node, label) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.node
  WHERE r.label < s.dst
), comp AS (
  SELECT node, MIN(label) AS component FROM reach GROUP BY node
)
SELECT component,
       COUNT(*) AS cluster_size,
       (SELECT COUNT(*) FROM documents)
         - (SELECT COUNT(*) FROM comp WHERE node <> component) AS surviving_docs
FROM comp
GROUP BY component
ORDER BY component
"""


# Planted near-dup probes: the committed embedding fixtures have no pair
# above cosine 0.61 at any sf, which would make the >= 0.8 oracle check
# vacuously green (empty == empty) and never exercise the LSH banding.
# Both near-dup queries therefore augment the corpus with deterministic
# perturbed copies of the first 6 vectors — coordinate j scaled by a
# multiplier from a fixed 7-cycle — landing pairs at cosine ~0.96 (set A)
# and ~0.98 (set B), the near-identical regime the LSH contract targets.
# The SAME rule is written into the DuckDB oracle, so oracle agreement now
# proves the banding recovers every planted pair.  Multipliers are literal
# doubles (no arithmetic) so both engines evaluate bit-identically.
_PLANT_SETS: tuple[tuple[int, tuple[float, ...]], ...] = (
    (1_000_000, (0.55, 0.7, 0.85, 1.0, 1.15, 1.3, 1.45)),  # ~0.96 cosine
    (2_000_000, (0.7, 0.8, 0.9, 1.0, 1.1, 1.2, 1.3)),      # ~0.98 cosine
    # BOUNDARY-BAND probes (~0.89 vs base): inside 0.80–0.95, where
    # 32x16 banding's miss rate is highest (~8% expected per pair at
    # this threshold) — recovery is a deterministic fact of the
    # committed seed, and it is NOT automatic: 7 of 8 candidate
    # multiplier cycles tried missed at least one >=0.8 pair (C-vs-base
    # or C-vs-other-plant) at some sf in the round-6 search, so
    # agreement here genuinely certifies banding recall in the regime
    # that matters rather than only the near-identical one.  Verified
    # green over the FULL augmented relation at sf0.001/0.01/0.1.
    (3_000_000, (0.5, 0.25, 0.75, 1.5, 1.75, 1.25, 1.0)),  # ~0.89 cosine
)
_PLANT_BASES = 6


def _augmented_embeddings(emb: DataFrame) -> DataFrame:
    """Corpus + planted near-dup probes, embeddings as double arrays."""
    v = emb.select("vec_id", S.as_double_array("embedding").alias("embedding"))
    out = v
    def _perturb(mults: tuple[float, ...]):
        marr = F.array(*[F.lit(m).cast("double") for m in mults])
        return lambda x, i: x * F.element_at(marr, (i % 7) + 1)

    for offset, mults in _PLANT_SETS:
        out = out.unionAll(
            v.filter(F.col("vec_id") < _PLANT_BASES).select(
                (F.col("vec_id") + F.lit(offset)).alias("vec_id"),
                F.transform("embedding", _perturb(mults)).alias("embedding"),
            )
        )
    return out


def _plant_sql_values(mults: tuple[float, ...]) -> str:
    return "[" + ", ".join(f"CAST({m} AS DOUBLE)" for m in mults) + "]"


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs above 0.8 — the SCALE path, and
    an EXPLICITLY APPROXIMATE contract: banded hyperplane LSH (32 bands
    x 16 bits, seeded planes) generates candidate pairs via an equi-join
    on (band, signature) — never an all-pairs join — then exact cosine
    verifies candidates only, same two-stage posture as the MinHash
    near-dup path.

    Band shape is chosen for candidate SPARSITY first: a random
    orthogonal pair matches a 16-bit band with probability 0.5^16, so
    only ~32·1.5e-5 ~ 0.05% of unrelated pairs ever reach the verify
    join (the earlier 16x4-bit shape admitted 64% of ALL pairs — a
    hidden quadratic).  Recall is ~1 in the near-identical regime real
    duplicates occupy (miss at cosine 0.95 ~ 0.2%, at 0.9999 ~ 1e-37)
    and explicitly degrades toward the 0.8 boundary (miss ~ 50% at
    exactly 0.8) — boundary audits use the exact baseline
    ``embedding_near_dup_pairs_exact``.  Pinned two ways in
    tests/test_llm_functions.py: (a) LSH output == the exact brute-force
    baseline on the committed corpus at the committed seed, and
    (b) planted near-identical pairs are always recovered.  The DuckDB
    oracle is the exact all-pairs scan over the SAME planted-probe
    augmented corpus (see ``_PLANT_SETS``), so an oracle mismatch at a
    new scale factor means recall dropped there — a visible signal, not
    silent under-reporting."""
    import random

    emb = _augmented_embeddings(load_table(spark, sf_dir, "embeddings"))
    rng = random.Random(7)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(64)] for _ in range(512)]
    # Arrow-vectorized signatures: the 512-plane x 64-dim sign-bit
    # matrix is one BLAS matmul per batch instead of 512 interpreted
    # 64-element folds against a 32k-literal expression tree per row
    # (the 64-plane JVM form already measured 23 s on the sf0.1 corpus).
    cands = S.lsh_candidate_pairs_arrow(emb, planes, bands=32)
    v = emb.select("vec_id", F.col("embedding").alias("v"))
    return (
        cands.join(
            v.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va")), "id_a"
        )
        .join(v.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .select(
            "id_a",
            "id_b",
            # same pushdown barrier as minhash_near_dup: the 64-dim
            # cosine fold must not run inside the join residual
            stop_predicate_pushdown(
                S.cosine(F.col("va"), F.col("vb"))
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= 0.8)
        .orderBy("id_a", "id_b")
    )


def embedding_near_dup_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force near-dup baseline: all-pairs cosine over the
    embedding table, keep pairs >= 0.8.

    DELIBERATELY quadratic in comparisons — this is the exact
    reference/audit path for bounded or sampled corpora
    (recall-measurement samples, eval sets), mirroring how brute-force
    top-k is the baseline for ANN.  At corpus scale use
    ``embedding_near_dup_pairs`` (LSH-banded), whose recall is pinned
    against this baseline in tests.  Executed as blocked dense Gram
    products (``functions/similarity.py::all_pairs_cosine_pairs``) with
    a bounded-by-contract gather of the corpus matrix — the earlier
    non-equi self-join evaluated three interpreted 64-element folds per
    pair and measured 180 s on the sf0.1 corpus at the same result.

    Runs over the same planted-probe augmented corpus as the LSH path so
    its oracle check is non-vacuous (the raw fixtures have no pair above
    cosine 0.61)."""
    emb = _augmented_embeddings(load_table(spark, sf_dir, "embeddings"))
    return S.all_pairs_cosine_pairs(emb, 0.8).orderBy("id_a", "id_b")


# The augmented-corpus CTE is generated from _PLANT_SETS so the Spark
# plant rule and the oracle's can never drift.
_AUG_SQL = "\n  UNION ALL\n".join(
    ["  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"]
    + [
        f"""  SELECT vec_id + {offset},
         list_transform(generate_series(1, len(CAST(embedding AS DOUBLE[]))),
           i -> CAST(embedding AS DOUBLE[])[i]
                * ({_plant_sql_values(mults)})[((i - 1) % 7) + 1])
  FROM embeddings WHERE vec_id < {_PLANT_BASES}"""
        for offset, mults in _PLANT_SETS
    ]
)

EMBEDDING_NEAR_DUP_SQL = f"""
WITH aug AS (
{_AUG_SQL}
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine_sim
FROM aug a JOIN aug b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.8
ORDER BY id_a, id_b
"""


def cdc_chunk_bounds(w: F.Column) -> F.Column:
    """Content-defined chunk boundaries over a token array: position i
    (1-based, i >= 2) is a cut iff the xxhash64 of the 3-token window at
    i has its low 4 bits zero (expected chunk length ~16 windows,
    independent of document alignment — the rsync/CDC rolling-cut
    rule).  Returns the bounds array [1, cuts..., n+1].

    Cost shape: ONE xxhash64 per token plus two 8-byte hash combines
    per window — all long-typed, no hex strings.  The previous rule
    (md5 of the window STRING, test the first hex nibble) built a
    3-token string and a 32-char hex digest per window; at 16× corpus
    the boundary stage dominated cdc_chunk_overlap's 8.4× growth.
    xxhash64 is not reproducible in DuckDB, so the oracle pins these
    bounds as literals (tools/gen_cdc_oracle.py — the simhash/PQ
    pinning discipline) and independently recomputes everything
    downstream: chunk content fingerprints from the pinned bounds plus
    the raw text, the overlap join, and the counts."""
    n = F.size(w)
    m = n - 2  # 3-token window count
    # Per-token hashes ONCE, then shifted-slice zips — never slice(w, i, 3)
    # inside a per-position lambda: an array expression referenced inside
    # a lambda re-evaluates per ELEMENT (measured 15 s -> 2 s at sf0.1;
    # same pitfall functions/text.py::shingles documents).
    wh = F.transform(w, lambda t: F.xxhash64(t))
    acc = F.zip_with(F.slice(wh, 1, m), F.slice(wh, 2, m), lambda x, y: F.xxhash64(x, y))
    acc = F.zip_with(acc, F.slice(wh, 3, m), lambda x, y: F.xxhash64(x, y))
    marked = F.zip_with(
        acc,
        F.sequence(F.lit(1), m),
        lambda h, i: F.when((i >= 2) & (h.bitwiseAND(F.lit(15)) == 0), i),
    )
    cuts = F.when(
        m >= 2, F.filter(marked, lambda x: x.isNotNull())
    ).otherwise(F.array().cast("array<int>"))
    return F.concat(F.array(F.lit(1)), cuts, F.array(n + 1))


def cdc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking overlap — document fingerprinting via a
    rolling hash: chunk boundaries fall where the 3-token window hash
    has its low nibble zero (see ``cdc_chunk_bounds``; expected chunk
    length ~16 windows, independent of document alignment), each chunk
    gets a fingerprint, and documents sharing chunks are reported with
    their shared-chunk count.  Catches PARTIAL overlap (shared
    paragraphs, prepended boilerplate) that whole-document fingerprints
    miss — the storage-dedup / crawl-overlap trick at pipeline scale.

    Scale shape: chunking is map-only; pair generation groups by chunk
    fingerprint (volume tracks true overlap, never all-pairs).  The
    boundary rule is all-integer xxhash64 (no per-window strings); the
    DuckDB oracle pins the resulting bounds as literals and recomputes
    the chunk fingerprints + overlap relation independently."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    bounds = cdc_chunk_bounds(w)
    # Chunk *content* fingerprint: xxhash64 — only ever an equality key,
    # and an 8-byte long shuffles ~4x narrower than an md5 hex string.
    # The oracle joins on its own content md5 over the same pinned
    # bounds; equality-iff-content-equal makes the counts agree.
    # r12 allocation-lean form (docs/SCALING.md): tokens are hashed ONCE
    # into a long array and each chunk fingerprint is a fold of
    # xxhash64(acc, token_hash) over its slice — no chunk-length string
    # is ever materialized (the previous form concat_ws'd every chunk's
    # tokens back into a string before hashing it).
    hashed = docs.select(
        "doc_id",
        F.transform(w, lambda t: F.xxhash64(t)).alias("th"),
        bounds.alias("bounds"),
    )
    fps = F.zip_with(
        F.slice("bounds", F.lit(1), F.size("bounds") - 1),
        F.slice("bounds", F.lit(2), F.size("bounds") - 1),
        lambda s, e: F.aggregate(
            F.slice(F.col("th"), s, e - s),
            F.lit(42).cast("bigint"),
            lambda a, x: F.xxhash64(a, x),
        ),
    )
    chunks = hashed.select("doc_id", F.explode(fps).alias("chunk_fp"))
    # Materialize the chunking fold ONCE behind a shuffle on the join key
    # and reuse the exchange on both self-join sides (same shape as the
    # minhash/simhash band joins) — otherwise the rolling boundary hash,
    # the dominant cost, evaluates on both sides.
    chunks = chunks.repartition(F.col("chunk_fp"))
    a, b = chunks.alias("a"), chunks.alias("b").hint("shuffle_hash")
    return (
        a.join(
            b,
            (F.col("a.chunk_fp") == F.col("b.chunk_fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
        .orderBy("id_a", "id_b")
    )


# CDC_CHUNK_OVERLAP_SQL is generated (tools/gen_cdc_oracle.py) and
# imported at the top of this module: xxhash64 boundary cuts are not
# reproducible in DuckDB, so the per-document bounds are pinned and
# everything downstream (chunk content fingerprints, the overlap join,
# the counts) is recomputed independently from the text.


def embedding_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors of vec_id=0 (brute-force baseline).

    The plan is a broadcast of the single query vector + a map-side score
    + TakeOrderedAndProject — no shuffle of the corpus at any scale.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    topk = S.brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=10)
    return topk.select("vec_id", "label", "cosine_sim").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id")
    )


EMBEDDING_TOPK_SQL = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label,
       ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6)
           AS cosine_sim
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY cosine_sim DESC, vec_id ASC
LIMIT 10
"""


def embedding_multi_query_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 neighbors for each of 5 query vectors in one pass —
    the batched ANN serving shape (broadcast queries × partitioned corpus)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2, 3, 4))
    topk = S.brute_force_topk(emb, queries, k=3)
    return topk.select("q_vec_id", "vec_id", "cosine_sim", "rank").orderBy(
        "q_vec_id", "rank"
    )


EMBEDDING_MULTI_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS q_vec_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
), scored AS (
  SELECT q.q_vec_id, e.vec_id,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
             AS cosine_sim
  FROM embeddings e, q
  WHERE e.vec_id <> q.q_vec_id
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY q_vec_id ORDER BY cosine_sim DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT q_vec_id, vec_id, cosine_sim, rank FROM ranked
WHERE rank <= 3 ORDER BY q_vec_id, rank
"""


def embedding_dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-truncation audit: recall@10 of cosine
    search over the FIRST d coordinates (d = 8, 16, 32) against the
    full-dim exact top-10, per query — the measurement behind
    truncatable-embedding serving (MRL, Kusupati et al. 2022): how much
    ANN quality survives storing/scanning a prefix at 1/8th–1/2 the
    bytes.  At 100 TB the prefix column IS the serving index; this
    audit is what justifies (or vetoes) the truncation level.

    Scale shape: each arm is the whitelisted bounded-query serving
    contract (broadcast query batch, map-side scoring over the corpus
    scan, two-phase rank); the recall join and scaffold run on
    |dims| x |queries| x 10 rows.  Oracle: DuckDB recomputes both the
    full-dim and every truncated ranking with list_slice + the same
    round-6-digit + id tie-break."""
    import functools

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2, 3, 4))
    full = S.brute_force_topk(emb, queries, k=10).select("q_vec_id", "vec_id")
    arms = []
    for d in (8, 16, 32):
        trunc = emb.select(
            "vec_id",
            F.slice(S.as_double_array("embedding"), 1, d).alias("embedding"),
        )
        tq = queries.select(
            "vec_id",
            F.slice(S.as_double_array("embedding"), 1, d).alias("embedding"),
        )
        arms.append(
            S.brute_force_topk(trunc, tq, k=10).select(
                F.lit(d).cast("int").alias("dim"), "q_vec_id", "vec_id"
            )
        )
    tr = functools.reduce(lambda a, b: a.unionByName(b), arms)
    hits = (
        tr.join(full, ["q_vec_id", "vec_id"])
        .groupBy("dim", "q_vec_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    dims = spark.createDataFrame([(8,), (16,), (32,)], "dim int")
    scaffold = dims.crossJoin(
        queries.select(F.col("vec_id").alias("q_vec_id"))
    )
    return (
        scaffold.join(hits, ["dim", "q_vec_id"], "left")
        .select(
            "dim",
            "q_vec_id",
            F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("hits"),
            F.round(
                F.coalesce(F.col("hits"), F.lit(0)) / 10.0, 2
            ).alias("recall_at_10"),
        )
        .orderBy("dim", "q_vec_id")
    )


DIM_TRUNCATION_SQL = """
WITH q AS (
  SELECT vec_id AS q_vec_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
), full_scored AS (
  SELECT q.q_vec_id, e.vec_id,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
             AS s
  FROM embeddings e, q WHERE e.vec_id <> q.q_vec_id
), full_rank AS (
  SELECT q_vec_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY q_vec_id ORDER BY s DESC, vec_id ASC) AS r
    FROM full_scored) WHERE r <= 10
), dims(d) AS (VALUES (8), (16), (32)),
tr_scored AS (
  SELECT d, q.q_vec_id, e.vec_id,
         ROUND(list_cosine_similarity(
             list_slice(CAST(e.embedding AS DOUBLE[]), 1, d),
             list_slice(q.qv, 1, d)), 6) AS s
  FROM embeddings e, q, dims WHERE e.vec_id <> q.q_vec_id
), tr_rank AS (
  SELECT d, q_vec_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY d, q_vec_id ORDER BY s DESC, vec_id ASC) AS r
    FROM tr_scored) WHERE r <= 10
), hits AS (
  SELECT d, t.q_vec_id, COUNT(*) AS h
  FROM tr_rank t JOIN full_rank f
    ON t.q_vec_id = f.q_vec_id AND t.vec_id = f.vec_id
  GROUP BY 1, 2
), scaffold AS (
  SELECT d, q_vec_id FROM dims CROSS JOIN (SELECT q_vec_id FROM q)
)
SELECT CAST(d AS INTEGER) AS dim, q_vec_id,
       CAST(COALESCE(h, 0) AS BIGINT) AS hits,
       ROUND(COALESCE(h, 0) / 10.0, 2) AS recall_at_10
FROM scaffold LEFT JOIN hits USING (d, q_vec_id)
ORDER BY dim, q_vec_id
"""


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive / retrieval training: for
    each query vector, the top-5 most-similar vectors with a DIFFERENT
    label — the near-miss examples that make an embedding model learn
    boundaries (random negatives are too easy; same-label neighbors are
    positives).  The standard mining pass behind DPR/Contriever-style
    training data.

    Scale shape: same serving contract as `embedding_multi_query_topk`
    — the bounded query batch broadcasts, scoring is map-side over the
    corpus scan, and ranking is two-phase (partition-local top-k, then
    a partitions x k merge) so the scored relation is never
    hash-partitioned on the bare query id.  The label-differs predicate
    lands pre-rank, map-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    k = 5
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("label").alias("q_label"),
        S.as_double_array("embedding").alias("_qvec"),
    )
    c = emb.select(
        "vec_id", "label", S.as_double_array("embedding").alias("_cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("q_label"))
        .withColumn("cosine_sim", S.cosine(F.col("_cvec"), F.col("_qvec")))
        .withColumn("_scan_part", F.spark_partition_id())
    )
    w_local = Window.partitionBy("_scan_part", "q_vec_id").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id")
    )
    surv = scored.withColumn("_lr", F.row_number().over(w_local)).filter(
        F.col("_lr") <= k
    )
    w = Window.partitionBy("q_vec_id").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id")
    )
    return (
        surv.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_vec_id", "q_label", "rank", "vec_id", "label",
                "cosine_sim")
        .orderBy("q_vec_id", "rank")
    )


HARD_NEGATIVE_SQL = """
WITH q AS (
  SELECT vec_id AS q_vec_id, label AS q_label,
         CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT q.q_vec_id, q.q_label, e.vec_id, e.label,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv),
               6) AS cosine_sim
  FROM embeddings e, q
  WHERE e.label <> q.q_label
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY q_vec_id ORDER BY cosine_sim DESC, vec_id ASC)
    AS INTEGER) AS rank
  FROM scored
)
SELECT q_vec_id, q_label, rank, vec_id, label, cosine_sim FROM ranked
WHERE rank <= 5 ORDER BY q_vec_id, rank
"""


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = S.as_double_array("embedding")
    return (
        emb.select("label", S.norm(v).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("vec_count"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
            F.round(F.min("nrm"), 4).alias("min_norm"),
            F.round(F.max("nrm"), 4).alias("max_norm"),
        )
        .orderBy("label")
    )


EMBEDDING_NORM_SQL = """
SELECT label,
       COUNT(*) AS vec_count,
       ROUND(AVG(nrm), 4) AS avg_norm,
       ROUND(MIN(nrm), 4) AS min_norm,
       ROUND(MAX(nrm), 4) AS max_norm
FROM (
  SELECT label,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))
             AS nrm
  FROM embeddings
) n
GROUP BY label ORDER BY label
"""


def embedding_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-conditioned embedding outlier audit: each vector's Euclidean
    distance to its OWN label's centroid, z-scored against that label's
    distance distribution — the top-20 are the mislabeled / poisoned /
    out-of-distribution candidates a curation pipeline routes to review
    before the label column is trusted for supervised mixing or hard
    negatives.  Complements ``embedding_norm_stats`` (global geometry)
    and ``semantic_dedup_stats`` (cluster-scoped duplication): this is
    the per-LABEL cohesion audit.

    Scale shape: ONE posexplode shuffle keyed (label, dim) whose output
    is labels x 64 rows at any corpus size (partial map-side averages);
    centroid arrays re-assembled and BROADCAST back; distance is
    map-side zip_with arithmetic; the z-score pass is one bounded
    per-label aggregate over narrow (label, dist) rows; top-20 is
    TakeOrderedAndProject.  No stage ever shuffles raw vectors twice.

    Cross-engine determinism: centroids are rounded to 6 dp BEFORE the
    distance pass (per-dim averages are the one sum whose order differs
    between engines); the distance sum itself runs in INDEX order in
    both engines (zip_with fold / list_sum over list_transform), and
    dist / mean / sd are re-rounded at each boundary.  The 64-dim width
    is pinned in the oracle like the LSH plane literals."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = S.as_double_array("embedding")
    dims = emb.select(F.col("label"), F.posexplode(v)).toDF(
        "label", "dim", "x"
    )
    cent = dims.groupBy("label", "dim").agg(
        round_stable(F.avg("x"), 6).alias("c")
    )
    carr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))),
            lambda s: s["c"],
        ).alias("carr")
    )
    d = emb.join(F.broadcast(carr), "label").select(
        "vec_id",
        "label",
        round_stable(
            F.sqrt(
                F.aggregate(
                    F.zip_with(v, F.col("carr"), lambda x, c: (x - c) * (x - c)),
                    F.lit(0.0),
                    lambda acc, y: acc + y,
                )
            ),
            6,
        ).alias("dist"),
    )
    stats = d.groupBy("label").agg(
        round_stable(F.avg("dist"), 6).alias("mean_dist"),
        round_stable(F.stddev_samp("dist"), 6).alias("sd_dist"),
    )
    return (
        d.join(F.broadcast(stats), "label")
        .selectExpr(
            "vec_id",
            "label",
            "dist",
            "mean_dist AS label_mean_dist",
            "ROUND(CASE WHEN sd_dist > 0"
            " THEN (dist - mean_dist) / sd_dist"
            " ELSE CAST(0.0 AS DOUBLE) END - 0.000000001, 4) + 0.0 AS z",
        )
        .orderBy(F.desc("z"), "vec_id")
        .limit(20)
    )


EMBEDDING_LABEL_OUTLIERS_SQL = """
WITH e AS (
  SELECT vec_id, label,
         unnest(CAST(embedding AS DOUBLE[])) AS x,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
), cent AS (
  SELECT label, dim, ROUND(AVG(x) - 0.000000001, 6) + 0.0 AS c
  FROM e GROUP BY label, dim
), carr AS (
  SELECT label, list(c ORDER BY dim) AS carr FROM cent GROUP BY label
), d AS (
  SELECT emb.vec_id, emb.label,
         ROUND(sqrt(list_sum(list_transform(generate_series(1, 64),
               j -> (CAST(emb.embedding[j] AS DOUBLE) - carr.carr[j])
                    * (CAST(emb.embedding[j] AS DOUBLE) - carr.carr[j]))))
               - 0.000000001, 6) + 0.0 AS dist
  FROM embeddings emb JOIN carr ON emb.label = carr.label
), stats AS (
  SELECT label, ROUND(AVG(dist) - 0.000000001, 6) + 0.0 AS mean_dist,
         ROUND(stddev_samp(dist) - 0.000000001, 6) + 0.0 AS sd_dist
  FROM d GROUP BY label
)
SELECT d.vec_id, d.label, d.dist, stats.mean_dist AS label_mean_dist,
       ROUND(CASE WHEN sd_dist > 0 THEN (dist - mean_dist) / sd_dist
             ELSE CAST(0.0 AS DOUBLE) END - 0.000000001, 4) + 0.0 AS z
FROM d JOIN stats ON d.label = stats.label
ORDER BY z DESC, vec_id LIMIT 20
"""


def _lsh_ann_planes() -> list[list[float]]:
    """The 6 seeded hyperplanes shared by the Spark query and its DuckDB
    oracle (inlined as literals on both sides, so bucketing is the same
    deterministic double arithmetic in both engines)."""
    import random

    rng = random.Random(42)
    return [[rng.gauss(0.0, 1.0) for _ in range(64)] for _ in range(6)]


def embedding_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH buckets (the 100 TB scale path):
    bucket on 6 sign bits, then exact top-1 neighbor within bucket via
    the per-bucket dense Gram kernel (one Arrow task per bucket — the
    all-pairs relation is never shuffled).  Deterministic (planes from a
    fixed seed, inlined as literals), so the oracle is the same bucketed
    top-1 computed by DuckDB from the identical plane literals; recall
    vs brute force pinned in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = S.hyperplane_lsh_buckets(emb, _lsh_ann_planes())
    return (
        S.bucket_top1_neighbors(bucketed)
        .select("vec_id", "neighbor_id", "cosine_sim")
        .orderBy("vec_id")
    )


def _embedding_lsh_sql() -> str:
    """Oracle for ``embedding_lsh_ann``: DuckDB recomputes the identical
    sign-bit buckets from the same inlined plane literals, then takes the
    exact top-1 neighbor within each bucket with the same
    (cosine desc, neighbor_id asc) tiebreak."""
    bits = "\n         || ".join(
        "(CASE WHEN list_dot_product(v, ["
        + ", ".join(repr(x) for x in p)
        + "]) >= 0 THEN '1' ELSE '0' END)"
        for p in _lsh_ann_planes()
    )
    return f"""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {bits} AS bucket
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS vec_id, c.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(a.v, c.v), 6) AS cosine_sim
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM pairs
)
SELECT vec_id, neighbor_id, cosine_sim FROM ranked WHERE rn = 1 ORDER BY vec_id
"""


EMBEDDING_LSH_SQL = _embedding_lsh_sql()


def embedding_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: seeded-KMeans inverted lists, nprobe=3 probes per query —
    the trained-index scale path next to the LSH one.  Oracle: the
    trained artifacts (centroids + assignment) are pinned as literals
    (tools/gen_ivf_oracle.py) and DuckDB independently recomputes probe
    selection, list-scoped scoring, and ranking; recall vs brute force
    additionally pinned in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centers = S.ivf_build(emb, k=8, seed=42, cache_key=sf_dir)
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
    return S.ivf_topk(assigned, centers, queries, k=5, nprobe=3).orderBy(
        "q_vec_id", "rank"
    )


def embedding_ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN EVALUATION: recall@10 of the IVF index against exact brute
    force across the nprobe sweep (1, 2, 4) — the accuracy-vs-cost curve
    an ANN deployment is tuned on (each nprobe step scans ~nprobe/k_lists
    of the corpus; recall is what that buys).  Turns the test-only recall
    pin into a first-class oracle-gated audit.

    Scale shape: brute force is the one-off evaluation baseline (bounded
    query batch, map-side scoring, two-phase rank — the whitelisted
    serving shape); each IVF arm is the production probe-pruned path;
    the overlap count and recall arithmetic run on 3 x |queries| x 10
    rows.  Oracle: trained centroids + assignments pinned
    (tools/gen_recall_oracle.py), both the brute-force AND the IVF side
    recomputed independently by DuckDB at every nprobe."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centers = S.ivf_build(emb, k=8, seed=42, cache_key=sf_dir)
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2, 3, 4))
    bf = S.brute_force_topk(emb, queries, k=10).select("q_vec_id", "vec_id")
    parts = [
        S.ivf_topk(assigned, centers, queries, k=10, nprobe=n).select(
            F.lit(n).cast("int").alias("nprobe"), "q_vec_id", "vec_id"
        )
        for n in (1, 2, 4)
    ]
    ivf = parts[0].unionByName(parts[1]).unionByName(parts[2])
    hits = (
        ivf.join(bf, ["q_vec_id", "vec_id"])
        .groupBy("nprobe", "q_vec_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    scaffold = queries.select(
        F.col("vec_id").alias("q_vec_id"),
        F.explode(
            F.array(*[F.lit(n).cast("int") for n in (1, 2, 4)])
        ).alias("nprobe"),
    )
    return (
        scaffold.join(hits, ["nprobe", "q_vec_id"], "left")
        .selectExpr(
            "nprobe",
            "q_vec_id",
            "CAST(COALESCE(hits, 0) AS BIGINT) AS hits",
            "ROUND(CAST(COALESCE(hits, 0) AS DOUBLE) / 10.0"
            " - 0.000000001, 4) + 0.0 AS recall_at_10",
        )
        .orderBy("nprobe", "q_vec_id")
    )


def embedding_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011, IEEE TPAMI): 4
    subspace codebooks of 16 seeded-KMeans centroids compress each
    64-dim vector to 4 one-byte codes; serving is ADC — per-query
    partial-dot tables against the codebooks (a 192-row broadcast) and
    an m-lookup sum per corpus vector, never the raw vectors.  This is
    the memory-bound scale path that IVF composes with (IVF-PQ): at
    100 TB the codes table is ~1/128 the corpus bytes.

    Oracle: the trained codebooks + per-vector codes are pinned as
    literals (tools/gen_pq_oracle.py) and DuckDB independently
    recomputes the ADC tables (list_dot_product of query subvectors
    against every codebook entry), the score sum, and the ranking."""
    emb = load_table(spark, sf_dir, "embeddings")
    coded, codebooks, sub = S.pq_build(
        emb, m=4, k=16, seed=42, cache_key=sf_dir, persist_codes=True
    )
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
    return S.pq_topk(coded, codebooks, sub, queries, k=5).orderBy(
        "q_vec_id", "rank"
    )


def embedding_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN — the production composition (FAISS's default shape):
    IVF probe pruning restricts each query to nprobe=3 of 8 inverted
    lists, PQ ADC scores the survivors from their 4x16 codes alone.
    Per query: (corpus/8)*3 code lookups; neither raw vectors nor
    unprobed lists are touched at serving time.

    Oracle: BOTH trained artifacts (IVF centroids + assignment, PQ
    codebooks + codes) pinned as literals (tools/gen_ivfpq_oracle.py);
    DuckDB independently recomputes probe selection, candidate
    generation, ADC scoring, and ranking."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centers = S.ivf_build(emb, k=8, seed=42, cache_key=sf_dir)
    coded, codebooks, sub = S.pq_build(
        assigned, m=4, k=16, seed=42, cache_key=sf_dir, persist_codes=True
    )
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
    return S.ivfpq_topk(
        coded, centers, codebooks, sub, queries, k=5, nprobe=3
    ).orderBy("q_vec_id", "rank")


def semantic_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup report: KMeans clusters the corpus
    embeddings (same seeded k=8 index as embedding_ivf_ann), then within
    each cluster pairs at cosine >= 0.35 are semantic duplicates and the
    member farther from its centroid is dropped.  Emits per-cluster
    vector/drop/keep counts — the dataset-curation summary a training-mix
    owner acts on.

    Scale posture: the pair join is cluster-scoped (Σ n_c², never global
    n²); only the #clusters-row centroid table broadcasts.  Oracle: the
    trained artifacts (centroids + assignment) are pinned as literals
    (tools/gen_semdedup_oracle.py) and DuckDB independently recomputes
    pair generation, the keep/drop rule, and the per-cluster rollup."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centers = S.ivf_build(emb, k=8, seed=42, cache_key=sf_dir)
    victims = D.semantic_dedup_victims(assigned, centers, threshold=0.35)
    sizes = assigned.groupBy(
        F.col("ivf_centroid").alias("cluster_id")
    ).agg(F.count(F.lit(1)).alias("n_vectors"))
    drops = victims.groupBy(
        F.col("ivf_centroid").alias("cluster_id")
    ).agg(F.count(F.lit(1)).alias("n_dropped"))
    return (
        sizes.join(drops, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_vectors",
            F.coalesce(F.col("n_dropped"), F.lit(0).cast("long")).alias("n_dropped"),
            (
                F.col("n_vectors")
                - F.coalesce(F.col("n_dropped"), F.lit(0).cast("long"))
            ).alias("n_kept"),
        )
        .orderBy("cluster_id")
    )


def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: 128-bit fingerprints, banded into
    4×32-bit chunks (pigeonhole: any pair within hamming distance 3
    agrees on ≥1 whole chunk), chunk-equality join, exact hamming verify
    via bit_count(xor) over both halves.

    At corpus scale this is the cheapest near-dup modality: one 16-byte
    fingerprint per document, candidate generation bounded by chunk
    collisions.  The 128-bit width is the scale fix for the r8 finding:
    the previous 64-bit/4×16-band form saturated its 65,536-bucket band
    space by ~320k documents (64× spotcheck ratio 8–9, random
    within-band collisions growing n²/2^16); at the SAME certified
    distance (d≤3 needs only d+1=4 bands) each band now keys into 2^32
    buckets, keeping collision density flat through ~10^9 docs.  Band
    width is an explicit knob (functions/dedup.py
    ``simhash128_band_structs``).  Oracle: the deterministic
    per-document fingerprints are pinned as literals
    (tools/gen_simhash_oracle.py — the plane-literal pattern) and DuckDB
    independently recomputes the pair relation as an exact all-pairs
    bit_count(xor) <= 3 scan over both halves, which also checks the
    banding's pigeonhole completeness; planted-pair behavior pinned in
    tests.

    Fingerprinting uses the relational fold (``simhash128_rel`` —
    codegen'd per-bit sums, bit-identical to the ``simhash128`` Column
    form the oracle generator pins): the fold is the dominant cost and
    the Column form's interpreted 128-slot HOF fold measured 3x slower —
    and, being a plain projection, was additionally re-evaluated at the
    scan by the band join's pushed null-key filter."""
    return _simhash_near_dup(load_table(spark, sf_dir, "documents"))


def _simhash_near_dup(docs: DataFrame, ordered: bool = True) -> DataFrame:
    """Body of ``simhash_near_dup`` over an arbitrary documents relation
    (banding and the hamming verify are per-pair — see
    ``_minhash_near_dup``; ``ordered=False`` as there)."""
    d = D.simhash128_rel(docs, "text", "doc_id")
    chunks = d.select(
        "doc_id",
        "fp",
        F.explode(D.simhash128_band_structs(F.col("fp"), band_bits=32)).alias("b"),
    ).select("doc_id", "fp", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    # Materialize the fingerprint computation ONCE behind a shuffle on the
    # join key: without this the 64-slot vote fold evaluates on BOTH join
    # sides and again inside each side's null-filter pushed to the scan —
    # four full fingerprint passes (measured ~7.5 s -> ~3 s at sf0.1).
    # With the exchange boundary + shuffle_hash the build side is a
    # ReusedExchange of the same shuffle (same shape as
    # near_dup_shingle_pairs).
    chunks = chunks.repartition(F.col("band"), F.col("key"))
    a, b = chunks.alias("a"), chunks.alias("b").hint("shuffle_hash")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            D.hamming128(F.col("a.fp"), F.col("b.fp")).alias("hamming"),
        )
        .distinct()
    )
    out = cands.filter(F.col("hamming") <= 3)
    return out.orderBy("doc_a", "doc_b") if ordered else out


def simhash_hamming_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-threshold calibration for the simhash dedup family: per
    hamming distance 0..7, how many candidate pairs exist and their
    EXACT aggregate shingle overlap (integer sums of |A∩B| and |A∪B| —
    no float compare anywhere).  This is the table a pipeline owner
    reads to pick the hamming cutoff: where the overlap mass collapses
    is where fingerprint proximity stops meaning textual duplication.

    Exercises the band-width knob the 128-bit simhash exposes
    (``simhash128_band_structs``): 16-bit bands give 128/16 = 8 bands,
    certifying pigeonhole completeness at hamming <= 8-1 = 7 — double
    the distance of the production query's 4x32 banding, at the cost of
    band-space density (2^16 buckets/band saturates at corpus scale —
    the r8 finding).  That trade is exactly right here: calibration is
    an AUDIT-scale sweep (like ``kmv_source_overlap``'s exact side),
    while the production dedup pass (``simhash_near_dup``) keeps the
    wide bands.  Oracle: fingerprint literals + DuckDB recomputing the
    all-pairs hamming relation and the shingle set ops from documents
    (tools/gen_simhash_oracle.py second constant)."""
    docs = load_table(spark, sf_dir, "documents")
    d = D.simhash128_rel(docs, "text", "doc_id")
    chunks = d.select(
        "doc_id",
        "fp",
        F.explode(
            D.simhash128_band_structs(F.col("fp"), band_bits=16)
        ).alias("b"),
    ).select(
        "doc_id", "fp", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    chunks = chunks.repartition(F.col("band"), F.col("key"))
    a, b = chunks.alias("a"), chunks.alias("b").hint("shuffle_hash")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            D.hamming128(F.col("a.fp"), F.col("b.fp")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 7)
    )
    sh = docs.select("doc_id", T.shingles("text", 3).alias("sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    verified = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "hamming",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            (
                F.size("sh_a") + F.size("sh_b")
                - F.size(F.array_intersect("sh_a", "sh_b"))
            ).alias("un"),
        )
    )
    return (
        verified.groupBy("hamming")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("inter").cast("bigint").alias("shared_shingles"),
            F.sum("un").cast("bigint").alias("union_shingles"),
        )
        .orderBy("hamming")
    )


def minhash_estimate_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator calibration for the MinHash family: per exact-Jaccard
    decile bin, how far the 32-slot signature estimate (matching slots
    / 32) sits from the true shingle Jaccard — mean/max absolute error
    and the estimate's mean, over the 1-row-band candidate relation
    (any matching slot).  This is the table a pipeline owner reads to
    trust the banded dedup family: the binomial error bound predicts
    sigma = sqrt(J(1-J)/32) <= 0.088, and this query MEASURES it on the
    corpus instead of assuming it.  1-row banding is deliberately the
    widest candidate net (the shape ``minhash_near_dup``'s docstring
    rejects for production): calibration needs LOW-similarity pairs in
    the sample, exactly the pairs 2-row bands are built to exclude —
    audit-scale by design, like ``simhash_hamming_calibration``.

    Scale shape: ONE explode+repartition on (slot, value) materializes
    the signature fold once (ReusedExchange build side); the candidate
    join meets only slot-equal documents; per-pair verify is map-side
    array arithmetic; the output is the bounded 10-bin relation.
    Degenerate empty-shingle pairs (union 0 — all-init signatures match
    every slot, the known minhash failure on sub-width docs) are
    excluded by the identical ``u > 0`` guard in both engines.

    Bins floor the EXACT ratio 10·i/u (integer operands: exact at every
    boundary in both engines — a double can hold these integers, and
    integer-result division is exact).  Oracle: per-doc signature
    literals (tools/gen_minhash_calib_oracle.py) + DuckDB recomputing
    the all-pairs slot-match and shingle set ops from documents."""
    return _minhash_estimate_calibration(
        load_table(spark, sf_dir, "documents")
    )


def minhash_estimate_calibration_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The fixed-cost production form of ``minhash_estimate_calibration``:
    the identical calibration (same signature fold, same 1-row-band
    candidate net, same binning/error arithmetic) over a deterministic
    FIXED-SIZE hash-sample of the corpus
    (``sources.tables.sample_documents_fixed_size`` — the hex-prefix
    threshold is DERIVED from the live corpus count via
    ``nibble_for_target`` each run, so the expected sample stays
    ~PIPELINE_SAMPLE_TARGET_DOCS documents no matter how large the
    corpus grows; the md5(doc_id)-prefix predicate evaluates
    identically in BOTH engines and pushes into the scan).  The
    estimator's per-pair error distribution is a population property,
    so a uniform doc sample estimates the same table — and fixed SIZE
    (not fixed fraction) is what makes the quadratic-ish candidate
    stage genuinely fixed-cost at 100 TB (docs/SCALING.md: 2.9x at 64x
    fixed-fraction vs 1.9x fixed-size) while the full form remains the
    run-once value gate.  Sample membership is a pure function of
    doc_id and the corpus count, so the sampled pair relation provably
    equals the full relation restricted to sampled endpoints
    (tests/test_sampled_twins.py pins this at sf0.01).

    Oracle: the same signature-literal recomputation, with the
    threshold derived INSIDE DuckDB from the same corpus count (scalar
    subquery — bit-for-bit the Python integer arithmetic) applied to
    the documents scan; sf0.01-only literal validity, regenerate via
    tools/gen_minhash_calib_oracle.py if the check scale changes."""
    return _minhash_estimate_calibration(
        sample_documents_fixed_size(load_table(spark, sf_dir, "documents"))
    )


def _minhash_estimate_calibration(docs: DataFrame) -> DataFrame:
    d = docs.select("doc_id", T.shingle_hashes("text").alias("sh"))
    # one per-doc relation carrying BOTH the shingle array and the
    # 32-slot signature: the signature is a projection of the shingle
    # fold, so deriving it in place (not via a d-join-sig) lets each
    # downstream consumer evaluate the fold exactly once
    feat = d.withColumn("sig", D.minhash_from_hashes(F.col("sh"), 32))
    sig = feat.select("doc_id", "sig")
    slots = sig.select("doc_id", F.posexplode("sig")).toDF(
        "doc_id", "slot", "v"
    )
    slots = slots.repartition(F.col("slot"), F.col("v"))
    a, b = slots.alias("a"), slots.alias("b").hint("shuffle_hash")
    cands = (
        a.join(
            b,
            (F.col("a.slot") == F.col("b.slot"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .distinct()
    )
    # joined once per pair side (was four joins against two relations,
    # each re-deriving the shingle fold — guide §2.4: two exchanges and
    # one shingle_hashes evaluation per side instead of four/two)
    paired = (
        cands.join(
            feat.selectExpr("doc_id AS id_a", "sh AS sh_a", "sig AS sig_a"),
            "id_a",
        )
        .join(
            feat.selectExpr("doc_id AS id_b", "sh AS sh_b", "sig AS sig_b"),
            "id_b",
        )
    )
    stats = (
        paired.select(
            # barrier: keep the u > 0 filter above the candidate joins so
            # the array_intersect is not re-evaluated as a pushed residual
            stop_predicate_pushdown(
                F.size(F.array_intersect("sh_a", "sh_b"))
            ).alias("i"),
            (F.size("sh_a") + F.size("sh_b")).alias("ss"),
            F.expr(
                "aggregate(zip_with(sig_a, sig_b,"
                " (x, y) -> CAST(x = y AS INT)), 0, (acc, e) -> acc + e)"
            ).alias("m"),
        )
        .selectExpr("i", "ss - i AS u", "m")
        .filter("u > 0")
    )
    binned = stats.selectExpr(
        "CAST(LEAST(9, FLOOR((10.0 * i) / u)) AS INT) AS j_bin",
        "CAST(i AS DOUBLE) / u AS exact_j",
        "CAST(m AS DOUBLE) / 32.0 AS est_j",
    )
    return (
        binned.groupBy("j_bin")
        .agg(
            F.count(F.lit(1)).alias("pair_count"),
            round_stable(F.avg("exact_j"), 4).alias("mean_exact_j"),
            round_stable(F.avg("est_j"), 4).alias("mean_est_j"),
            round_stable(
                F.avg(F.abs(F.col("est_j") - F.col("exact_j"))), 4
            ).alias("mean_abs_err"),
            round_stable(
                F.max(F.abs(F.col("est_j") - F.col("exact_j"))), 4
            ).alias("max_abs_err"),
        )
        .orderBy("j_bin")
    )


def dedup_modality_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality dedup agreement matrix: every pair flagged by ANY
    of the three production near-dup modalities — exact (md5), MinHash
    (2-row-band LSH + Jaccard >= 0.3 verify), SimHash (128-bit, hamming
    <= 3) — bucketed by WHICH modalities flagged it.  This is the table
    that justifies a modality ladder: exact-only rows are trivial
    dups, minhash-only rows are token-level rewrites simhash's global
    fingerprint smooths over, simhash-only rows are its
    hamming-proximity false positives (or sub-shingle-width docs), and
    the all-three diagonal is the planted-duplicate mass every modality
    must agree on.

    Scale shape: three bounded pair relations (md5-keyed equality join
    on 16-byte digests; the banded relations reused verbatim from their
    production queries), a union-distinct to the flagged universe, and
    three broadcast-sized left joins — pair relations at true-duplicate
    density stay linear-ish in corpus size (the r8/r9 64x evidence for
    each modality).  Exact pairs enumerate within-group pairs
    (quadratic per group) — honest for an audit report; the production
    DEDUP path (``dedup_exact_documents``) only ever keys groups.

    Oracle: DuckDB recomputes exact pairs from raw text equality,
    minhash pairs as the exact all-pairs Jaccard >= 0.3 relation (valid
    at banding recall 1.0 — MINHASH_NEAR_DUP_SQL's argument), and
    simhash pairs from the pinned fingerprint literals.  The oracle
    composes the pinned SIMHASH_FPS_VALUES literals, so like the
    simhash/minhash-calibration oracles it inherits sf0.01-only
    validity: regenerate via tools/gen_simhash_oracle.py if the
    driver's check scale ever changes."""
    return _dedup_modality_agreement(load_table(spark, sf_dir, "documents"))


def dedup_modality_agreement_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The fixed-cost scheduled form of ``dedup_modality_agreement``:
    the identical three-modality agreement matrix over the deterministic
    FIXED-SIZE hash-sample (``sources.tables.sample_documents_fixed_size``
    — the threshold is derived from the live corpus count each run via
    ``nibble_for_target``, so the sampled corpus stays
    ~PIPELINE_SAMPLE_TARGET_DOCS documents as the corpus grows; same
    predicate in both engines, pushed into every modality's scan).  All
    three pair relations are per-pair predicates of the two endpoint
    documents (md5 equality; per-doc minhash signature + banding +
    Jaccard verify; per-doc simhash fingerprint + banding + hamming
    verify), so the sampled matrix is EXACTLY the full matrix restricted
    to pairs with both endpoints sampled (pinned by
    tests/test_sampled_twins.py) — a uniform pair sample of each
    agreement cell.  Fixed SIZE means every candidate stage is genuinely
    fixed-cost per scheduled run at any corpus scale; the full form
    remains the value gate.  Oracle: same composition as the full form
    with the in-SQL derived threshold (scalar subquery over the
    documents count — bit-for-bit the Python arithmetic) applied to the
    documents scan and the pinned fingerprint literals (membership is a
    pure function of doc_id and the corpus count); sf0.01-only literal
    validity as the full form."""
    return _dedup_modality_agreement(
        sample_documents_fixed_size(load_table(spark, sf_dir, "documents"))
    )


def _dedup_modality_agreement(docs: DataFrame) -> DataFrame:
    fp = docs.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("f")
    )
    fp = fp.repartition(F.col("f"))
    fa, fb = fp.alias("a"), fp.alias("b").hint("shuffle_hash")
    exact = (
        fa.join(
            fb,
            (F.col("a.f") == F.col("b.f"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .distinct()
    )
    mh = _minhash_near_dup(docs, ordered=False).select("id_a", "id_b")
    sh = _simhash_near_dup(docs, ordered=False).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    # Overlap the three INDEPENDENT modality pipelines as concurrent
    # jobs (guide §2.6): as subtrees of one lazy plan their deep stage
    # ladders execute effectively back-to-back (measured: full head
    # 5.2 s ~= exact 0.5 + minhash 1.9 + simhash 2.1 + combine at
    # sf0.1 — none of the small stages fills the cluster), so three
    # driver threads materialize the pair relations in parallel and
    # the combine below consumes the checkpoints.  Pair relations are
    # output-scale (bounded by near-dup density), not corpus-scale —
    # the r12 nulls on materializing CORPUS-side relations don't
    # apply.  Residency-bounded per tag; the bench/driver consume each
    # query before building the next (the pipeline_health sample's
    # established contract).
    from concurrent.futures import ThreadPoolExecutor

    from ..plans.residency import checkpoint_bounded as _ckb

    with ThreadPoolExecutor(max_workers=3) as pool:
        exact, mh, sh = pool.map(
            lambda rel_tag: _ckb(rel_tag[0], rel_tag[1]),
            [
                (exact, "agreement_exact_pairs"),
                (mh, "agreement_minhash_pairs"),
                (sh, "agreement_simhash_pairs"),
            ],
        )
    # Single-pass membership: tag each (distinct) pair relation with its
    # modality flag, union them, and MAX-aggregate per pair — the flag
    # triple is identical to the old universe-distinct + three LeftOuter
    # joins (a pair is in the universe iff some tagged row exists, and
    # each flag is 1 iff that modality contributed a row), but the plan
    # references each pair relation ONCE and replaces a union-distinct
    # plus three SortMergeJoins with one hash aggregate on (id_a, id_b)
    # (plans/r12/dedup_modality_agreement_before.txt: every modality
    # subtree appeared twice).  Guide §2.4 / §2.3: one exchange, fewer
    # shuffled bytes.
    def _tag(rel: DataFrame, e: int, m: int, s: int) -> DataFrame:
        return rel.select(
            "id_a",
            "id_b",
            F.lit(e).alias("e"),
            F.lit(m).alias("m"),
            F.lit(s).alias("s"),
        )

    tagged = (
        _tag(exact, 1, 0, 0)
        .union(_tag(mh, 0, 1, 0))
        .union(_tag(sh, 0, 0, 1))
    )
    flags = (
        tagged.groupBy("id_a", "id_b")
        .agg(
            F.max("e").alias("e"),
            F.max("m").alias("m"),
            F.max("s").alias("s"),
        )
        .selectExpr(
            "CAST(e AS INT) AS in_exact",
            "CAST(m AS INT) AS in_minhash",
            "CAST(s AS INT) AS in_simhash",
        )
    )
    return (
        flags.groupBy("in_exact", "in_minhash", "in_simhash")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy(
            F.desc("in_exact"), F.desc("in_minhash"), F.desc("in_simhash")
        )
    )


_DUCK_J = (
    "ROUND(len(list_filter(da.sh, s -> list_contains(db.sh, s)))"
    " / (len(da.sh) + len(db.sh)"
    " - len(list_filter(da.sh, s -> list_contains(db.sh, s))))"
    " - 0.000000001, 4) + 0.0"
)


def cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val/test split: assignment is keyed on the
    near-dup COMPONENT, not the document — whole duplicate clusters land
    in one split, closing the near-duplicate train→eval leak that
    ``cross_split_contamination`` measures and that the byte-identical
    fingerprint split (``stratified_split_report``) cannot close.  This
    is the APPLY step of that audit's finding: dedup clustering feeds
    split assignment (Lee et al. 2107.06499's protocol for honest
    held-out sets).  Reports per-split mass plus ``straddling_clusters``
    — components spanning >1 split — which is 0 by construction and
    verified independently by the oracle's recomputation.

    Scale shape: the pair relation and component map are the SAME
    artifacts the dedup pipeline already produces (at 100 TB this query
    reuses them rather than recomputing); assignment is one map-side
    md5 over the broadcast-joined component id; the report is one
    counting shuffle plus two 1-row aggregates.  Oracle: recursive-CTE
    components over the exact Jaccard >= 0.3 relation (the
    NEAR_DUP_CLUSTERS_SQL recall-1.0 argument), identical split-bucket
    text."""
    docs = load_table(spark, sf_dir, "documents")
    # unordered pair body: the component labelling shuffles by node id,
    # so the public form's output sort would be pure overhead here
    verified = _minhash_near_dup(docs, ordered=False)
    comps = D.connected_components(verified, "id_a", "id_b")
    assigned = docs.join(
        comps.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).withColumn("component", F.coalesce("component", F.col("doc_id")))
    bucket = F.substring(
        F.md5(F.col("component").cast("string").cast("binary")), 1, 2
    )
    split = (
        F.when(bucket <= "f9", "train")
        .when(bucket <= "fc", "val")
        .otherwise("test")
    )
    tagged = assigned.select(
        "doc_id",
        "component",
        split.alias("split"),
        T.token_count("text").alias("tc"),
    )
    # One (component, split) aggregate materialized ONCE feeds all three
    # downstream reductions — the old plan evaluated the full `tagged`
    # subtree (docs ⋈ components + md5 split + tokenization) three
    # separate times (straddle, per_split, and per_split again under
    # `total`); (component, split) is unique per group, so per-split
    # n_docs/n_clusters/total_tokens and the straddle count are exact
    # derivations (guide §1.2: remove redundant passes first).  Bounded:
    # one row per (component, split) — at most one per document.
    from ..plans.residency import checkpoint_bounded

    g1 = checkpoint_bounded(
        tagged.groupBy("component", "split").agg(
            F.count(F.lit(1)).cast("bigint").alias("nd"),
            F.sum("tc").cast("bigint").alias("tt"),
        ),
        "cluster_aware_split_g1",
    )
    straddle = (
        g1.groupBy("component")
        .agg(F.count(F.lit(1)).alias("ns"))
        .agg(
            F.sum(F.when(F.col("ns") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("straddling_clusters")
        )
    )
    per_split = g1.groupBy("split").agg(
        F.sum("nd").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("tt").cast("bigint").alias("total_tokens"),
    )
    total = per_split.agg(F.sum("n_docs").alias("tot"))
    return (
        per_split.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(straddle))
        .selectExpr(
            "split",
            "n_docs",
            "n_clusters",
            "total_tokens",
            "ROUND(CAST(n_docs AS DOUBLE) / tot - 0.000000001, 4) + 0.0"
            " AS pct_docs",
            "straddling_clusters",
        )
        .orderBy("split")
    )


CLUSTER_AWARE_SPLIT_SQL = f"""
WITH RECURSIVE d AS (
  SELECT doc_id, {_DUCK_SHINGLES} AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) x
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE ROUND(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
              / (len(a.sh) + len(b.sh)
                 - len(list_filter(a.sh, s -> list_contains(b.sh, s))))
              - 0.000000001, 4) + 0.0 >= 0.3
), sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b AS src, id_a AS dst FROM pairs
), reach(node, label) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.node
  WHERE r.label < s.dst
), comp AS (
  SELECT node, MIN(label) AS component FROM reach GROUP BY node
), assigned AS (
  SELECT doc.doc_id, COALESCE(comp.component, doc.doc_id) AS component,
         len(string_split(doc.text, ' ')) AS tc
  FROM documents doc LEFT JOIN comp ON doc.doc_id = comp.node
), tagged AS (
  SELECT doc_id, component, tc,
         CASE WHEN substring(md5(CAST(component AS VARCHAR)), 1, 2) <= 'f9'
              THEN 'train'
              WHEN substring(md5(CAST(component AS VARCHAR)), 1, 2) <= 'fc'
              THEN 'val'
              ELSE 'test' END AS split
  FROM assigned
), straddle AS (
  SELECT CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS straddling_clusters
  FROM (SELECT component, COUNT(DISTINCT split) AS ns
        FROM tagged GROUP BY component) x
), per_split AS (
  SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT component) AS BIGINT) AS n_clusters,
         CAST(SUM(tc) AS BIGINT) AS total_tokens
  FROM tagged GROUP BY split
), tot AS (SELECT SUM(n_docs) AS tot FROM per_split)
SELECT split, n_docs, n_clusters, total_tokens,
       ROUND(CAST(n_docs AS DOUBLE) / tot - 0.000000001, 4) + 0.0
         AS pct_docs,
       straddling_clusters
FROM per_split CROSS JOIN tot CROSS JOIN straddle ORDER BY split
"""

def _dedup_agreement_sql(where: str) -> str:
    """DEDUP_AGREEMENT oracle over the documents satisfying ``where``
    (a pure doc_id predicate — 'TRUE' for the full form, the shared
    hash-sample predicate for the sampled twin; the fps literal
    relation is filtered by the SAME predicate, which is valid exactly
    because sample membership is a function of doc_id alone)."""
    return f"""
WITH fps_all(doc_id, lo, hi) AS (VALUES
  {SIMHASH_FPS_VALUES}
), fps AS (
  SELECT * FROM fps_all WHERE ({where})
), sdocs AS (
  SELECT * FROM documents WHERE ({where})
), sh_pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fps a JOIN fps b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
), ex_pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sdocs a JOIN sdocs b
    ON a.doc_id < b.doc_id AND a.text = b.text
), d AS (
  SELECT doc_id, {_DUCK_SHINGLES} AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM sdocs) x
), mh_pairs AS (
  SELECT da.doc_id AS id_a, db.doc_id AS id_b
  FROM d da JOIN d db ON da.doc_id < db.doc_id
  WHERE {_DUCK_J} >= 0.3
), universe AS (
  SELECT id_a, id_b FROM ex_pairs
  UNION SELECT id_a, id_b FROM mh_pairs
  UNION SELECT id_a, id_b FROM sh_pairs
), flags AS (
  SELECT CASE WHEN e.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_exact,
         CASE WHEN m.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_minhash,
         CASE WHEN s.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_simhash
  FROM universe u
  LEFT JOIN ex_pairs e ON u.id_a = e.id_a AND u.id_b = e.id_b
  LEFT JOIN mh_pairs m ON u.id_a = m.id_a AND u.id_b = m.id_b
  LEFT JOIN sh_pairs s ON u.id_a = s.id_a AND u.id_b = s.id_b
)
SELECT CAST(in_exact AS INT) AS in_exact,
       CAST(in_minhash AS INT) AS in_minhash,
       CAST(in_simhash AS INT) AS in_simhash,
       COUNT(*) AS pair_count
FROM flags GROUP BY 1, 2, 3 ORDER BY 1 DESC, 2 DESC, 3 DESC
"""


DEDUP_AGREEMENT_SQL = _dedup_agreement_sql("TRUE")

DEDUP_AGREEMENT_SAMPLED_SQL = _dedup_agreement_sql(
    DUCK_DOC_SAMPLE_WHERE_FIXED_SIZE
)


def near_dup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aggressiveness tuning curve: for Jaccard thresholds from the
    noise floor (0.005) to near-exact (0.8), how many pairs and distinct
    documents a shingle-Jaccard dedup pass at that threshold would act
    on.  This is the number a pipeline owner reads BEFORE picking the
    MinHash banding: the elbow where the count collapses (here between
    incidental-shingle overlap and the planted-dup plateau) separates
    background similarity from true duplication.

    Scale posture: identical blocking to ``near_dup_shingle_pairs``
    ((lang, length-bucket) co-partitioned self-join, shingle arrays
    materialized once behind the repartition exchange and reused on both
    sides); the 5-threshold explode multiplies only the QUALIFYING-pair
    relation (true-dup density), and the rollup is 5 rows."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 16).cast("bigint").alias("bucket"),
        T.shingle_hashes("text").alias("sh"),
    ).repartition(F.col("lang"), F.col("bucket"))
    a = d.alias("a")
    b = d.alias("b").hint("shuffle_hash")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        # barrier: without it Catalyst pushes the threshold filter below
        # this projection INTO the join's residual condition, where the
        # Jaccard (an array_intersect — the heavy part) is evaluated
        # per hash-probe pair outside codegen CSE: measured 34 s vs 11 s
        # at the 16x spotcheck scale for identical results.
        stop_predicate_pushdown(
            D.ngram_jaccard(F.col("a.sh"), F.col("b.sh"))
        ).alias("j"),
    )
    levels = (0.005, 0.01, 0.02, 0.05, 0.8)
    # Pre-filter at the MINIMUM threshold before the 5-way explode: the
    # heavy expression runs once per candidate pair here; the explode
    # then multiplies only the qualifying pairs (true-dup density).
    qualifying = pairs.filter(F.col("j") >= F.lit(min(levels)))
    thresholds = F.array(*[F.lit(t) for t in levels])
    swept = (
        qualifying.select(
            "doc_a", "doc_b", "j", F.explode(thresholds).alias("threshold")
        )
        .filter(F.col("j") >= F.col("threshold"))
    )
    # each pair contributes its two doc ids; count(*)/2 recovers the pair
    # count while count_distinct(doc) gives the touched-document count in
    # the same aggregation (the pair relation is scanned once)
    exploded = swept.select(
        "threshold", "j", F.explode(F.array("doc_a", "doc_b")).alias("doc")
    )
    return (
        exploded.groupBy("threshold")
        .agg(
            (F.count(F.lit(1)) / 2).cast("bigint").alias("n_pairs"),
            F.count_distinct("doc").alias("n_docs"),
            T.round_stable(F.avg("j"), 4).alias("mean_jaccard"),
        )
        .orderBy("threshold")
    )


THRESHOLD_SWEEP_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, n_chars // 16 AS bucket, {{shingles}} AS sh
  FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w FROM documents) x
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         ROUND(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
               / (len(a.sh) + len(b.sh)
                  - len(list_filter(a.sh, s -> list_contains(b.sh, s))))
               - 0.000000001, 4) + 0.0 AS j
  FROM d a JOIN d b
    ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
), sw AS (
  SELECT CAST(t.threshold AS DOUBLE) AS threshold, p.doc_a, p.doc_b, p.j
  FROM p CROSS JOIN (VALUES (0.005), (0.01), (0.02), (0.05), (0.8)) t(threshold)
  WHERE p.j >= CAST(t.threshold AS DOUBLE)
), ex AS (
  SELECT threshold, j, unnest([doc_a, doc_b]) AS doc FROM sw
)
SELECT threshold,
       CAST(COUNT(*) // 2 AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs,
       ROUND(AVG(j) - 0.000000001, 4) + 0.0 AS mean_jaccard
FROM ex GROUP BY threshold ORDER BY threshold
""".format(shingles=_DUCK_SHINGLES)


def cluster_quality_canonicals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster canonical selection by QUALITY, not id: within
    each connected component of the verified near-dup graph, keep the
    longest document (``n_chars`` desc, doc_id asc on ties) — the
    retention policy real pipelines use, since the min-id member of a
    cluster is often the truncated or boilerplate variant.  Reports
    every cluster with its size, the chosen canonical, and how many
    docs the policy drops.

    Scale shape: the component relation comes from the LSH pipeline
    (banded candidates → exact verify → min-label propagation — never
    all-pairs); attaching quality is a hash join on the doc id; the
    per-cluster argmax is a window over ``component`` — a key whose
    cardinality grows with the corpus, so the window parallelizes like
    the shuffle.  Oracle: DuckDB recomputes components with the
    recursive min-label CTE (same recall-1.0 argument as
    MINHASH_NEAR_DUP_SQL) and the same window rule."""
    docs = load_table(spark, sf_dir, "documents")
    # unordered pair body: the component labelling shuffles by node id,
    # so the public form's output sort would be pure overhead here
    verified = _minhash_near_dup(docs, ordered=False)
    comps = D.connected_components(verified, "id_a", "id_b")
    sized = comps.join(
        docs.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    win = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("node")
    )
    ranked = sized.select(
        "component",
        "node",
        "n_chars",
        F.row_number().over(win).alias("rk"),
    )
    return (
        ranked.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.max(F.when(F.col("rk") == 1, F.col("node"))).alias("canonical_id"),
            F.max(F.when(F.col("rk") == 1, F.col("n_chars"))).alias("canonical_chars"),
            (F.count(F.lit(1)) - F.lit(1)).alias("dropped_docs"),
        )
        .orderBy("component")
    )


CLUSTER_CANONICALS_SQL = f"""
WITH RECURSIVE d AS (
  SELECT doc_id, {_DUCK_SHINGLES} AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) x
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE ROUND(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
              / (len(a.sh) + len(b.sh)
                 - len(list_filter(a.sh, s -> list_contains(b.sh, s))))
              - 0.000000001, 4) + 0.0 >= 0.3
), sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b AS src, id_a AS dst FROM pairs
), reach(node, label) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.node
  WHERE r.label < s.dst
), comp AS (
  SELECT node, MIN(label) AS component FROM reach GROUP BY node
), ranked AS (
  SELECT c.component, c.node, doc.n_chars,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY doc.n_chars DESC, c.node ASC) AS rk
  FROM comp c JOIN documents doc ON doc.doc_id = c.node
)
SELECT component, COUNT(*) AS cluster_size,
       MAX(CASE WHEN rk = 1 THEN node END) AS canonical_id,
       MAX(CASE WHEN rk = 1 THEN n_chars END) AS canonical_chars,
       COUNT(*) - 1 AS dropped_docs
FROM ranked GROUP BY component ORDER BY component
"""


SPECS = [
    QuerySpec("cluster_quality_canonicals", cluster_quality_canonicals,
              CLUSTER_CANONICALS_SQL,
              "quality-argmax canonical per near-dup cluster (longest "
              "doc wins, not min id)"),
    QuerySpec("near_dup_threshold_sweep", near_dup_threshold_sweep,
              THRESHOLD_SWEEP_SQL,
              "near-dup pair/doc volume per Jaccard threshold (dedup "
              "tuning curve)"),
    QuerySpec("simhash_near_dup", simhash_near_dup, SIMHASH_NEAR_DUP_SQL,
              "SimHash banded candidates + hamming verify vs "
              "fingerprint-literal all-pairs oracle"),
    QuerySpec("simhash_hamming_calibration", simhash_hamming_calibration,
              SIMHASH_CALIBRATION_SQL,
              "Hamming-threshold calibration: 8x16-bit banding "
              "(certified d<=7) with exact integer shingle-overlap "
              "sums per hamming bucket"),
    QuerySpec("minhash_estimate_calibration", minhash_estimate_calibration,
              MINHASH_CALIB_SQL,
              "MinHash estimator calibration: per exact-Jaccard decile "
              "bin, mean/max |estimate - exact| over the 1-row-band "
              "candidate relation vs signature-literal oracle"),
    QuerySpec("minhash_estimate_calibration_sampled",
              minhash_estimate_calibration_sampled,
              MINHASH_CALIB_SAMPLED_SQL,
              "fixed-cost production twin of the MinHash calibration: "
              "identical estimator audit over the deterministic "
              "hash-sampled corpus (same predicate both engines)"),
    QuerySpec("dedup_modality_agreement", dedup_modality_agreement,
              DEDUP_AGREEMENT_SQL,
              "cross-modality dedup agreement matrix: exact/minhash/"
              "simhash flag combinations with pair counts"),
    QuerySpec("dedup_modality_agreement_sampled",
              dedup_modality_agreement_sampled,
              DEDUP_AGREEMENT_SAMPLED_SQL,
              "fixed-cost scheduled twin of the modality agreement "
              "matrix over the deterministic hash-sampled corpus"),
    QuerySpec("embedding_label_outliers", embedding_label_outliers,
              EMBEDDING_LABEL_OUTLIERS_SQL,
              "label-conditioned outlier audit: top-20 vectors by "
              "z-scored distance to their own label centroid"),
    QuerySpec("cluster_aware_split", cluster_aware_split,
              CLUSTER_AWARE_SPLIT_SQL,
              "leakage-free split keyed on near-dup components: whole "
              "clusters land in one split, straddle count 0 by "
              "construction"),
    QuerySpec("embedding_pq_ann", embedding_pq_ann, EMBEDDING_PQ_SQL,
              "product-quantization ADC ANN vs codebook-literal oracle"),
    QuerySpec("embedding_ivfpq_ann", embedding_ivfpq_ann, EMBEDDING_IVFPQ_SQL,
              "IVF-PQ composed ANN (probe pruning + ADC codes) vs "
              "artifact-literal oracle"),
    QuerySpec("embedding_ann_recall_curve", embedding_ann_recall_curve,
              ANN_RECALL_SQL,
              "IVF recall@10 vs brute force across the nprobe sweep — "
              "the ANN accuracy-vs-cost tuning curve, oracle-gated"),
    QuerySpec("embedding_ivf_ann", embedding_ivf_ann, EMBEDDING_IVF_SQL,
              "IVF (KMeans inverted lists) ANN top-k vs centroid-literal "
              "oracle"),
    QuerySpec("semantic_dedup_stats", semantic_dedup_stats, SEMANTIC_DEDUP_SQL,
              "SemDeDup cluster-scoped embedding dedup vs centroid-literal "
              "oracle"),
    QuerySpec("doc_token_stats", doc_token_stats, DOC_TOKEN_STATS_SQL,
              "token counting per language"),
    QuerySpec("bpe_token_budget", bpe_token_budget, BPE_TOKEN_BUDGET_SQL,
              "BPE-ish regex vs whitespace token budget per language"),
    QuerySpec("doc_quality_scores", doc_quality_scores, DOC_QUALITY_SQL,
              "per-document quality scoring"),
    QuerySpec("language_prediction", language_prediction, LANGUAGE_PREDICTION_SQL,
              "language-ID heuristic confusion counts"),
    QuerySpec("dedup_exact_documents", dedup_exact_documents, DEDUP_EXACT_SQL,
              "exact dedup via md5 fingerprint groupBy"),
    QuerySpec("shingle_fingerprints", shingle_fingerprints, SHINGLE_FINGERPRINT_SQL,
              "canonical shingle-set fingerprint"),
    QuerySpec("near_dup_shingle_pairs", near_dup_shingle_pairs, NEAR_DUP_SQL,
              "blocked n-gram Jaccard near-dup pairs"),
    QuerySpec("jaccard_prefix_filter_pairs", jaccard_prefix_filter_pairs,
              PREFIX_FILTER_SQL,
              "EXACT set-similarity join via PPJoin prefix filtering "
              "(rarest-first prefixes); oracle = brute-force all-pairs"),
    QuerySpec("cdc_chunk_overlap", cdc_chunk_overlap, CDC_CHUNK_OVERLAP_SQL,
              "content-defined chunk fingerprint overlap (rolling hash)"),
    QuerySpec("minhash_near_dup", minhash_near_dup, MINHASH_NEAR_DUP_SQL,
              "MinHash-LSH near-dup pairs vs exact-Jaccard oracle"),
    QuerySpec("near_dup_clusters", near_dup_clusters, NEAR_DUP_CLUSTERS_SQL,
              "LSH → verify → connected components vs recursive-CTE oracle"),
    QuerySpec("embedding_near_dup_pairs", embedding_near_dup_pairs,
              EMBEDDING_NEAR_DUP_SQL,
              "embedding-cosine near-dup pairs (LSH scale path, "
              "recall-pinned approximate contract)"),
    QuerySpec("embedding_near_dup_pairs_exact", embedding_near_dup_pairs_exact,
              EMBEDDING_NEAR_DUP_SQL,
              "exact brute-force near-dup baseline (bounded corpora)"),
    QuerySpec("embedding_topk_cosine", embedding_topk_cosine, EMBEDDING_TOPK_SQL,
              "brute-force cosine top-k"),
    QuerySpec("hard_negative_mining", hard_negative_mining,
              HARD_NEGATIVE_SQL,
              "contrastive hard negatives: top-5 most-similar "
              "different-label vectors per query (two-phase rank)"),
    QuerySpec("embedding_multi_query_topk", embedding_multi_query_topk,
              EMBEDDING_MULTI_TOPK_SQL, "batched multi-query ANN serving"),
    QuerySpec("embedding_dim_truncation_recall", embedding_dim_truncation_recall,
              DIM_TRUNCATION_SQL,
              "Matryoshka truncation audit: recall@10 of prefix-dim "
              "cosine vs full-dim exact, per (dim, query)"),
    QuerySpec("embedding_norm_stats", embedding_norm_stats, EMBEDDING_NORM_SQL,
              "vector norm statistics per label"),
    QuerySpec("embedding_lsh_ann", embedding_lsh_ann, EMBEDDING_LSH_SQL,
              "hyperplane-LSH bucketed ANN vs plane-literal oracle"),
]
