"""Train/test contamination scan: n-gram overlap between a training
corpus and a held-out benchmark set.

No native reference op — this is part of the training-data-pipeline
family layered on the same engine (SURVEY.md §2 pipeline additions).

Scale posture (100 TB corpus):

- The join key is the 8-byte shingle hash (``shingle_hashes`` — tokens
  xxhash64ed and folded per shingle), never the n-gram *string*: the
  corpus-side explode shuffles one long per shingle instead of k-word
  strings, and the equality compare is a long compare.
- The benchmark side is a *parameter*.  When it is genuinely bounded
  (the eval suites you guard against — thousands of documents whose size
  is independent of corpus size) pass ``broadcast_benchmark=True`` and
  the corpus never shuffles: one map-side hash join.  When the benchmark
  relation is derived from the corpus itself (so it grows with the
  data), keep the default ``False`` — the join is pinned to a shuffled
  hash join on the 8-byte key (both sides exchange on the hash; AQE
  still splits skewed partitions).  It is pinned rather than left to
  the static planner because Catalyst's size estimate for a
  filter+explode subtree derives from the file size and badly
  undershoots the n-gram blowup — at test scale it would happily
  broadcast a relation that at 100 TB is terabytes of exploded
  shingles (executor OOM).  Never broadcast a corpus-derived side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import text as T


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    k: int = 2,
    min_overlap: float = 0.2,
    broadcast_benchmark: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Per (corpus doc, benchmark doc) pair: how many of the corpus doc's
    distinct k-gram shingles appear in the benchmark doc, keeping pairs
    whose overlap fraction is at least ``min_overlap``.

    ``corpus`` needs (``id_col``, ``text_col``); ``benchmark`` needs
    (``bench_id_col``, ``text_col``).  Returns columns ``doc_id``,
    ``bench_id``, ``matching_ngrams``, ``doc_ngrams``, ``overlap_frac``
    (unordered — callers sort).
    """
    sh = T.shingle_hashes(text_col, k=k)
    corp = (
        corpus.select(F.col(id_col).alias("doc_id"), sh.alias("sh"))
        .withColumn("n", F.size("sh"))
        .select("doc_id", "n", F.explode("sh").alias("h"))
    )
    bench = benchmark.select(
        F.col(bench_id_col).alias("bench_id"), F.explode(sh).alias("h")
    )
    # Bounded-by-contract benchmark → broadcast (corpus never shuffles);
    # corpus-derived benchmark → shuffled hash join with the benchmark
    # side as build (smaller of the two by construction).
    bench = F.broadcast(bench) if broadcast_benchmark else bench.hint("shuffle_hash")
    return (
        corp.join(bench, "h")
        .groupBy("doc_id", "bench_id")
        .agg(
            F.count(F.lit(1)).alias("matching_ngrams"),
            F.first("n").cast("bigint").alias("doc_ngrams"),
        )
        .filter(F.col("matching_ngrams") >= min_overlap * F.col("doc_ngrams"))
        .select(
            "doc_id",
            "bench_id",
            "matching_ngrams",
            "doc_ngrams",
            T.round_stable(
                F.col("matching_ngrams") / F.col("doc_ngrams"), 4
            ).alias("overlap_frac"),
        )
    )
