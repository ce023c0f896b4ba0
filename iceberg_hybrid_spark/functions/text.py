"""Text-analysis column builders (north-star text ops).

All pure Column expressions (JVM-side, whole-stage-codegen friendly) — no
Python UDFs in any hot path.  At 100 TB these run as map-only operators
over the documents scan with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny English function-word list used by the language-ID heuristic and the
# quality score.  Deterministic and engine-portable (the DuckDB oracle uses
# the same literal list).
STOPWORDS = ("the", "a")

# Ratios of small integers (k/token_count etc.) can land EXACTLY on a
# round-half boundary (1/32 = 0.03125), where Spark's BigDecimal HALF_UP
# and DuckDB's scaled-double rounding disagree.  Shifting by -1e-9 before
# rounding resolves every exact boundary downward in both engines; values
# not on a boundary are ≥ ~2.5e-7 away for these denominators, so nothing
# else moves.  DuckDB oracles subtract the same literal.
ROUND_EPS = 1e-9


def round_stable(col: Column, scale: int) -> Column:
    # + 0.0 normalizes IEEE -0.0 (from rounding a tiny negative) to +0.0
    return F.round(col - ROUND_EPS, scale) + F.lit(0.0)


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (documents testdata is space-separated)."""
    return F.split(text, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


# BPE-ish pre-tokenization pattern (GPT-2-style classes, ASCII-safe so
# Java regex and RE2 agree): letter runs, single digits (numbers split
# per digit, as byte-level BPE effectively does), punctuation runs.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+"


def bpe_token_count(text: Column | str) -> Column:
    """Token count under the BPE-ish regex — the pre-tokenizer-level
    budget estimate (whitespace counts undercount punctuation-heavy and
    numeric text, which this captures)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(tokens(text), lambda t: t.isin(*stopwords)))


def lexical_diversity(text: Column | str) -> Column:
    """distinct tokens / total tokens, 4dp."""
    return round_stable(distinct_token_count(text) / token_count(text), 4)


def stopword_ratio(text: Column | str) -> Column:
    return round_stable(stopword_count(text) / token_count(text), 4)


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-token shingles (word n-grams) — the unit set for
    Jaccard/MinHash near-dup detection.  Documents shorter than k tokens
    yield an empty set.

    Built by zipping k shifted slices of the token array, NOT by indexing
    ``element_at(tokens(text), i)`` inside a ``transform`` lambda: an
    array-valued expression referenced inside a lambda is re-evaluated per
    ELEMENT (O(n²) per document — measured 7× slower on the near-dup
    bench).  The slice children are plain per-row expressions, and the
    repeated ``tokens(text)`` subtree is deduplicated by codegen
    subexpression elimination."""
    words = tokens(text)
    n = F.size(words)
    m = n - (k - 1)  # number of shingles
    acc = F.slice(words, 1, m)
    for j in range(1, k):
        acc = F.zip_with(
            acc, F.slice(words, j + 1, m), lambda x, y: F.concat_ws(" ", x, y)
        )
    # when() evaluates lazily — the negative-length slice never runs for
    # short docs.
    return F.when(n >= k, F.array_distinct(acc)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_hashes(text: Column | str, k: int = 3) -> Column:
    """Distinct k-token shingles as 64-bit hashes: each token is xxhash64ed
    once, then k shifted slices fold into one long per shingle.

    Set semantics match ``shingles()`` up to xxhash64 collisions
    (≈ n²/2⁶⁴ — vanishing at any corpus size), so Jaccard / MinHash over
    these is equivalent while shuffle rows carry 8-byte longs instead of
    k-word strings and set intersections compare longs, not strings."""
    wh = F.transform(tokens(text), lambda t: F.xxhash64(t))
    n = F.size(wh)
    m = n - (k - 1)
    acc = F.slice(wh, 1, m)
    for j in range(1, k):
        acc = F.zip_with(acc, F.slice(wh, j + 1, m), lambda x, y: F.xxhash64(x, y))
    return F.when(n >= k, F.array_distinct(acc)).otherwise(
        F.array().cast("array<bigint>")
    )


def shingle_fingerprint(text: Column | str, k: int = 3) -> Column:
    """Order-canonical document fingerprint: md5 over the sorted distinct
    shingle set.  Equal fingerprints ⇒ identical shingle sets (exact-dup
    detection robust to shingle multiplicity)."""
    return F.md5(
        F.concat_ws("|", F.array_sort(shingles(text, k))).cast("binary")
    )


def language_guess(text: Column | str, threshold: float = 0.04) -> Column:
    """n-gram-free language-ID heuristic: English function-word density.
    A real implementation swaps in a char-trigram model; the surface
    (map-only column expression) is identical."""
    return F.when(stopword_ratio(text) >= threshold, F.lit("en")).otherwise(
        F.lit("other")
    )


def quality_score(text: Column | str) -> Column:
    """Composite document quality in [0,1]: favors lexical diversity and a
    natural stopword rate, penalizes extremely short docs."""
    tc = token_count(text)
    diversity = distinct_token_count(text) / tc
    stop = stopword_count(text) / tc
    length_factor = F.least(tc / F.lit(100.0), F.lit(1.0))
    return round_stable(
        0.5 * diversity + 0.3 * F.least(stop * 10.0, F.lit(1.0)) + 0.2 * length_factor,
        4,
    )
