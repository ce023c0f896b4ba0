"""Iterative BPE tokenizer training (Sennrich et al., arXiv 1508.07909).

Reference parity: the reference exposes tokenizer-budget analytics over
the corpus (see SURVEY.md §2 text-analysis ops); this module adds the
training loop itself — the step a training-data pipeline runs to fit the
tokenizer on the cleaned corpus.

Scale design — why this survives 100 TB:

* Training runs over the WORD-TYPE relation (distinct words + counts),
  never the token stream: one counting shuffle collapses the corpus to
  its vocabulary (~10⁶–10⁷ types regardless of corpus size — Heaps' law
  sublinearity), and every subsequent round is a small job over types.
* Each round is ONE partial-agg counting shuffle (adjacent symbol pairs
  weighted by word count) plus a 1-row ``TakeOrderedAndProject`` argmax
  collect — the only driver-side data movement, bounded by contract.
* Merge application is a single JVM-side ``replace`` per round over the
  double-space-encoded symbol string (see below) — no Python UDFs, no
  array rebuilds, whole-stage codegen throughout.

Symbol-string encoding: a word's symbol sequence is stored as
``"␣␣s1␣␣s2␣␣…␣␣"`` — every boundary, including both ends, is exactly
TWO spaces.  Applying merge (a, b) is then the literal replacement
``"␣a␣␣b␣" → "␣ab␣"``: the pattern borrows ONE space from each side's
double boundary, so after replacement both neighbors' boundaries are
double again, and consecutive occurrences (``a b a b``) each retain a
full pattern match.  Sequential leftmost non-overlapping replacement —
the semantics of both JVM ``replace`` and DuckDB ``replace`` — is
exactly greedy BPE merge application (``a a a`` → ``[aa, a]``).
Symbols never contain spaces (words are whitespace tokens), so the
encoding is unambiguous, and the SAME replace chain runs verbatim in
the DuckDB oracle (tools/gen_bpe_oracle.py pins only the chosen merge
pairs as literals; counts, argmaxes and vocabulary sizes are all
recomputed independently).

Words are restricted to printable ASCII on both engines: Spark's
``split(word, '')`` separates UTF-16 code units while DuckDB's
``substring`` counts Unicode characters, so a supplementary-plane
character would split differently — the shared ``^[ -~]+$`` filter
removes the divergence instead of hiding it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Printable-ASCII guard shared (textually) with the DuckDB oracle.
ASCII_WORD_RE = "^[ -~]+$"


def word_types(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word relation with occurrence counts — the input BPE
    training actually iterates over (one counting shuffle, then the
    corpus is out of the picture)."""
    return (
        docs.select(F.explode(F.split(text_col, " ")).alias("word"))
        .filter((F.col("word") != "") & F.col("word").rlike(ASCII_WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def char_symbol_string(word: Column) -> Column:
    """Initial symbol string: characters joined and wrapped by double
    spaces (``"abc"`` → ``"␣␣a␣␣b␣␣c␣␣"``)."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(F.lit("  "), F.concat_ws("  ", chars), F.lit("  "))


def symbols(sym_str: Column) -> Column:
    """Decode the symbol array from the double-space encoding."""
    return F.filter(F.split(sym_str, "  "), lambda x: x != "")


def adjacent_pairs(sym_str: Column) -> Column:
    """Adjacent symbol pairs as ``"a b"`` strings (two shifted slices
    zipped map-side — the same kernel as ``bpe_merge_candidates``)."""
    arr = symbols(sym_str)
    m = F.size(arr) - 1
    return F.when(
        m >= 1,
        F.zip_with(
            F.slice(arr, 1, m),
            F.slice(arr, 2, m),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
    ).otherwise(F.array().cast("array<string>"))


def apply_merge(sym_str: Column, a: str, b: str) -> Column:
    """Greedy BPE application of merge (a, b) via boundary-borrowing
    literal replacement (see module docstring)."""
    return F.replace(
        sym_str, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")
    )


def train_bpe(docs: DataFrame, rounds: int = 6) -> list[tuple[int, str, int, int]]:
    """Run ``rounds`` BPE merge iterations over the corpus; returns
    ``(round, "a b", pair_count, vocab_size_after_merge)`` per round.

    The per-round argmax collect is ONE row (tie-broken by pair string,
    so the result is deterministic and partitioning-independent); the
    word-type relation is persisted once and each round chains one
    ``replace`` on top — round r recomputes r cheap string replaces
    over vocabulary-sized data, not the corpus."""
    types = word_types(docs).select(
        char_symbol_string(F.col("word")).alias("s"), "wc"
    )
    types.persist()
    try:
        picked: list[tuple[int, str, int]] = []
        states: list[DataFrame] = []
        cur = types
        for r in range(1, rounds + 1):
            top = (
                cur.select(F.explode(adjacent_pairs(F.col("s"))).alias("pair"), "wc")
                .groupBy("pair")
                .agg(F.sum("wc").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            pair, cnt = top[0]["pair"], int(top[0]["cnt"])
            a, b = pair.split(" ")
            cur = cur.select(apply_merge(F.col("s"), a, b).alias("s"), "wc")
            picked.append((r, pair, cnt))
            states.append(cur)
        # all post-merge vocabulary sizes in ONE job: union the (round,
        # symbol) streams — each branch replays its replace chain over
        # the persisted type relation map-side — and count distinct per
        # round in a single shuffle, instead of one job per round.
        vocab_df = None
        for (r, _, _), st in zip(picked, states):
            br = st.select(
                F.lit(r).alias("r"), F.explode(symbols(F.col("s"))).alias("sym")
            )
            vocab_df = br if vocab_df is None else vocab_df.unionAll(br)
        vocab_by_round: dict[int, int] = {}
        if vocab_df is not None:
            vocab_by_round = {
                row["r"]: int(row["v"])
                for row in vocab_df.groupBy("r")
                .agg(F.countDistinct("sym").alias("v"))
                .collect()
            }
        return [(r, pair, cnt, vocab_by_round[r]) for r, pair, cnt in picked]
    finally:
        types.unpersist()
