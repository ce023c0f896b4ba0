"""Round-6 late additions: iterative BPE training (merge application
edge cases, end-to-end hand-computed rounds), inverted-index varint
widths, bigram-LM arithmetic, and shingle novelty semantics."""

import pytest
from pyspark.sql import functions as F

from iceberg_hybrid_spark.functions import bpe as B


@pytest.fixture(scope="module")
def words(spark):
    # hand-sized corpus: "aaa" exercises greedy overlap, "abab"
    # consecutive non-overlapping occurrences, low/lower/lowest the
    # classic shared-prefix family
    rows = [("aaa ab abab low lower lowest",)]
    return spark.createDataFrame(rows, "text string")


def _apply(spark, word, a, b):
    df = spark.createDataFrame([(word,)], "word string")
    out = df.select(
        B.symbols(B.apply_merge(B.char_symbol_string(F.col("word")), a, b)).alias("s")
    ).collect()[0]["s"]
    return list(out)


def test_apply_merge_greedy_overlap(spark):
    # greedy leftmost non-overlap: "aaa" + (a,a) -> [aa, a], never [a, aa]
    assert _apply(spark, "aaa", "a", "a") == ["aa", "a"]
    assert _apply(spark, "aaaa", "a", "a") == ["aa", "aa"]


def test_apply_merge_consecutive_occurrences(spark):
    # boundary-borrowing must leave the next occurrence matchable
    assert _apply(spark, "abab", "a", "b") == ["ab", "ab"]
    assert _apply(spark, "cabab", "a", "b") == ["c", "ab", "ab"]


def test_apply_merge_no_cross_symbol_match(spark):
    # (a,b) must not fire inside multi-char symbols: merge (x,a) first,
    # then (a,b) — the "xa"+"b" adjacency is NOT an "a"+"b" adjacency
    df = spark.createDataFrame([("xab",)], "word string")
    s1 = B.apply_merge(B.char_symbol_string(F.col("word")), "x", "a")
    out = df.select(B.symbols(B.apply_merge(s1, "a", "b")).alias("s")).collect()[0]["s"]
    assert list(out) == ["xa", "b"]


def test_train_bpe_hand_computed(spark, words):
    # corpus tokens: aaa, ab, abab, low, lower, lowest
    # round 1 pairs: (a,a)x2[aaa] (a,b)x3 (b,a)x1 (l,o)x3 (o,w)x3 (w,e)x2
    #                (e,r)x1 (e,s)x1 (s,t)x1
    # argmax ties at 3 -> lexicographic: "a b" < "l o" < "o w"
    rounds = B.train_bpe(words, rounds=2)
    assert rounds[0][0:3] == (1, "a b", 3)
    # after merging (a,b): ab -> [ab], abab -> [ab, ab]
    # round 2 pairs: (a,a)x2 (ab,ab)x1 (l,o)x3 (o,w)x3 (w,e)x2 ...
    assert rounds[1][1] == "l o"
    assert rounds[1][2] == 3


def test_train_bpe_vocab_shrinks_or_grows_correctly(spark, words):
    rounds = B.train_bpe(words, rounds=1)
    # post-merge vocabulary after (a,b): symbols present =
    # {a, ab, l, o, w, e, r, s, t} = 9
    assert rounds[0][3] == 9


def test_word_types_ascii_guard(spark):
    df = spark.createDataFrame([("ok café fine",)], "text string")
    kept = {r["word"] for r in B.word_types(df).collect()}
    assert kept == {"ok", "fine"}  # non-ASCII word filtered on BOTH engines


def test_inverted_index_varint_boundaries(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from iceberg_hybrid_spark.queries.pipeline import inverted_index_stats

    # token "t" appears in docs 0 and 128: gaps are 0-0=0 -> 1 byte,
    # 128-0=128 -> 2 bytes (the >=128 boundary), total 3
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 128], pa.int64()),
            "text": pa.array(["t", "t"]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([1, 1], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    row = inverted_index_stats(spark, str(tmp_path)).collect()[0]
    assert (row["df"], row["total_tf"], row["posting_bytes"]) == (2, 2, 3)


def test_cms_estimate_dominates_exact(spark):
    from iceberg_hybrid_spark.queries.pipeline import cms_token_counts

    rows = cms_token_counts(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    for r in rows:
        # the count-min invariant: estimates never undercount
        assert r["cms_estimate"] >= r["exact_count"]


def test_weighted_sample_matches_reference_implementation(spark, tmp_path):
    """Independent pure-Python Efraimidis-Spirakis replication: same
    md5-nibble uniform, same ln(u)/w key, same ordering."""
    import hashlib
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq
    from iceberg_hybrid_spark.queries.pipeline import weighted_corpus_sample

    ids = list(range(40))
    chars = [(i % 7 + 1) * 100 for i in ids]
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(["x"] * len(ids)),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["s"] * len(ids)),
            "n_chars": pa.array(chars, pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    def key(i, w):
        m = hashlib.md5(f"{i}:ws".encode()).hexdigest()
        u = sum(
            int(m[j], 16) / 16.0 ** (j + 1) for j in range(8)
        ) + 1e-12
        return math.log(u) / w

    expected = sorted(
        ((key(i, w), i) for i, w in zip(ids, chars)),
        key=lambda t: (-t[0], t[1]),
    )[:25]
    got = weighted_corpus_sample(spark, str(tmp_path)).collect()
    assert [r["doc_id"] for r in got] == [i for _, i in expected]
    for r, (k, _) in zip(got, expected):
        assert abs(r["es_key"] - round(k - 1e-9, 6)) < 1e-9


def test_shingle_novelty_first_doc_wins(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from iceberg_hybrid_spark.queries.pipeline import shingle_novelty_scores

    # doc 1 introduces every shingle (novelty 1.0); doc 2 repeats doc 1
    # verbatim (novelty 0.0) -> source avg 0.5
    text = "one two three four five"
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([text, text]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["web", "web"]),
            "n_chars": pa.array([len(text)] * 2, pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    row = shingle_novelty_scores(spark, str(tmp_path)).collect()[0]
    assert row["n_docs"] == 2
    assert row["avg_novelty"] == 0.5


def test_bpe_tokenize_fertility_replicates_apply(spark):
    """Pure-Python replication of the APPLY step: encode every word with
    the merges Spark trained, re-aggregate, and compare — training
    itself is oracle-gated separately (bpe_merge_rounds)."""
    import re

    import pandas as pd

    from iceberg_hybrid_spark.functions import bpe as B
    from iceberg_hybrid_spark.queries.pipeline import bpe_tokenize_fertility
    from iceberg_hybrid_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    merges = [p for (_r, p, _c, _v) in B.train_bpe(docs, rounds=6)]

    def encode(word: str) -> int:
        syms = list(word)
        for pair in merges:
            a, b = pair.split(" ")
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    pdf = pd.read_parquet(f"{sf}/documents.parquet")
    agg: dict[str, list[int]] = {}
    for _, row in pdf.iterrows():
        for w in row["text"].split(" "):
            if w and re.fullmatch(r"[ -~]+", w):
                t = agg.setdefault(row["lang"], [0, 0, 0])
                t[0] += 1
                t[1] += encode(w)
                t[2] += len(w)

    got = {r["lang"]: r for r in bpe_tokenize_fertility(spark, sf).collect()}
    assert set(got) == set(agg)
    for lang, (wt, bt, ch) in agg.items():
        row = got[lang]
        assert row["word_tokens"] == wt
        assert row["bpe_tokens"] == bt
        assert row["chars"] == ch
        assert abs(row["fertility"] - bt / wt) < 1e-3
        # merges only shrink the encoding; chars is the ceiling
        assert wt <= row["bpe_tokens"] <= ch


def test_bigram_pmi_matches_reference_implementation(spark):
    """Pure-Python PMI replication: same counts, same min-support
    floor, same ln ratio, same rounded-measure tiebreak."""
    import math

    import pandas as pd

    from iceberg_hybrid_spark.queries.pipeline import bigram_pmi_collocations

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    uni: dict[str, int] = {}
    big: dict[str, int] = {}
    n_tok = m_pairs = 0
    for text in docs["text"]:
        w = text.split(" ")
        n_tok += len(w)
        m_pairs += len(w) - 1
        for t in w:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(w, w[1:]):
            big[f"{a} {b}"] = big.get(f"{a} {b}", 0) + 1

    scored = []
    for pair, c2 in big.items():
        if c2 < 5:
            continue
        a, b = pair.split(" ")
        pmi = math.log((c2 * n_tok * n_tok) / (m_pairs * uni[a] * uni[b]))
        scored.append((round(pmi - 1e-9, 4) + 0.0, pair, c2))
    scored.sort(key=lambda t: (-t[0], t[1]))
    expect = scored[:25]

    got = bigram_pmi_collocations(spark, sf).collect()
    assert len(got) == len(expect)
    for row, (pmi, pair, c2) in zip(got, expect):
        assert row["pair"] == pair
        assert row["pair_count"] == c2
        a, b = pair.split(" ")
        assert row["count_a"] == uni[a] and row["count_b"] == uni[b]
        assert abs(row["pmi"] - pmi) < 1e-3


def test_textrank_matches_reference_implementation(spark):
    """Pure-Python TextRank replication: same support filter, same
    undirected weighted graph, same 5 damped rounds, same tiebreak."""
    import pandas as pd

    from iceberg_hybrid_spark.queries.pipeline import textrank_keywords

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    uni: dict[str, int] = {}
    pairs: dict[tuple[str, str], int] = {}
    for text in docs["text"]:
        w = text.split(" ")
        for t in w:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(w, w[1:]):
            if a != b:
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
    nodes = {t for t, c in uni.items() if c >= 10}
    edges: dict[tuple[str, str], int] = {}
    for (a, b), c in pairs.items():
        if a in nodes and b in nodes:
            edges[(a, b)] = edges.get((a, b), 0) + c
            edges[(b, a)] = edges.get((b, a), 0) + c
    outw: dict[str, int] = {}
    for (src, _), c in edges.items():
        outw[src] = outw.get(src, 0) + c
    s = {t: 1.0 for t in nodes}
    for _ in range(5):
        cs: dict[str, float] = {}
        for (src, dst), c in edges.items():
            cs[dst] = cs.get(dst, 0.0) + c / outw[src] * s[src]
        s = {t: 0.15 + 0.85 * cs.get(t, 0.0) for t in nodes}
    ranked = sorted(
        ((round(v - 1e-9, 4) + 0.0, t) for t, v in s.items()),
        key=lambda x: (-x[0], x[1]),
    )[:20]

    got = textrank_keywords(spark, sf).collect()
    assert len(got) == len(ranked)
    for row, (score, token) in zip(got, ranked):
        assert row["token"] == token
        assert abs(row["textrank"] - score) < 1e-3
