"""Connected-components dedup clustering with planted duplicate groups."""

import pytest

from iceberg_hybrid_spark.functions import dedup as D


@pytest.fixture(scope="module")
def pairs(spark):
    # two clusters: {1,2,3} (chain), {10,11}; isolated pair member 20-20 none
    return spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )


def test_connected_components(spark, pairs):
    comps = {r.node: r.component for r in D.connected_components(pairs).collect()}
    assert comps[1] == comps[2] == comps[3] == 1
    assert comps[10] == comps[11] == 10


def test_chain_longer_than_one_hop(spark):
    # a 6-node path — takes several propagation rounds
    edges = [(i, i + 1) for i in range(1, 6)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    comps = {r.node: r.component for r in D.connected_components(pairs).collect()}
    assert set(comps.values()) == {1}


def test_deep_chain_beyond_20_hops(spark):
    # a 60-node path (diameter 59): pure one-hop min-label propagation
    # needs 59 rounds and at max_iter=20 would return TRUNCATED labels
    # (the far end keeps an intermediate id) — the silent-wrong-answer
    # bug the round-6 verdict flagged.  Pointer jumping converges in
    # O(log 59) ≈ 6 rounds, so this passes well within max_iter=20.
    edges = [(i, i + 1) for i in range(1, 60)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    comps = {r.node: r.component for r in D.connected_components(pairs).collect()}
    assert len(comps) == 60
    assert set(comps.values()) == {1}


def test_non_convergence_raises_not_truncates(spark):
    # when the budget genuinely runs out, the fixpoint must FAIL LOUDLY —
    # wrong component labels silently leak near-duplicates past dedup
    edges = [(i, i + 1) for i in range(1, 40)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(pairs, max_iter=2)


def test_dedup_keep_canonical(spark, pairs):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in (1, 2, 3, 10, 11, 99)], "doc_id long, text string"
    )
    comps = D.connected_components(pairs)
    kept = sorted(r.doc_id for r in D.dedup_keep_canonical(docs, comps).collect())
    # one representative per cluster (min id) + untouched doc 99
    assert kept == [1, 10, 99]


def test_end_to_end_with_planted_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),
        (3, base.replace("lazy", "sleepy")),
        (4, "totally different content about query engines and shuffles here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cands = D.minhash_lsh_candidates(docs, num_hashes=16, bands=8)
    comps = D.connected_components(cands)
    kept = sorted(r.doc_id for r in D.dedup_keep_canonical(docs, comps).collect())
    assert 1 in kept and 4 in kept
    assert 2 not in kept  # exact dup removed


def test_prefix_filter_pairs_complete_on_planted_corpus(spark, tmp_path):
    """The PPJoin query must find exactly the pairs brute force finds:
    a planted >=0.3-shingle-Jaccard pair (one word changed), an exact
    duplicate, and an unrelated document that must NOT pair."""
    import itertools
    import os

    from iceberg_hybrid_spark.functions.text import shingle_hashes
    from iceberg_hybrid_spark.queries.llm import jaccard_prefix_filter_pairs
    from pyspark.sql import functions as F

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base, "en", "a", len(base)),
        (2, base, "en", "a", len(base)),  # exact dup -> jaccard 1.0
        (3, base.replace("eta theta", "eta NEW"), "en", "a", 10),  # near dup
        (4, "totally different words about query engines and shuffles okay",
         "en", "b", 10),
    ]
    sf_dir = str(tmp_path / "sf_pf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).coalesce(1).write.parquet(os.path.join(sf_dir, "documents.parquet"))

    got = {(r.id_a, r.id_b): r.jaccard
           for r in jaccard_prefix_filter_pairs(spark, sf_dir).collect()}

    # brute-force reference over the same hashed shingle sets
    sh = {r.doc_id: set(r.s) for r in spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).select("doc_id", shingle_hashes(F.col("text")).alias("s")).collect()}
    want = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        j = round(inter / max(len(sh[a] | sh[b]), 1) - 1e-9, 4)
        if j >= 0.3:
            want[(a, b)] = j
    assert got == want
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (1, 3) in got  # the planted near dup survives prefix filtering
    assert not any(4 in pair for pair in got)
