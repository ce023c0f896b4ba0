"""LLM-pipeline operators: dedup correctness with planted duplicates, LSH
vs brute-force agreement, text metrics edge cases."""

import pytest
from pyspark.sql import functions as F

from iceberg_hybrid_spark.functions import dedup as D
from iceberg_hybrid_spark.functions import similarity as S
from iceberg_hybrid_spark.functions import text as T


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    near = base.replace("lazy", "sleepy")  # one token differs → high jaccard
    rows = [
        (1, base),
        (2, base),                      # exact dup of 1
        (3, near),                      # near dup of 1
        (4, "completely different text about spark queries and shuffle behavior here"),
        (5, "short doc"),
        (6, "a b"),                     # shorter than shingle width
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_groups(spark, docs):
    groups = {r.canonical_id: r.dup_count for r in D.exact_dup_groups(docs).collect()}
    assert groups[1] == 2  # docs 1+2 collapse
    assert groups[3] == 1


def test_shingles_short_doc_empty(spark, docs):
    out = {r.doc_id: r.sh for r in docs.select("doc_id", T.shingles("text").alias("sh")).collect()}
    assert out[6] == []  # 2 tokens < k=3 → empty, not sequence-down garbage
    assert len(out[1]) > 5


def test_minhash_lsh_finds_planted_near_dup(spark, docs):
    cands = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_candidates(docs, num_hashes=16, bands=8).collect()
    }
    assert (1, 2) in cands  # exact dup always collides
    assert (1, 3) in cands  # near dup shares most shingles
    # the unrelated doc should not pair with everything
    assert (1, 4) not in cands


def test_ngram_jaccard_values(spark, docs):
    d = docs.select("doc_id", T.shingles("text").alias("sh"))
    a = d.filter("doc_id = 1").selectExpr("sh AS sh_a")
    for other, expect_high in ((2, True), (4, False)):
        b = d.filter(f"doc_id = {other}").selectExpr("sh AS sh_b")
        jac = a.crossJoin(b).select(D.ngram_jaccard(F.col("sh_a"), F.col("sh_b")).alias("j")).collect()[0].j
        if expect_high:
            assert jac == 1.0
        else:
            assert jac < 0.1


def test_simhash_near_dups_close_in_hamming(spark, docs):
    fp = {r.doc_id: r.f for r in docs.select("doc_id", D.simhash64("text").alias("f")).collect()}
    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert hamming(fp[1], fp[2]) == 0          # identical text
    assert hamming(fp[1], fp[3]) < hamming(fp[1], fp[4])  # near-dup closer


def test_brute_force_topk_self_similarity_excluded(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)], i % 3) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    topk = S.brute_force_topk(emb, emb.filter("vec_id = 0"), k=5)
    got = topk.collect()
    assert len(got) == 5
    assert all(r.vec_id != 0 for r in got)
    ranks = [r.rank for r in got]
    assert ranks == [1, 2, 3, 4, 5]
    sims = [r.cosine_sim for r in got]
    assert sims == sorted(sims, reverse=True)


def test_lsh_buckets_deterministic_and_partition_neighbors(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(40)]
    # plant a near-identical pair
    rows.append((100, [x + 0.001 for x in rows[0][1]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(4)]
    b1 = {r.vec_id: r.lsh_bucket for r in S.hyperplane_lsh_buckets(emb, planes).collect()}
    b2 = {r.vec_id: r.lsh_bucket for r in S.hyperplane_lsh_buckets(emb, planes).collect()}
    assert b1 == b2  # deterministic
    assert b1[0] == b1[100]  # near-identical vectors share a bucket


def test_quality_score_bounds(spark, docs):
    scores = [r.q for r in docs.select(T.quality_score("text").alias("q")).collect()]
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_language_guess(spark):
    rows = [(1, "the cat sat on the mat with the hat"), (2, "xyz abc def ghi jkl")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.g for r in df.select("doc_id", T.language_guess("text").alias("g")).collect()}
    assert out[1] == "en" and out[2] == "other"


def test_simhash_banding_finds_planted_near_dup(spark, docs, tmp_path):
    # run the full banded-candidate query shape over the planted docs
    import iceberg_hybrid_spark.queries.llm as L

    out = str(tmp_path / "docs.parquet")
    docs.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text")).write.parquet(out, mode="overwrite")

    # the query loads <sf_dir>/documents.parquet
    import os
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    os.rename(out, os.path.join(sf_dir, "documents.parquet"))
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in L.simhash_near_dup(spark, sf_dir).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 0  # identical docs
    assert all(h <= 3 for h in pairs.values())


def test_lsh_candidate_pairs_recall_and_sparsity(spark):
    import random

    rng = random.Random(11)
    dim = 32
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(60)]
    # plant 5 near-identical pairs (cosine ~0.9999)
    planted = set()
    for j in range(5):
        base = rows[j][1]
        rows.append((100 + j, [x + 0.001 * rng.gauss(0, 1) for x in base]))
        planted.add((j, 100 + j))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(64)]
    cands = {(r.id_a, r.id_b) for r in S.lsh_candidate_pairs(emb, planes, bands=16).collect()}
    assert planted <= cands  # every planted near-dup is a candidate
    n = len(rows)
    assert len(cands) < n * (n - 1) // 2  # never degenerates to all-pairs
    # deterministic for fixed planes
    again = {(r.id_a, r.id_b) for r in S.lsh_candidate_pairs(emb, planes, bands=16).collect()}
    assert cands == again


def test_sequence_packing_sharded_conserves_totals(spark):
    from collections import defaultdict

    from iceberg_hybrid_spark.queries.pipeline import sequence_packing

    sf_dir = "/root/testdata/sf0.001"
    base = sequence_packing(spark, sf_dir).collect()
    sharded = sequence_packing(spark, sf_dir, shards=4).collect()
    # per-language doc/token totals are invariant under sharding
    def totals(rows):
        t = defaultdict(lambda: [0, 0])
        for r in rows:
            t[r.lang][0] += r.doc_count
            t[r.lang][1] += r.bin_tokens
        return dict(t)
    assert totals(base) == totals(sharded)
    # bin ids stay globally dense per language: 0..max with no gaps
    bins = defaultdict(set)
    for r in sharded:
        bins[r.lang].add(r.bin)
    for lang, ids in bins.items():
        assert ids == set(range(len(ids))), lang


def test_embedding_near_dup_lsh_matches_exact_baseline(spark):
    """Pins the approximate contract of embedding_near_dup_pairs two
    ways: (a) on the committed corpus — which both queries augment with
    the _PLANT_SETS probe pairs at cosine ~0.94-0.99, so the relation is
    NON-empty — the LSH scale path returns exactly the brute-force
    baseline's pairs (banding recovers every above-threshold pair, and
    no false positives slip through), and (b) with additional planted
    near-identical vectors appended, every planted pair is recovered by
    the same seed-7/512-plane/32-band configuration the query uses
    (recall 1.0 on above-threshold pairs)."""
    import random

    from pyspark.sql import functions as F

    from iceberg_hybrid_spark.functions import similarity as S
    from iceberg_hybrid_spark.queries.llm import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_exact,
    )
    from iceberg_hybrid_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    lsh = {(r.id_a, r.id_b, r.cosine_sim)
           for r in embedding_near_dup_pairs(spark, sf).collect()}
    exact = {(r.id_a, r.id_b, r.cosine_sim)
             for r in embedding_near_dup_pairs_exact(spark, sf).collect()}
    assert lsh == exact

    # plant 5 near-identical pairs (tiny perturbation => cosine ~ 1)
    rng = random.Random(3)
    base_rows = []
    for i in range(5):
        v = [rng.gauss(0.0, 1.0) for _ in range(64)]
        w = [x + rng.gauss(0.0, 0.01) for x in v]
        base_rows.append((10_000 + 2 * i, v))
        base_rows.append((10_001 + 2 * i, w))
    planted = spark.createDataFrame(base_rows, "vec_id long, embedding array<double>")
    corpus = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    emb = corpus.unionByName(planted)

    rng = random.Random(7)  # the query's committed seed
    planes = [[rng.gauss(0.0, 1.0) for _ in range(64)] for _ in range(512)]
    cands = S.lsh_candidate_pairs_arrow(emb, planes, bands=32)
    v = emb.select("vec_id", S.as_double_array("embedding").alias("v"))
    found = {
        (r.id_a, r.id_b)
        for r in cands.join(
            v.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va")), "id_a"
        )
        .join(v.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .select("id_a", "id_b", S.cosine(F.col("va"), F.col("vb")).alias("c"))
        .filter(F.col("c") >= 0.8)
        .collect()
    }
    expected = {(10_000 + 2 * i, 10_001 + 2 * i) for i in range(5)}
    assert expected <= found


def test_semantic_dedup_victims_keep_closest_to_centroid(spark):
    # cluster 0 centered on e1: a sits on the centroid, b is a near-dup of
    # a but slightly rotated away -> b is the victim.  c/d in cluster 1 are
    # orthogonal-ish (below threshold) -> no victim.  e is a near-dup of a
    # but assigned to cluster 1, and cross-cluster pairs are never
    # generated -> SemDeDup's cluster-blindness, by design.
    rows = [
        (1, [1.0, 0.0, 0.0], 0),   # a: c2c = 1.0
        (2, [0.999, 0.04, 0.0], 0),  # b: cos(a,b) ~ 0.999, c2c < 1.0
        (3, [0.0, 1.0, 0.0], 1),   # c
        (4, [0.0, 0.0, 1.0], 1),   # d: cos(c,d) = 0
        (5, [1.0, 0.0, 0.01], 1),  # e: near-dup of a, wrong cluster
    ]
    assigned = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, ivf_centroid int"
    )
    centers = [[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]]
    victims = D.semantic_dedup_victims(assigned, centers, threshold=0.9)
    assert [(r.ivf_centroid, r.vec_id) for r in victims.collect()] == [(0, 2)]


def test_semantic_dedup_victims_tie_drops_larger_id(spark):
    # identical vectors => identical centroid distance => tie-break keeps
    # the smaller id deterministically
    rows = [(7, [1.0, 0.0], 0), (9, [1.0, 0.0], 0)]
    assigned = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, ivf_centroid int"
    )
    victims = D.semantic_dedup_victims(assigned, [[1.0, 0.0]], threshold=0.9)
    assert [r.vec_id for r in victims.collect()] == [9]


def test_hard_negative_mining_label_and_rank_contract(spark):
    """Every mined negative has a different label from its query; ranks
    are dense 1..5 per query in descending similarity; the result equals
    a pure-Python brute-force recompute."""
    from iceberg_hybrid_spark.queries.llm import hard_negative_mining

    sf = "/root/testdata/sf0.001"
    rows = hard_negative_mining(spark, sf).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.label != r.q_label
        by_q.setdefault(r.q_vec_id, []).append(r)
    assert set(by_q) == set(range(8))
    import math

    import pandas as pd

    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    vecs = {r.vec_id: list(map(float, r.embedding)) for r in emb.itertuples()}
    labels = {r.vec_id: r.label for r in emb.itertuples()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    for qid, got in by_q.items():
        assert [r.rank for r in got] == [1, 2, 3, 4, 5]
        sims = [r.cosine_sim for r in got]
        assert sims == sorted(sims, reverse=True)
        cand = sorted(
            (
                (round(cos(vecs[v], vecs[qid]), 6), -v)
                for v in vecs
                if labels[v] != labels[qid]
            ),
            reverse=True,
        )[:5]
        expect = [(-i, s) for s, i in cand]
        assert [(r.vec_id, r.cosine_sim) for r in got] == [
            (v, s) for v, s in expect
        ]


def test_ann_recall_curve_monotone_and_exact_at_full_probe(spark):
    """Recall@10 is non-decreasing in nprobe, and probing every list
    reproduces brute force exactly (IVF with nprobe = k_lists is an
    exact partition of the corpus)."""
    from iceberg_hybrid_spark.queries.llm import embedding_ann_recall_curve
    from iceberg_hybrid_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = embedding_ann_recall_curve(spark, sf).collect()
    by_q: dict[int, dict[int, float]] = {}
    for r in rows:
        assert 0.0 <= r.recall_at_10 <= 1.0
        by_q.setdefault(r.q_vec_id, {})[r.nprobe] = r.recall_at_10
    for q, curve in by_q.items():
        assert sorted(curve) == [1, 2, 4]
        assert curve[1] <= curve[2] <= curve[4]

    from pyspark.sql import functions as F

    from iceberg_hybrid_spark.functions import similarity as S

    emb = load_table(spark, sf, "embeddings")
    assigned, centers = S.ivf_build(emb, k=8, seed=42, cache_key=sf)
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
    bf = {
        (r.q_vec_id, r.rank): r.vec_id
        for r in S.brute_force_topk(emb, queries, k=10).collect()
    }
    full = {
        (r.q_vec_id, r.rank): r.vec_id
        for r in S.ivf_topk(assigned, centers, queries, k=10, nprobe=8).collect()
    }
    assert full == bf


def test_simhash128_lo_half_equals_simhash64(spark, docs):
    """The 128-bit form's lo half is the SAME vote fold over the SAME
    shingle stream as simhash64 — the wide fingerprint extends the
    narrow one, it does not replace its semantics."""
    rows = docs.select(
        D.simhash64("text").alias("f64"),
        D.simhash128("text").alias("f128"),
    ).collect()
    assert rows
    for r in rows:
        assert r.f128.lo == r.f64


def test_simhash128_band_structs_pigeonhole_complete():
    """Structural completeness of the 4x32-bit banding: flipping <= 3
    bits of a 128-bit fingerprint can corrupt at most 3 of the 4 bands,
    so at least one (band, key) pair must survive intact.  Mirrors the
    chunking in pure Python over seeded random fingerprints."""
    import random

    def chunks(lo, hi, band_bits=32):
        mask = (1 << band_bits) - 1
        per_half = 64 // band_bits
        out = []
        for i in range(2 * per_half):
            half = lo if i < per_half else hi
            out.append((i, ((half % (1 << 64)) >> (band_bits * (i % per_half))) & mask))
        return set(out)

    rng = random.Random(13)
    for _ in range(200):
        lo = rng.getrandbits(64)
        hi = rng.getrandbits(64)
        d = rng.randint(0, 3)
        positions = rng.sample(range(128), d)
        lo2, hi2 = lo, hi
        for p in positions:
            if p < 64:
                lo2 ^= 1 << p
            else:
                hi2 ^= 1 << (p - 64)
        assert chunks(lo, hi) & chunks(lo2, hi2), (
            f"no shared band after flipping {d} bits"
        )
    # 4 flips CAN corrupt all 4 bands (pigeonhole bound is tight):
    lo, hi = 0, 0
    lo2 = (1 << 0) | (1 << 32)
    hi2 = (1 << 0) | (1 << 32)
    assert not (chunks(lo, hi) & chunks(lo2, hi2))


def test_simhash128_band_structs_rejects_straddling_width():
    with pytest.raises(ValueError, match="must divide 64"):
        D.simhash128_band_structs(F.col("fp"), band_bits=24)
    with pytest.raises(ValueError, match="must divide 64"):
        D.simhash128_band_structs(F.col("fp"), band_bits=128)


def test_hamming128_matches_python_popcount(spark):
    rows = [
        (1, -5472158008196925944, 7546647441964032691),
        (2, -5472158008196925945, 7546647441964032691),
        (3, 0, 0),
    ]
    df = spark.createDataFrame(rows, "id long, lo long, hi long")
    a = df.select(
        "id", F.struct(F.col("lo"), F.col("hi")).alias("fp")
    ).alias("a")
    b = a.alias("b")
    got = {
        (r.ia, r.ib): r.h
        for r in a.crossJoin(b)
        .select(
            F.col("a.id").alias("ia"),
            F.col("b.id").alias("ib"),
            D.hamming128(F.col("a.fp"), F.col("b.fp")).alias("h"),
        )
        .collect()
    }

    def pop(x):
        return bin(x & ((1 << 64) - 1)).count("1")

    byid = {r[0]: (r[1], r[2]) for r in rows}
    for (ia, ib), h in got.items():
        lo_a, hi_a = byid[ia]
        lo_b, hi_b = byid[ib]
        assert h == pop(lo_a ^ lo_b) + pop(hi_a ^ hi_b)


def test_simhash128_band_width_knob_certifies_wider_distance():
    """band_bits=16 gives 8 bands certifying hamming <= 7 — the knob the
    calibration query turns.  Same pure-Python chunk mirror as the
    32-bit test, parameterized width."""
    import random

    def chunks(lo, hi, band_bits):
        mask = (1 << band_bits) - 1
        per_half = 64 // band_bits
        return {
            (i, ((lo if i < per_half else hi) % (1 << 64))
                >> (band_bits * (i % per_half)) & mask)
            for i in range(2 * per_half)
        }

    rng = random.Random(29)
    for _ in range(200):
        lo, hi = rng.getrandbits(64), rng.getrandbits(64)
        d = rng.randint(0, 7)
        lo2, hi2 = lo, hi
        for p in rng.sample(range(128), d):
            if p < 64:
                lo2 ^= 1 << p
            else:
                hi2 ^= 1 << (p - 64)
        assert chunks(lo, hi, 16) & chunks(lo2, hi2, 16), (
            f"no shared 16-bit band after flipping {d} bits"
        )
    # 8 flips CAN corrupt all 8 bands (bound is tight)
    lo2 = sum(1 << (16 * j) for j in range(4))
    hi2 = sum(1 << (16 * j) for j in range(4))
    assert not (chunks(0, 0, 16) & chunks(lo2, hi2, 16))


def test_simhash128_rel_matches_column_form_on_short_docs(spark):
    """Docs with < k tokens have no shingles: the Column form yields an
    all-zero fingerprint and the relational form must match — Spark's
    hash expressions SKIP null inputs (xxhash64(NULL, salt) is a
    non-null constant!), so the second hash stream must be explicitly
    null-gated or the hi half votes on the explode_outer placeholder
    row (caught by review, empirically divergent before the fix)."""
    rows = [
        (1, "a b"), (2, ""), (3, "only two"),
        (4, "the quick brown fox jumps"), (5, "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    col_form = {
        r.doc_id: (r.fp.lo, r.fp.hi)
        for r in df.select("doc_id", D.simhash128("text").alias("fp")).collect()
    }
    rel_form = {
        r.doc_id: (r.fp.lo, r.fp.hi)
        for r in D.simhash128_rel(df, "text", "doc_id").collect()
    }
    assert col_form == rel_form
    assert col_form[1] == (0, 0) and col_form[5] == (0, 0)
