"""Product-quantization invariants: code completeness, ADC arithmetic
(the score IS the reconstructed dot product), determinism, and ranking
structure.  Value agreement with DuckDB is the pinned-literal oracle
(tools/gen_pq_oracle.py)."""

from iceberg_hybrid_spark.functions import similarity as S
from iceberg_hybrid_spark.sources.tables import load_table

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"
M, K = 4, 16


def _build(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    return S.pq_build(emb, m=M, k=K, seed=42, cache_key=SF_DIR), emb


def test_pq_codes_complete_and_in_range(spark):
    (coded, codebooks, sub), emb = _build(spark)
    assert len(codebooks) == M
    assert all(len(book) == K for book in codebooks)
    assert all(len(cv) == sub for book in codebooks for cv in book)
    n = emb.count()
    checks = coded.select(
        *[F.col(f"pq_code_{j}").between(0, K - 1).alias(f"ok{j}") for j in range(M)]
    )
    assert checks.filter(~F.col("ok0") | ~F.col("ok1") | ~F.col("ok2") | ~F.col("ok3")).count() == 0
    assert coded.count() == n


def test_pq_adc_equals_reconstructed_dot(spark):
    (coded, codebooks, sub), emb = _build(spark)
    queries = emb.filter(F.col("vec_id").isin(0, 1))
    out = S.pq_topk(coded, codebooks, sub, queries, k=3).collect()
    q_vecs = {
        r.vec_id: list(r.embedding)
        for r in emb.filter(F.col("vec_id").isin(0, 1)).collect()
    }
    codes = {
        r.vec_id: [r[f"pq_code_{j}"] for j in range(M)]
        for r in coded.filter(
            F.col("vec_id").isin([r.vec_id for r in out])
        ).collect()
    }
    for r in out:
        q = q_vecs[r.q_vec_id]
        recon = [x for j in range(M) for x in codebooks[j][codes[r.vec_id][j]]]
        expect = sum(a * b for a, b in zip(q, recon))
        assert abs(r.adc_dot - round(expect, 6)) < 1e-6, r


def test_ivfpq_candidates_come_from_probed_lists_only(spark):
    import math

    emb = load_table(spark, SF_DIR, "embeddings")
    assigned, centers = S.ivf_build(emb, k=8, seed=42, cache_key=SF_DIR)
    coded, codebooks, sub = S.pq_build(assigned, m=M, k=K, seed=42, cache_key=SF_DIR)
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
    out = S.ivfpq_topk(coded, centers, codebooks, sub, queries, k=5, nprobe=3).collect()
    assert out

    def cos(a, b):
        dp = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dp / (na * nb) if na and nb else 0.0

    q_vecs = {r.vec_id: list(r.embedding) for r in queries.collect()}
    probes = {
        q: set(
            sorted(range(len(centers)), key=lambda c: (-cos(v, centers[c]), c))[:3]
        )
        for q, v in q_vecs.items()
    }
    lists = {r.vec_id: r.ivf_centroid for r in coded.select("vec_id", "ivf_centroid").collect()}
    for r in out:
        # every served neighbor must live in one of ITS query's probed lists
        assert lists[r.vec_id] in probes[r.q_vec_id], r
        assert r.vec_id != r.q_vec_id
    # IVF-PQ is a strict restriction of PQ: its neighbor set per query is
    # a subset of full-corpus ADC ranking's candidate universe by design,
    # and scores agree with plain PQ ADC for shared (q, vec) pairs
    pq_out = {
        (r.q_vec_id, r.vec_id): r.adc_dot
        for r in S.pq_topk(coded, codebooks, sub, queries, k=500).collect()
    }
    for r in out:
        assert pq_out[(r.q_vec_id, r.vec_id)] == r.adc_dot, r


def test_pq_topk_ranking_structure_and_determinism(spark):
    (coded, codebooks, sub), emb = _build(spark)
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
    rows = S.pq_topk(coded, codebooks, sub, queries, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_vec_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        # self never appears; scores non-increasing along the ranking
        assert all(r.vec_id != q for r in rs)
        scores = [r.adc_dot for r in rs]
        assert scores == sorted(scores, reverse=True)
    again = S.pq_topk(coded, codebooks, sub, queries, k=5).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
