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


def test_adc_serving_empty_query_batch_returns_empty(spark):
    """Zero-query serving batch: both ADC entry points must return an
    empty (q, id, adc_dot, rank) relation, not crash in plan building
    (reduce over zero union branches / explode of an empty literal
    array were analysis-time failures)."""
    (coded, codebooks, sub), emb = _build(spark)
    none = emb.filter(F.col("vec_id") < 0)
    out = S.pq_topk(coded, codebooks, sub, none, k=3)
    assert out.columns == ["q_vec_id", "vec_id", "adc_dot", "rank"]
    assert out.count() == 0
    assigned, centers = S.ivf_build(emb, k=8, seed=42, cache_key=SF_DIR)
    coded2, books2, sub2 = S.pq_build(
        assigned, m=M, k=K, seed=42, cache_key=SF_DIR + ":ivf"
    )
    out2 = S.ivfpq_topk(coded2, centers, books2, sub2, none, k=3)
    assert out2.columns == ["q_vec_id", "vec_id", "adc_dot", "rank"]
    assert out2.count() == 0


def test_adc_serving_batch_cap_enforced(spark):
    """The literal-ADC shape inlines |q|*m*k literals — fine for the
    bounded serving contract, pathological for bulk batches.  The cap
    must refuse loudly instead of building a huge Catalyst tree."""
    import pytest

    (coded, codebooks, sub), emb = _build(spark)
    bulk = emb.limit(S._ADC_MAX_QUERY_BATCH + 1)
    with pytest.raises(ValueError, match="literal-ADC cap"):
        S.pq_topk(coded, codebooks, sub, bulk, k=3)


def test_persisted_codes_keyed_by_upstream_content(spark):
    """persist_codes cache entries must be disjoint for pipelines that
    differ only in UPSTREAM parameters (same columns, same pq args):
    a pq_build over ivf_build(k=4) must not serve codes carrying
    ivf_build(k=8)'s centroid assignments (the silent-wrong-neighbor
    staleness mode)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    a8, _ = S.ivf_build(emb, k=8, seed=42, cache_key=SF_DIR + ":stale8")
    a4, _ = S.ivf_build(emb, k=4, seed=42, cache_key=SF_DIR + ":stale4")
    c8, _, _ = S.pq_build(
        a8, m=M, k=K, seed=42, cache_key="stale-test", persist_codes=True
    )
    c4, _, _ = S.pq_build(
        a4, m=M, k=K, seed=42, cache_key="stale-test", persist_codes=True
    )
    lists8 = {r.vec_id: r.ivf_centroid for r in c8.collect()}
    lists4 = {r.vec_id: r.ivf_centroid for r in c4.collect()}
    assert max(lists8.values()) > 3  # k=8 assignment really present
    assert max(lists4.values()) <= 3  # k=4 codes NOT aliased to k=8's


def test_pq_index_persists_across_fresh_handles(spark, tmp_path):
    """Build-once/read-many: the written code+codebook tables serve
    identically through FRESH table handles (a restarted driver), and a
    rebuild overwrites atomically instead of appending stale codes."""
    from iceberg_hybrid_spark.lake.table import HyTable

    (coded, codebooks, sub), emb = _build(spark)
    codes_t = HyTable(spark, str(tmp_path / "codes"))
    books_t = HyTable(spark, str(tmp_path / "books"))
    S.pq_write_index(coded, codebooks, codes_t, books_t)

    coded2, books2, sub2 = S.pq_read_index(
        HyTable(spark, str(tmp_path / "codes")),
        HyTable(spark, str(tmp_path / "books")),
    )
    assert books2 == [[list(map(float, c)) for c in b] for b in codebooks]
    assert sub2 == sub
    assert "embedding" not in coded2.columns  # raw vectors never persisted
    queries = emb.filter(F.col("vec_id").isin(0, 1))
    served_mem = sorted(
        map(tuple, S.pq_topk(coded, codebooks, sub, queries, k=5)
            .select("q_vec_id", "vec_id", "adc_dot", "rank").collect())
    )
    served_disk = sorted(
        map(tuple, S.pq_topk(coded2, books2, sub2, queries, k=5).collect())
    )
    assert served_mem == served_disk

    # rebuild: overwrite, not append — row count stays one-per-vector
    S.pq_write_index(coded, codebooks, codes_t, books_t)
    assert codes_t.read().count() == coded.count()
    assert books_t.read().count() == sum(len(b) for b in codebooks)


def test_ivfpq_index_persists_and_probe_filter_pushes_down(spark, tmp_path):
    """Persisted IVF-PQ: fresh-handle serving equals in-session serving,
    and the probe filter reaches the parquet scan of the persisted codes
    table (PushedFilters carries ivf_centroid IN) — with the codes
    written sorted by list id, footer stats skip unprobed lists."""
    from iceberg_hybrid_spark.lake.table import HyTable

    emb = load_table(spark, SF_DIR, "embeddings")
    assigned, centers = S.ivf_build(emb, k=8, seed=42, cache_key=SF_DIR)
    coded, codebooks, sub = S.pq_build(
        assigned, m=M, k=K, seed=42, cache_key=SF_DIR + ":ivfpersist"
    )
    tables = [HyTable(spark, str(tmp_path / n))
              for n in ("codes", "books", "centers")]
    S.ivfpq_write_index(coded, centers, codebooks, *tables)
    coded2, centers2, books2, sub2 = S.ivfpq_read_index(
        HyTable(spark, str(tmp_path / "codes")),
        HyTable(spark, str(tmp_path / "books")),
        HyTable(spark, str(tmp_path / "centers")),
    )
    assert centers2 == [[float(x) for x in c] for c in centers]
    assert "embedding" not in coded2.columns
    queries = emb.filter(F.col("vec_id").isin(0, 1))
    mem = sorted(map(tuple, S.ivfpq_topk(
        coded, centers, codebooks, sub, queries, k=5, nprobe=3).collect()))
    disk = sorted(map(tuple, S.ivfpq_topk(
        coded2, centers2, books2, sub2, queries, k=5, nprobe=3).collect()))
    assert mem == disk

    # probe filter reaches the persisted scan: isin on the sort column
    probed = coded2.filter(F.col("ivf_centroid").isin(1, 3))
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "ivf_centroid" in plan.split(
        "PushedFilters"
    )[1].splitlines()[0]
