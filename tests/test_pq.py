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


def _split(emb):
    return emb.filter(F.col("vec_id") % 10 != 7), emb.filter(
        F.col("vec_id") % 10 == 7
    )


def test_pq_append_serves_new_vectors_old_codes_untouched(spark, tmp_path):
    """The FAISS add() contract as lake appends: the delta is encoded
    with the FROZEN persisted codebooks, committed as one snapshot
    append; pre-append code rows and their data files are untouched;
    serving from fresh handles covers base + appended vectors and equals
    a from-scratch encode of the union against the same codebooks."""
    import os

    from iceberg_hybrid_spark.lake.table import HyTable

    emb = load_table(spark, SF_DIR, "embeddings")
    base, delta = _split(emb)
    coded, codebooks, sub = S.pq_build(base, m=M, k=K, seed=42)
    codes_t = HyTable(spark, str(tmp_path / "codes"))
    books_t = HyTable(spark, str(tmp_path / "books"))
    S.pq_write_index(coded, codebooks, codes_t, books_t)
    snap_before = codes_t.current_snapshot()
    rows_before = {
        r.vec_id: tuple(r[f"pq_code_{j}"] for j in range(M))
        for r in codes_t.read().collect()
    }

    n = S.pq_append_index(delta, codes_t, books_t)
    assert n == delta.count() > 0

    # old data files are present unchanged in the post-append manifest
    # (append never rewrites), and the pre-append rows are byte-identical
    snap_after = codes_t.current_snapshot()
    assert snap_after.operation == "append"
    before_files = {f.path for f in snap_before.manifest}
    after_files = {f.path for f in snap_after.manifest}
    assert before_files <= after_files
    rows_base_after = {
        r.vec_id: tuple(r[f"pq_code_{j}"] for j in range(M))
        for r in codes_t.read().collect()
        if r.vec_id in rows_before
    }
    assert rows_base_after == rows_before

    # serving from fresh handles includes appended vectors and equals a
    # from-scratch frozen-codebook encode of the union
    coded2, books2, sub2 = S.pq_read_index(
        HyTable(spark, str(tmp_path / "codes")),
        HyTable(spark, str(tmp_path / "books")),
    )
    queries = emb.filter(F.col("vec_id").isin(7, 8))
    got = S.pq_topk(coded2, books2, sub2, queries, k=5).collect()
    union_coded = S.pq_encode(emb, codebooks, sub)
    want = S.pq_topk(union_coded, codebooks, sub, queries, k=5).collect()
    key = lambda r: (r.q_vec_id, r.rank)  # noqa: E731
    assert sorted(
        [(r.q_vec_id, r.rank, r.vec_id, r.adc_dot) for r in got]
    ) == sorted([(r.q_vec_id, r.rank, r.vec_id, r.adc_dot) for r in want])
    # appended vectors are genuinely in the serving candidate set: a
    # deep-k pass must surface them (top-5 may or may not, the corpus
    # is random)
    deep = S.pq_topk(coded2, books2, sub2, queries, k=100).collect()
    assert any(r.vec_id % 10 == 7 for r in deep), "appended vectors served"

    # idempotent redelivery: the same delta appends nothing
    assert S.pq_append_index(delta, codes_t, books_t) == 0


def test_index_staleness_tracks_appends_and_resets_on_rebuild(spark, tmp_path):
    from iceberg_hybrid_spark.lake.table import HyTable

    emb = load_table(spark, SF_DIR, "embeddings")
    base, delta = _split(emb)
    coded, codebooks, sub = S.pq_build(base, m=M, k=K, seed=42)
    codes_t = HyTable(spark, str(tmp_path / "codes"))
    books_t = HyTable(spark, str(tmp_path / "books"))
    S.pq_write_index(coded, codebooks, codes_t, books_t)

    st0 = S.index_staleness(codes_t)
    assert st0["appended_rows"] == 0 and not st0["rebuild_recommended"]

    S.pq_append_index(delta, codes_t, books_t)
    st1 = S.index_staleness(codes_t, threshold=0.05)
    n_base, n_delta = base.count(), delta.count()
    assert st1["base_rows"] == n_base
    assert st1["appended_rows"] == n_delta
    assert abs(st1["staleness"] - n_delta / (n_base + n_delta)) < 1e-9
    assert st1["rebuild_recommended"]  # 10% > 5% threshold
    assert not S.index_staleness(codes_t, threshold=0.5)[
        "rebuild_recommended"
    ]

    # rebuild (atomic overwrite) resets the staleness base
    union_coded = S.pq_encode(emb, codebooks, sub)
    S.pq_write_index(union_coded, codebooks, codes_t, books_t)
    st2 = S.index_staleness(codes_t)
    assert st2["appended_rows"] == 0 and not st2["rebuild_recommended"]


def test_ivfpq_append_frozen_assignment_and_serving(spark, tmp_path):
    """IVF-PQ append: the delta is assigned to the nearest FROZEN
    centroid (pure argmin, pinned against a python replay) and encoded
    with frozen codebooks; fresh-handle serving equals a from-scratch
    frozen encode of the union."""
    import os

    from iceberg_hybrid_spark.lake.table import HyTable

    emb = load_table(spark, SF_DIR, "embeddings")
    base, delta = _split(emb)
    assigned, centers = S.ivf_build(base, k=8, seed=42)
    coded, codebooks, sub = S.pq_build(assigned, m=M, k=K, seed=42)
    root = tmp_path / "ivfpq"
    tables = [
        HyTable(spark, str(root / n)) for n in ("codes", "books", "centers")
    ]
    S.ivfpq_write_index(coded, centers, codebooks, *tables)

    n = S.ivfpq_append_index(delta, *tables)
    assert n == delta.count() > 0

    # frozen assignment == python argmin over the frozen centers
    got_assign = {
        r.vec_id: r.ivf_centroid
        for r in tables[0].read().collect()
        if r.vec_id % 10 == 7
    }
    for r in delta.collect():
        v = list(r.embedding)
        dists = [
            sum((x - c) ** 2 for x, c in zip(v, cent)) for cent in centers
        ]
        assert got_assign[r.vec_id] == dists.index(min(dists))

    coded2, centers2, books2, sub2 = S.ivfpq_read_index(*[
        HyTable(spark, str(root / n)) for n in ("codes", "books", "centers")
    ])
    queries = emb.filter(F.col("vec_id").isin(7, 8))
    got = S.ivfpq_topk(
        coded2, centers2, books2, sub2, queries, k=5, nprobe=8
    ).collect()
    union_assigned = S.assign_frozen_centers(
        emb.join(base.select("vec_id"), "vec_id", "left_anti"), centers
    )
    union_coded = S.pq_encode(union_assigned, codebooks, sub).drop(
        "embedding"
    ).unionByName(coded.drop("embedding"))
    want = S.ivfpq_topk(
        union_coded, centers, codebooks, sub, queries, k=5, nprobe=8
    ).collect()
    assert sorted(
        [(r.q_vec_id, r.rank, r.vec_id, r.adc_dot) for r in got]
    ) == sorted([(r.q_vec_id, r.rank, r.vec_id, r.adc_dot) for r in want])
    deep = S.ivfpq_topk(
        coded2, centers2, books2, sub2, queries, k=100, nprobe=8
    ).collect()
    assert any(r.vec_id % 10 == 7 for r in deep)


def test_appended_index_compaction_preserves_serving(spark, tmp_path):
    """Daily appends accumulate small code files; compaction
    (rewrite_data_files, the same maintenance the lake runs on data
    tables) must merge them without changing a single served result —
    completing the index lifecycle: build -> append* -> compact ->
    rebuild-when-stale.  The IVF-PQ form re-clusters by the inverted
    list on compaction (sort_by carried), so probe pruning survives
    too."""
    from iceberg_hybrid_spark.lake.table import HyTable

    emb = load_table(spark, SF_DIR, "embeddings")
    base, delta = _split(emb)
    assigned, centers = S.ivf_build(base, k=8, seed=42)
    coded, codebooks, sub = S.pq_build(assigned, m=M, k=K, seed=42)
    root = tmp_path / "ix"
    tables = [
        HyTable(spark, str(root / n)) for n in ("codes", "books", "centers")
    ]
    S.ivfpq_write_index(coded, centers, codebooks, *tables)
    # three append waves -> several small files
    for part in (
        delta.filter(F.col("vec_id") % 3 == 0),
        delta.filter(F.col("vec_id") % 3 == 1),
        delta.filter(F.col("vec_id") % 3 == 2),
    ):
        S.ivfpq_append_index(part, *tables)
    codes_t = tables[0]
    files_before = len(codes_t.current_snapshot().manifest)
    assert files_before >= 4  # base + 3 append waves

    queries = emb.filter(F.col("vec_id").isin(7, 8))

    def serve():
        c, ce, b, s_ = S.ivfpq_read_index(*[
            HyTable(spark, str(root / n))
            for n in ("codes", "books", "centers")
        ])
        return sorted(
            (r.q_vec_id, r.rank, r.vec_id, r.adc_dot)
            for r in S.ivfpq_topk(c, ce, b, s_, queries, k=5, nprobe=8).collect()
        )

    st_pre = S.index_staleness(codes_t)
    assert st_pre["appended_rows"] == delta.count()

    before = serve()
    snap = codes_t.rewrite_data_files(n_files=1, sort_by=["ivf_centroid"])
    assert snap.operation == "replace"
    assert len(codes_t.current_snapshot().manifest) < files_before
    assert serve() == before
    # compaction is a REPLACE, not a rebuild: the appended codes are
    # still frozen-codebook encodes of post-training data, so drift
    # accounting must survive the layout rewrite unchanged
    st_post = S.index_staleness(codes_t)
    assert st_post["appended_rows"] == st_pre["appended_rows"]
    assert st_post["staleness"] == st_pre["staleness"]


def test_pq_append_dedupes_within_batch(spark, tmp_path):
    """One at-least-once batch carrying the same id twice must append a
    single code row — neither copy is in the index yet, so the
    anti-join alone cannot catch it."""
    from iceberg_hybrid_spark.lake.table import HyTable

    emb = load_table(spark, SF_DIR, "embeddings")
    base, delta = _split(emb)
    coded, codebooks, sub = S.pq_build(base, m=M, k=K, seed=42)
    codes_t = HyTable(spark, str(tmp_path / "codes"))
    books_t = HyTable(spark, str(tmp_path / "books"))
    S.pq_write_index(coded, codebooks, codes_t, books_t)

    doubled = delta.unionByName(delta)  # verbatim within-batch redelivery
    assert S.pq_append_index(doubled, codes_t, books_t) == delta.count()
    per_id = (
        codes_t.read().groupBy("vec_id").count().filter("count > 1").count()
    )
    assert per_id == 0
