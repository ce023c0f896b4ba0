"""Agreement-with-full-form tests for the sampled audit twins.

The three audit-wide calibrators (minhash_estimate_calibration,
dedup_modality_agreement, kmv_source_overlap) gained fixed-cost
production twins that run the identical query over the deterministic
hash-sample (sources.tables.sample_documents).  These tests pin the
relationship between sampled and full forms at the driver's check
scale: because sample membership is a pure function of doc_id and every
pair predicate depends only on its two endpoint documents, the sampled
pair relations must EQUAL the full relations restricted to sampled
endpoints — not merely approximate them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_hybrid_spark.queries.llm import (
    _dedup_modality_agreement,
    _minhash_near_dup,
    _simhash_near_dup,
    dedup_modality_agreement,
    dedup_modality_agreement_sampled,
    minhash_estimate_calibration,
    minhash_estimate_calibration_sampled,
)
from iceberg_hybrid_spark.queries.pipeline import (
    kmv_source_overlap,
    kmv_source_overlap_sampled,
)
from iceberg_hybrid_spark.sources.tables import (
    load_table,
    sample_documents,
)

SF_DIR = "/root/testdata/sf0.01"


def _sampled_ids(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return {
        r.doc_id for r in sample_documents(docs).select("doc_id").collect()
    }


def _fixed_size_ids(spark):
    """doc_ids the production twins actually sample: the FIXED-SIZE
    derived-threshold sample (at sf0.01, 500 docs < the 1200 target, so
    this is the whole corpus — the restriction proofs below therefore
    ALSO run at a derived sub-corpus target to stay non-trivial)."""
    from iceberg_hybrid_spark.sources.tables import (
        sample_documents_fixed_size,
    )

    docs = load_table(spark, SF_DIR, "documents")
    return {
        r.doc_id
        for r in sample_documents_fixed_size(docs).select("doc_id").collect()
    }


def test_sample_rate_and_determinism(spark):
    """The nibble-'3' sample keeps ~4/16 of documents, deterministically
    (two evaluations agree row-for-row)."""
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    ids1 = _sampled_ids(spark)
    ids2 = _sampled_ids(spark)
    assert ids1 == ids2
    # binomial(n, 1/4): allow a generous band around the expectation
    assert 0.15 * n <= len(ids1) <= 0.35 * n


def test_minhash_pairs_sampled_equals_full_restricted(spark):
    """MinHash-LSH near-dup pairs over the sampled corpus == the full
    pair relation restricted to both-endpoint-sampled pairs (banding
    and the Jaccard verify are per-pair)."""
    docs = load_table(spark, SF_DIR, "documents")
    ids = _sampled_ids(spark)
    full = {
        (r.id_a, r.id_b)
        for r in _minhash_near_dup(docs).select("id_a", "id_b").collect()
    }
    sampled = {
        (r.id_a, r.id_b)
        for r in _minhash_near_dup(sample_documents(docs))
        .select("id_a", "id_b")
        .collect()
    }
    assert sampled == {
        (a, b) for a, b in full if a in ids and b in ids
    }


def test_simhash_pairs_sampled_equals_full_restricted(spark):
    docs = load_table(spark, SF_DIR, "documents")
    ids = _sampled_ids(spark)
    full = {
        (r.doc_a, r.doc_b)
        for r in _simhash_near_dup(docs).select("doc_a", "doc_b").collect()
    }
    sampled = {
        (r.doc_a, r.doc_b)
        for r in _simhash_near_dup(sample_documents(docs))
        .select("doc_a", "doc_b")
        .collect()
    }
    assert sampled == {
        (a, b) for a, b in full if a in ids and b in ids
    }


def test_agreement_matrix_sampled_is_restriction_of_full(spark):
    """Recompute the FULL agreement matrix restricted to sampled pairs
    driver-side from the full flag relations and assert the sampled
    query reports exactly that matrix (the twins sample at the derived
    fixed-size threshold, so the restriction set is the fixed-size
    sample's ids)."""
    docs = load_table(spark, SF_DIR, "documents")
    ids = _fixed_size_ids(spark)

    def pairs(df, ca, cb):
        return {(r[ca], r[cb]) for r in df.select(ca, cb).collect()}

    fp = docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("f"))
    ex = {
        (r.id_a, r.id_b)
        for r in fp.alias("a")
        .join(
            fp.alias("b"),
            (F.col("a.f") == F.col("b.f"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .collect()
    }
    mh = pairs(_minhash_near_dup(docs), "id_a", "id_b")
    sh = pairs(_simhash_near_dup(docs), "doc_a", "doc_b")
    keep = lambda s: {(a, b) for a, b in s if a in ids and b in ids}  # noqa: E731
    ex, mh, sh = keep(ex), keep(mh), keep(sh)
    expected = {}
    for p in ex | mh | sh:
        key = (int(p in ex), int(p in mh), int(p in sh))
        expected[key] = expected.get(key, 0) + 1

    got = {
        (r.in_exact, r.in_minhash, r.in_simhash): r.pair_count
        for r in dedup_modality_agreement_sampled(spark, SF_DIR).collect()
    }
    assert got == expected


def test_agreement_sampled_cells_bounded_by_full(spark):
    """Every sampled agreement cell is <= the full form's cell (the
    sampled universe is a subset of the full universe)."""
    full = {
        (r.in_exact, r.in_minhash, r.in_simhash): r.pair_count
        for r in dedup_modality_agreement(spark, SF_DIR).collect()
    }
    sampled = {
        (r.in_exact, r.in_minhash, r.in_simhash): r.pair_count
        for r in dedup_modality_agreement_sampled(spark, SF_DIR).collect()
    }
    for key, n in sampled.items():
        assert n <= full.get(key, 0), (key, n, full.get(key))


def test_minhash_calibration_sampled_subset_and_consistency(spark):
    """The sampled calibration's bins are populated from a subset of the
    full form's pair population: per bin, pair_count <= full pair_count,
    and the measured error never exceeds the full form's max for that
    bin (the sampled pairs ARE full-form pairs, so the per-bin max |err|
    is bounded by the full per-bin max)."""
    full = {
        r.j_bin: r for r in minhash_estimate_calibration(spark, SF_DIR).collect()
    }
    sampled = minhash_estimate_calibration_sampled(spark, SF_DIR).collect()
    assert sampled, "sampled calibration produced no bins"
    for r in sampled:
        assert r.j_bin in full
        f = full[r.j_bin]
        assert r.pair_count <= f.pair_count
        assert r.max_abs_err <= f.max_abs_err + 1e-9


def test_kmv_sampled_exact_sides_bounded_by_full(spark):
    """Sampled per-source shingle sets are subsets of the full sets, so
    the sampled audit's exact union/intersection are <= the full
    audit's, pair for pair; and the sketch estimate still tracks the
    sampled exact truth within KMV's error envelope."""
    full = {
        (r.src_a, r.src_b): r for r in kmv_source_overlap(spark, SF_DIR).collect()
    }
    sampled = kmv_source_overlap_sampled(spark, SF_DIR).collect()
    assert sampled, "sampled audit produced no pairs"
    for r in sampled:
        f = full.get((r.src_a, r.src_b))
        assert f is not None, (r.src_a, r.src_b)
        assert r.exact_union <= f.exact_union
        assert r.exact_intersection <= f.exact_intersection
        # KMV union estimate: relative error ~1/sqrt(K)=6.25% at K=256;
        # 5-sigma bound (the estimator arithmetic itself is certified
        # equal to the audited form by the r9 property test)
        if r.exact_union > 0:
            assert abs(r.kmv_union_est - r.exact_union) <= max(
                0.35 * r.exact_union, 32
            ), (r.src_a, r.src_b, r.kmv_union_est, r.exact_union)


def test_sampled_twins_registered_with_oracles():
    from iceberg_hybrid_spark.queries import all_specs

    specs = all_specs()
    for name in (
        "minhash_estimate_calibration_sampled",
        "dedup_modality_agreement_sampled",
        "kmv_source_overlap_sampled",
    ):
        assert name in specs
        assert specs[name].oracle


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_multi_nibble_prefix_matches_duckdb(spark):
    """The tightened-threshold knob (multi-char hex prefix — the form a
    growing corpus uses to hold sample SIZE fixed) selects identical
    doc_id sets in Spark and DuckDB, and tighter prefixes nest."""
    import duckdb

    from iceberg_hybrid_spark.sources.tables import duck_doc_sample_where

    docs = load_table(spark, SF_DIR, "documents")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    prev = None
    for nib in ("00", "0a", "3", "7f"):
        got = {
            r.doc_id for r in sample_documents(docs, nib).select("doc_id").collect()
        }
        want = {
            r[0]
            for r in con.execute(
                "SELECT doc_id FROM documents WHERE "
                + duck_doc_sample_where(nibble=nib)
            ).fetchall()
        }
        assert got == want, nib
        if prev is not None and len(nib) >= len(prev[0]):
            # a lexicographically tighter threshold of >= length nests
            if nib.startswith(prev[0]) or nib <= prev[0]:
                assert got <= prev[1] or prev[1] <= got
        prev = (nib, got)


def test_nibble_for_target_rates():
    from iceberg_hybrid_spark.sources.tables import nibble_for_target

    assert nibble_for_target(1000, 2000) == "ffffffff"   # rate > 1
    assert nibble_for_target(0, 10) == "ffffffff"
    assert nibble_for_target(2**32, 1) == "00000000"  # one bucket floor
    # a quarter of the corpus -> the first 2^30 of 2^32 buckets
    assert nibble_for_target(4000, 1000) == "3fffffff"
    # a 10^9-doc corpus at target 1200: 2^32*1200 // 10^9 = 5153
    # buckets -> threshold 5152 = 0x1420 (independent concrete
    # expectation, not a recompute of the implementation's formula)
    assert nibble_for_target(10**9, 1200) == "00001420"
    # half the corpus -> the first 2^31 buckets
    assert nibble_for_target(1000, 500) == "7fffffff"


def test_nibble_for_target_selects_near_target(spark):
    from iceberg_hybrid_spark.sources.tables import nibble_for_target

    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    nib = nibble_for_target(n, n // 4)
    got = sample_documents(docs, nib).count()
    assert 0.1 * n <= got <= 0.4 * n  # binomial band around n/4


def test_pipeline_health_equals_union_of_heads(spark):
    """The dashboard composite must stay exactly the reshaped union of
    its four head queries (the oracle pins this against DuckDB; this
    pins it Spark-side so a head edit can't silently diverge from the
    composite's inlined copy)."""
    from iceberg_hybrid_spark.queries.events import ewma_hourly_baseline
    from iceberg_hybrid_spark.queries.pipeline import (
        pipeline_health,
        source_psi_drift,
    )

    got = {
        (r.tag, r.metric): (r.value, r.alert)
        for r in pipeline_health(spark, SF_DIR).collect()
    }
    expected = {}
    for r in ewma_hourly_baseline(spark, SF_DIR).collect():
        expected[("ewma_burst", f"{r.event_type}@{r.hour_start}")] = (
            r.burst_score, r.is_burst,
        )
    for r in source_psi_drift(spark, SF_DIR).collect():
        expected[("psi_drift", r.source)] = (r.psi, int(r.psi > 0.2))
    for r in minhash_estimate_calibration_sampled(spark, SF_DIR).collect():
        expected[("minhash_calibration", f"bin_{r.j_bin}")] = (
            r.mean_abs_err, int(r.mean_abs_err > 0.0883),
        )
    for r in dedup_modality_agreement_sampled(spark, SF_DIR).collect():
        expected[(
            "dedup_agreement",
            f"e{r.in_exact}m{r.in_minhash}s{r.in_simhash}",
        )] = (
            float(r.pair_count),
            int(r.in_exact + r.in_minhash + r.in_simhash == 1),
        )
    # media head (r12): closed forms over the SAME fixed-size sample —
    # the 1-in-7 truncated PNGs all fail decode; payloads are
    # byte-identical exactly within a doc_id % 261 class
    from iceberg_hybrid_spark.sources.tables import (
        load_table,
        sample_documents_fixed_size,
    )

    dids = [
        r.doc_id
        for r in sample_documents_fixed_size(
            load_table(spark, SF_DIR, "documents")
        ).select("doc_id").collect()
    ]
    err = sum(1 for d in dids if d % 7 == 3) / len(dids)
    dup = 1 - len({d % 261 for d in dids}) / len(dids)
    expected[("media_health", "png_decode_error_rate")] = (
        round(err - 1e-9, 4) + 0.0, int(err > 0.1),
    )
    expected[("media_health", "png_dup_rate")] = (
        round(dup - 1e-9, 4) + 0.0, int(dup > 0.5),
    )
    assert got == expected


def test_fixed_size_predicate_matches_duckdb_across_scales(spark):
    """The FIXED-SIZE sample predicate — threshold derived from the
    corpus count in Python (nibble_for_target over docs.count()) and in
    SQL (scalar subquery over COUNT(*)) — selects IDENTICAL doc_id sets
    in Spark and DuckDB at both check scales, including sf0.1 where the
    derived 8-hex threshold ('3d70a3d6') is non-trivial."""
    import duckdb

    from iceberg_hybrid_spark.sources.tables import (
        duck_doc_sample_where_fixed_size,
        sample_documents_fixed_size,
    )

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        docs = load_table(spark, sf_dir, "documents")
        got = {
            r.doc_id
            for r in sample_documents_fixed_size(docs)
            .select("doc_id")
            .collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        want = {
            r[0]
            for r in con.execute(
                "SELECT doc_id FROM documents WHERE "
                + duck_doc_sample_where_fixed_size()
            ).fetchall()
        }
        assert got == want, sf_dir
        n = docs.count()
        if n <= 1200:
            assert len(got) == n  # below target: the whole corpus
        else:
            # binomial band around the 1200-doc target
            assert 900 <= len(got) <= 1500, len(got)


def test_fixed_size_sample_stays_fixed_as_corpus_grows():
    """The derived threshold holds the EXPECTED sample size in a tight
    band around the target across 5 orders of magnitude of corpus
    growth — the property that makes the scheduled monitors fixed-cost
    at 100 TB (a fixed fraction would grow 200,000x over this range)."""
    from iceberg_hybrid_spark.sources.tables import nibble_for_target

    target = 1200
    for n in (5_000, 320_000, 5_000_000, 100_000_000, 1_000_000_000):
        nib = nibble_for_target(n, target)
        buckets = int(nib, 16) + 1
        expected = n * buckets / 4294967296.0
        # floor quantization can only LOWER the expectation; one bucket
        # is worth n/2^32 docs, so the expectation sits within a single
        # document of the target across the whole range
        assert expected <= target, (n, nib, expected)
        assert expected >= target - n / 4294967296.0 - 1, (n, nib, expected)
        assert expected >= target - 2, (n, nib, expected)


def test_agreement_matrix_restriction_nontrivial_derived_threshold(spark):
    """The restriction property at a derived threshold that actually
    samples (target = corpus/4 at sf0.01): the agreement matrix over
    the derived-threshold sample equals the full matrix restricted to
    sampled endpoints — the same set-equality proof the production
    twins rely on, exercised where the sample is a strict subset."""
    from iceberg_hybrid_spark.queries.llm import _dedup_modality_agreement
    from iceberg_hybrid_spark.sources.tables import nibble_for_target

    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    nib = nibble_for_target(n, n // 4)
    sampled_docs = sample_documents(docs, nib)
    ids = {r.doc_id for r in sampled_docs.select("doc_id").collect()}
    assert 0 < len(ids) < n  # strict subset: the proof is non-trivial

    def pairs(df, ca, cb):
        return {(r[ca], r[cb]) for r in df.select(ca, cb).collect()}

    fp = docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("f"))
    ex = {
        (r.id_a, r.id_b)
        for r in fp.alias("a")
        .join(
            fp.alias("b"),
            (F.col("a.f") == F.col("b.f"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .collect()
    }
    mh = pairs(_minhash_near_dup(docs), "id_a", "id_b")
    sh = pairs(_simhash_near_dup(docs), "doc_a", "doc_b")
    keep = lambda s: {(a, b) for a, b in s if a in ids and b in ids}  # noqa: E731
    ex, mh, sh = keep(ex), keep(mh), keep(sh)
    expected = {}
    for p in ex | mh | sh:
        key = (int(p in ex), int(p in mh), int(p in sh))
        expected[key] = expected.get(key, 0) + 1

    got = {
        (r.in_exact, r.in_minhash, r.in_simhash): r.pair_count
        for r in _dedup_modality_agreement(sampled_docs).collect()
    }
    assert got == expected
