"""Mergeable-sketch family (round 6 late): HyperLogLog cardinality,
Bloom membership, and KMV set-operation audits, each replicated
independently in pure Python (hashlib md5, the same estimator
arithmetic) against the Spark result.  The CMS sibling's invariant test
lives in test_bpe_and_index.py."""

import hashlib

import pandas as pd

SF = "/root/testdata/sf0.001"


def _shingles(text: str, k: int = 3) -> set[str]:
    w = text.split(" ")
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_hll_matches_reference_implementation(spark):
    """Pure-Python HLL replication: same md5-nibble 32-bit hash, same
    10/22 bucket/sub-bit split, same integer-numerator harmonic sum."""
    from iceberg_hybrid_spark.queries.pipeline import hll_distinct_audit

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    regs: dict[str, dict[int, int]] = {}
    exact: dict[str, set[str]] = {}
    for _, row in docs.iterrows():
        lang = row["lang"]
        for s in _shingles(row["text"]):
            exact.setdefault(lang, set()).add(s)
            h = _h32(s)
            bucket, w = h % 1024, h // 1024
            rho = 23 if w == 0 else 1 + ((w & -w).bit_length() - 1)
            r = regs.setdefault(lang, {})
            r[bucket] = max(r.get(bucket, 0), rho)

    got = {r["lang"]: r for r in hll_distinct_audit(spark, SF).collect()}
    assert set(got) == set(regs)
    alpha = 0.7213 / (1 + 1.079 / 1024.0)
    for lang, r in regs.items():
        snum = (1024 - len(r)) * 8388608 + sum(2 ** (23 - mr) for mr in r.values())
        est = alpha * 1024 * 1024 * 8388608 / snum
        row = got[lang]
        assert row["exact_distinct"] == len(exact[lang])
        assert row["empty_registers"] == 1024 - len(r)
        assert abs(row["hll_estimate"] - est) < 1e-3
        # the estimator itself must be in its advertised error regime:
        # sigma = 1.04/sqrt(1024) ~ 3.3%; allow 5 sigma
        assert abs(est / len(exact[lang]) - 1) < 0.17


def test_quantile_sketch_matches_reference_implementation(spark):
    """Pure-Python histogram-sketch replication: same 128 equi-width
    bins, same interpolated pick, same continuous-rank target."""
    from iceberg_hybrid_spark.queries.pipeline import quantile_sketch_audit

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["tc"] = docs["text"].str.split(" ").str.len().astype(float)

    got = {
        (r["lang"], r["q"]): r
        for r in quantile_sketch_audit(spark, SF).collect()
    }
    qs = (0.25, 0.5, 0.9, 0.99)
    assert set(got) == {
        (lang, q) for lang in docs["lang"].unique() for q in qs
    }
    for lang, grp in docs.groupby("lang"):
        vals = sorted(grp["tc"])
        n = len(vals)
        mn, mx = vals[0], vals[-1]
        width = max((mx - mn) / 128.0, 1e-9)
        hist: dict[int, int] = {}
        for v in vals:
            b = min(127, int((v - mn) // width))
            hist[b] = hist.get(b, 0) + 1
        for q in qs:
            t = 1.0 + q * (n - 1)
            cum = 0
            for b in sorted(hist):
                if cum + hist[b] >= t:
                    est = mn + width * (b + (t - cum) / hist[b])
                    break
                cum += hist[b]
            row = got[(lang, q)]
            assert row["n_docs"] == n
            assert abs(row["hist_estimate"] - est) < 0.02
            # exact side matches numpy's linear-interpolated percentile
            i = int(t) - 1
            frac = t - int(t)
            exact = vals[i] if frac == 0 else (
                vals[i] + frac * (vals[i + 1] - vals[i])
            )
            assert abs(row["exact_pctl"] - exact) < 0.02
            # the estimate lands inside the bin holding the rank-ceil(t)
            # value; exact interpolates toward rank floor(t), which can
            # sit one bin earlier — so two bin widths is the practical
            # bound (a pathological value gap could exceed it; these
            # fixtures do not)
            assert abs(row["hist_estimate"] - exact) <= 2 * width + 0.02


def test_kmv_matches_reference_implementation(spark):
    """Pure-Python KMV replication: same md5-nibble 32-bit values, same
    bottom-256 sketches, same union/intersection estimators."""
    from iceberg_hybrid_spark.queries.pipeline import kmv_source_overlap

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    vals: dict[str, set[int]] = {}
    for _, row in docs.iterrows():
        vals.setdefault(row["source"], set()).update(
            _h32(f"{s}:kmv") for s in _shingles(row["text"])
        )
    K = 256
    sketch = {src: set(sorted(v)[:K]) for src, v in vals.items()}

    got = {
        (r["src_a"], r["src_b"]): r
        for r in kmv_source_overlap(spark, SF).collect()
    }
    srcs = sorted(vals)
    assert set(got) == {
        (a, b) for i, a in enumerate(srcs) for b in srcs[i + 1 :]
    }
    for (a, b), row in got.items():
        exact_inter = len(vals[a] & vals[b])
        exact_union = len(vals[a] | vals[b])
        assert row["exact_union"] == exact_union
        assert row["exact_intersection"] == exact_inter
        un = sorted(sketch[a] | sketch[b])
        m = len(un)
        kept = un[:K]
        c = sum(1 for v in kept if v in sketch[a] and v in sketch[b])
        if m < K:
            u_est, i_est = float(m), float(c)
        else:
            u_est = 1095216660480.0 / (kept[-1] + 1.0)
            i_est = (c / 256.0) * u_est
        assert abs(row["kmv_union_est"] - u_est) < 0.02
        assert abs(row["kmv_intersection_est"] - i_est) < 0.02
        assert abs(row["kmv_jaccard_est"] - c / min(m, K)) < 1e-3
        # estimator sanity: union estimate within its error regime
        # (sigma ~ 1/sqrt(K-2) ~ 6.3%; allow 5 sigma)
        assert abs(u_est / exact_union - 1) < 0.32


def test_bloom_matches_reference_implementation(spark):
    """Pure-Python Bloom replication: same per-index md5 hash family,
    same 65536-bit array, exact non-member probes, k = 1..5 sweep."""
    from iceberg_hybrid_spark.queries.pipeline import bloom_fpr_audit

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    members: set[str] = set()
    others: set[str] = set()
    for _, row in docs.iterrows():
        (members if row["source"] == "src0" else others).update(
            _shingles(row["text"])
        )
    negatives = others - members

    def bit(s: str, j: int) -> int:
        return _h32(f"{s}#{j}") % 65536

    minj: dict[int, int] = {}
    for s in members:
        for j in range(5):
            b = bit(s, j)
            minj[b] = min(minj.get(b, 9), j)

    rows = {r["k"]: r for r in bloom_fpr_audit(spark, SF).collect()}
    assert sorted(rows) == [1, 2, 3, 4, 5]
    prev_bits = 0
    for k in range(1, 6):
        bitset = {b for b, j in minj.items() if j < k}
        fp = sum(
            1
            for s in negatives
            if all(bit(s, j) in bitset for j in range(k))
        )
        row = rows[k]
        assert row["n_member_shingles"] == len(members)
        assert row["bits_set"] == len(bitset)
        assert row["negatives_probed"] == len(negatives)
        assert row["false_positives"] == fp
        assert 0.0 <= row["observed_fpr"] <= 1.0
        assert abs(row["observed_fpr"] - fp / len(negatives)) < 1e-3
        # the bit array only gains bits as k grows
        assert len(bitset) >= prev_bits
        prev_bits = len(bitset)


def test_hll_ingest_state_merge_and_idempotence(spark, tmp_path):
    """Register-state maintenance: folding the corpus in as two halves
    plus a redelivered half yields EXACTLY the batch sketch over the
    whole corpus — mergeability and idempotence, the two properties the
    streaming path stands on."""
    from pyspark.sql import functions as F

    from iceberg_hybrid_spark.functions import sketch as SK
    from iceberg_hybrid_spark.functions import text as T
    from iceberg_hybrid_spark.lake.table import HyTable
    from iceberg_hybrid_spark.sources.tables import load_table
    from iceberg_hybrid_spark.streaming.ingest import (
        HLL_REGISTER_DDL,
        hll_ingest_batch,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "lang", "text")
    first = docs.filter("doc_id % 2 = 0")
    second = docs.filter("doc_id % 2 = 1")

    registers = HyTable(spark, str(tmp_path / "regs"))
    registers.create(spark.createDataFrame([], HLL_REGISTER_DDL))
    hll_ingest_batch(first, registers)
    hll_ingest_batch(second, registers)
    hll_ingest_batch(second, registers)  # redelivery — must be absorbed
    got = {
        (r["lang"], r["bucket"]): r["mr"] for r in registers.read().collect()
    }

    sh = docs.select("lang", F.explode(T.shingles("text", 3)).alias("s"))
    want = {
        (r["lang"], r["bucket"]): r["mr"]
        for r in SK.hll_registers(sh, "lang").collect()
    }
    assert got == want


def test_kmv_sketch_twin_matches_audit_form(spark):
    """The sketch-only production twin must produce the identical
    estimator columns as the audited form — the prune + verified
    fallback is result-invariant by construction."""
    from iceberg_hybrid_spark.queries.pipeline import (
        kmv_source_overlap,
        kmv_source_overlap_sketch,
    )

    audit = {
        (r["src_a"], r["src_b"]): r for r in kmv_source_overlap(spark, SF).collect()
    }
    sketch = {
        (r["src_a"], r["src_b"]): r
        for r in kmv_source_overlap_sketch(spark, SF).collect()
    }
    assert set(audit) == set(sketch)
    for k, s in sketch.items():
        a = audit[k]
        assert s["kmv_union_est"] == a["kmv_union_est"]
        assert s["kmv_intersection_est"] == a["kmv_intersection_est"]
        assert s["kmv_jaccard_est"] == a["kmv_jaccard_est"]


def test_kmv_sketch_fallback_rescans_underfull_source(spark, tmp_path):
    """A pathologically repetitive source (huge n_chars, tiny distinct
    shingle set) drives the n_chars upper bound far above its true
    distinct count, the threshold prunes everything below K survivors,
    and the verified fallback must rescan that source — the result must
    still equal the audited form's sketch columns."""
    import os

    from iceberg_hybrid_spark.queries.pipeline import (
        kmv_source_overlap,
        kmv_source_overlap_sketch,
    )

    rep = " ".join(["alpha beta gamma delta"] * 2000)  # ~4 distinct shingles
    rows = [(0, rep, "looper", "en", len(rep))]
    for i in range(1, 40):
        text = " ".join(f"w{i}x{j}" for j in range(60))
        rows.append((i, text, f"src{i % 3}", "en", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string, lang string, n_chars int"
    )
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    df.coalesce(1).write.parquet(os.path.join(sf_dir, "documents.parquet"))

    audit = {
        (r["src_a"], r["src_b"]): r
        for r in kmv_source_overlap(spark, sf_dir).collect()
    }
    sketch = {
        (r["src_a"], r["src_b"]): r
        for r in kmv_source_overlap_sketch(spark, sf_dir).collect()
    }
    assert set(audit) == set(sketch)
    assert any("looper" in k for k in sketch)
    for k, s in sketch.items():
        a = audit[k]
        assert s["kmv_union_est"] == a["kmv_union_est"]
        assert s["kmv_intersection_est"] == a["kmv_intersection_est"]
        assert s["kmv_jaccard_est"] == a["kmv_jaccard_est"]
