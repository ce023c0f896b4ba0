"""Driver-parity ANSI gate.

The grading driver runs Spark 4's default ANSI mode
(``spark.sql.ansi.enabled=true``); round 4 shipped a driver-red
``ARITHMETIC_OVERFLOW`` in the MinHash derived-hash family that 377
ANSI-off tests could not see.  This module (a) pins the shared session
to ANSI-on so the whole suite runs the stricter mode, and (b) runs the
highest-churn query family — near-dup dedup — end-to-end at sf0.001
under that session, asserting the candidate behavior the oracles rely
on.
"""

import pytest

from pyspark.sql import functions as F

from iceberg_hybrid_spark.functions import dedup as D

SF_DIR = "/root/testdata/sf0.001"


def test_session_is_ansi_on(spark):
    """The local gate must run the driver's mode.  If this fails, every
    other green test in the suite is evidence about the WRONG Spark
    dialect — do not weaken it to unblock a query; fix the query."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_minhash_signature_is_mode_independent(spark):
    """The derived-hash family must produce identical signatures under
    ANSI on and off — xxhash64(h, i) involves no overflow-capable
    arithmetic.  Guards against reintroducing an affine a*h+b family."""
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    sig_col = D.minhash_signature("text", num_hashes=8)
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    on = df.select(sig_col.alias("s")).collect()[0].s
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        off = df.select(sig_col.alias("s")).collect()[0].s
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")
    assert on == off


@pytest.mark.parametrize("query_name", [
    "minhash_near_dup",
    "near_dup_clusters",
    "simhash_near_dup",
    "simhash_hamming_calibration",
    "near_dup_shingle_pairs",
    "kmv_source_overlap_sketch",
])
def test_near_dup_family_runs_ansi_on(spark, query_name):
    """Each near-dup query executes (no ANSI arithmetic errors) and
    returns a plausible relation at sf0.001."""
    from iceberg_hybrid_spark.queries import all_specs

    rows = all_specs()[query_name].fn(spark, SF_DIR).collect()
    assert len(rows) > 0


def test_minhash_banding_recall_at_sf0001(spark):
    """Banding recall 1.0 on the committed corpus: every exact-Jaccard
    >= 0.3 pair (computed from the same hashed shingles, no LSH) must
    appear among the LSH candidates.  This is the property that makes
    the exact-relation oracle valid for ``minhash_near_dup``."""
    from iceberg_hybrid_spark.functions import text as T
    from iceberg_hybrid_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    cands = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_candidates(docs, num_hashes=32, bands=16).collect()
    }
    d = docs.select("doc_id", T.shingle_hashes("text").alias("sh"))
    exact = (
        d.alias("a")
        .join(d.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            D.ngram_jaccard(F.col("a.sh"), F.col("b.sh")).alias("j"),
        )
        .filter(F.col("j") >= 0.3)
        .collect()
    )
    assert len(exact) > 0
    missed = [(r.id_a, r.id_b) for r in exact if (r.id_a, r.id_b) not in cands]
    assert missed == []
