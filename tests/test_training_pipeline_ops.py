"""Semantic invariants for the round-5 training-run operators
(epoch shuffle / token-budget selection / source KL divergence) beyond
the DuckDB value oracle: determinism, permutation structure, budget
feasibility, and Gibbs non-negativity."""

from iceberg_hybrid_spark.functions import text as T
from iceberg_hybrid_spark.queries.llm import near_dup_threshold_sweep
from iceberg_hybrid_spark.queries.pipeline import (
    cross_split_contamination,
    curriculum_stages,
    dsir_importance_weights,
    epoch_shuffle,
    source_token_divergence,
    temperature_mix_weights,
    token_budget_selection,
)
from iceberg_hybrid_spark.sources.tables import load_table

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_epoch_shuffle_is_a_deterministic_permutation(spark):
    rows = epoch_shuffle(spark, SF_DIR).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append((r.pos, r.doc_id))
    assert set(by_epoch) == {0, 1}
    for epoch, entries in by_epoch.items():
        positions = [p for p, _ in entries]
        docs = [d for _, d in entries]
        assert positions == list(range(1, 101)), f"epoch {epoch} gaps"
        assert len(set(docs)) == 100, f"epoch {epoch} repeats a doc"
    # epochs draw from the same corpus but in genuinely different order
    assert by_epoch[0] != by_epoch[1]
    # md5 keying is deterministic: a second build returns the same plan
    again = epoch_shuffle(spark, SF_DIR).collect()
    assert sorted(rows) == sorted(again)


def test_token_budget_selection_respects_budget(spark):
    out = token_budget_selection(spark, SF_DIR).collect()
    assert out, "selection must be non-empty on the fixture corpus"
    total = sum(r.tokens_selected for r in out)
    n_sel = sum(r.n_selected for r in out)
    assert 0 < total <= 30_000
    corpus = (
        load_table(spark, SF_DIR, "documents")
        .select(T.token_count("text").cast("bigint").alias("tc"))
        .agg(F.sum("tc").alias("t"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    if corpus.t <= 30_000:
        # whole corpus fits: everything must be selected
        assert total == corpus.t and n_sel == corpus.n
    else:
        # greedy maximality: the selection stopped because the boundary
        # bucket ran out of budget, so a meaningful share is spent
        assert total > 30_000 * 0.5


def test_source_kl_divergence_is_nonnegative(spark):
    out = source_token_divergence(spark, SF_DIR).collect()
    assert len(out) > 1
    for r in out:
        assert r.n_tokens > 0
        # Gibbs' inequality: KL(source || corpus) >= 0 (4dp rounding slack)
        assert r.kl_divergence >= -0.0001, r
    # at least one source actually diverges from the blend
    assert any(r.kl_divergence > 0 for r in out)


def test_threshold_sweep_is_monotone(spark):
    rows = near_dup_threshold_sweep(spark, SF_DIR).collect()
    assert len(rows) >= 1
    # raising the threshold can only shrink the qualifying relation and
    # raise the mean similarity of what remains
    for lo, hi in zip(rows, rows[1:]):
        assert lo.threshold < hi.threshold
        assert lo.n_pairs >= hi.n_pairs
        assert lo.n_docs >= hi.n_docs
        assert lo.mean_jaccard <= hi.mean_jaccard + 1e-9
    for r in rows:
        # a pair touches at most 2 distinct docs, at least 1+ shared ones
        assert r.n_docs <= 2 * r.n_pairs
        assert r.mean_jaccard >= r.threshold - 1e-9


def test_curriculum_stages_partition_the_corpus(spark):
    rows = curriculum_stages(spark, SF_DIR).collect()
    assert [r.stage for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) >= 2
    # quality ranges are ordered and non-overlapping across stages
    for lo, hi in zip(rows, rows[1:]):
        assert lo.q_max <= hi.q_min
    # stage doc counts sum to the corpus and are roughly balanced
    # (bucket-granular boundaries can shift a stage by one tie-group)
    from iceberg_hybrid_spark.sources.tables import load_table

    n = load_table(spark, SF_DIR, "documents").count()
    counts = [r.n_docs for r in rows]
    assert sum(counts) == n
    assert max(counts) <= 2 * min(counts)


def test_dsir_weights_discriminate_the_target_domain(spark):
    rows = {r.source: r for r in dsir_importance_weights(spark, SF_DIR).collect()}
    assert "src0" in rows and len(rows) > 1
    target = rows["src0"]
    others = [r for s, r in rows.items() if s != "src0"]
    # the target domain must score itself higher than every other source
    assert all(target.mean_weight > r.mean_weight for r in others)
    # and attract the largest resample-in share
    assert target.n_positive >= max(r.n_positive for r in others)
    for r in rows.values():
        assert 0 <= r.n_positive <= r.n_docs


def test_temperature_mix_weights_flatten_toward_uniform(spark):
    rows = temperature_mix_weights(spark, SF_DIR).collect()
    assert len(rows) > 1
    for col in ("share", "w_alpha03", "w_alpha07"):
        s = sum(getattr(r, col) for r in rows)
        assert abs(s - 1.0) < 1e-3, (col, s)
    uniform = 1.0 / len(rows)
    for r in rows:
        # temperature flattening: alpha=0.3 sits strictly between the
        # natural share and uniform, and closer to uniform than alpha=0.7
        d_share = abs(r.share - uniform)
        d07 = abs(r.w_alpha07 - uniform)
        d03 = abs(r.w_alpha03 - uniform)
        assert d03 <= d07 + 1e-9 <= d_share + 2e-9, r


def test_cross_split_contamination_invariants(spark):
    out = {r.split: r for r in cross_split_contamination(spark, SF_DIR).collect()}
    # only eval splits appear; train is the reference side
    assert set(out) <= {"val", "test"} and out
    for r in out.values():
        # leak thresholds nest: >=0.8 implies >=0.5 implies >=0.2
        assert 0 <= r.leak80 <= r.leak50 <= r.leak20 <= r.eval_docs
        assert 0.0 <= r.mean_overlap <= 1.0
    # split sizes follow the ~97.7/1.2/1.2 fingerprint-prefix rule, so
    # eval sides are small but non-empty on the 500-doc fixture corpus
    assert sum(r.eval_docs for r in out.values()) > 0


def test_bm25_hand_computed_micro_corpus(spark):
    """BM25 arithmetic pinned against a hand-computed value on a 3-doc
    corpus (beyond the DuckDB oracle, which shares the formula)."""
    import math

    from iceberg_hybrid_spark.queries.pipeline import bm25_doc_ranking

    # Build via the same code path the query uses, but on a scratch dir
    # shaped like a sf dir is overkill — instead recompute the fixture's
    # top hit by hand from raw token counts.
    rows = bm25_doc_ranking(spark, SF_DIR).collect()
    assert len(rows) == 20
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    top = rows[0]
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: r.text.split(" ") for r in docs}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    terms = ("scan", "merge", "vector")
    df = {t: sum(1 for w in toks.values() if t in w) for t in terms}
    def bm25(doc_id):
        dl = len(toks[doc_id])
        s = 0.0
        for t in terms:
            tf = toks[doc_id].count(t)
            if not tf:
                continue
            idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        return round(s - 1e-9, 4)
    expect_top = max(toks, key=lambda d: (bm25(d), -d))
    assert top.doc_id == expect_top
    assert abs(top.bm25 - bm25(expect_top)) < 1e-9


def test_data_constrained_epochs_invariants(spark):
    """Effective tokens never exceed allocated, efficiency <= 1 and
    strictly < 1 exactly when a source repeats (epochs > 1), and the
    allocation spends the whole 4x budget."""
    from iceberg_hybrid_spark.queries.pipeline import data_constrained_epochs

    rows = data_constrained_epochs(spark, SF_DIR).collect()
    assert rows
    total_u = sum(r.unique_tokens for r in rows)
    total_alloc = sum(r.alloc_tokens for r in rows)
    assert abs(total_alloc - 4.0 * total_u) / (4.0 * total_u) < 1e-6
    for r in rows:
        assert r.effective_tokens <= r.alloc_tokens + 1e-6
        assert r.efficiency <= 1.0 + 1e-9
        if r.epochs > 1.0 + 1e-9:
            assert r.efficiency < 1.0
        else:
            assert abs(r.efficiency - 1.0) < 1e-9


def test_quality_calibration_bins_partition_the_corpus(spark):
    """Deciles 1..10 partition the corpus and sit in ascending quality
    order (the score-distribution binning is rank-consistent)."""
    from iceberg_hybrid_spark.queries.pipeline import quality_calibration_bins

    rows = quality_calibration_bins(spark, SF_DIR).collect()
    n_total = (
        load_table(spark, SF_DIR, "documents").count()
    )
    assert [r.decile for r in rows] == sorted(r.decile for r in rows)
    assert sum(r.n_docs for r in rows) == n_total
    qualities = [r.avg_quality for r in rows]
    assert qualities == sorted(qualities), "bins must ascend in quality"


def test_maximal_shared_spans_merges_planted_run(spark, tmp_path):
    """A planted 12-token shared run between two docs must surface as
    ONE maximal span of exactly 12 tokens, and a window shared by more
    than 8 documents must be excluded by the boilerplate df-cap."""
    import os

    from iceberg_hybrid_spark.queries.pipeline import maximal_shared_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    assert len(shared.split()) == 12
    boiler = "b1 b2 b3 b4 b5 b6 b7 b8"  # one 8-token window, in 10 docs
    rows = [
        (1, "xx", f"one unique prefix {shared} and a unique tail here one"),
        (2, "xx", f"two other start {shared} differing suffix tokens two"),
    ] + [
        (10 + i, "xx", f"filler{i} pad{i} {boiler} trail{i} more{i}")
        for i in range(10)
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id bigint, lang string, text string"
    ).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text")
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = maximal_shared_spans(spark, sf).collect()
    got = {(r.id_a, r.id_b): (r.longest_span_tokens, r.n_spans) for r in out}
    assert got.get((1, 2)) == (12, 1), got
    # the boilerplate window (df = 10 > 8) produces no pair rows
    assert all(a == 1 and b == 2 for a, b in got), got


def test_bpe_merge_candidates_counts(spark):
    from iceberg_hybrid_spark.queries.pipeline import bpe_merge_candidates

    rows = bpe_merge_candidates(spark, SF_DIR).collect()
    assert len(rows) == 20
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r.pair.split(" ")) == 2 for r in rows)
