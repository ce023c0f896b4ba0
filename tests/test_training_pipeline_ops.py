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
