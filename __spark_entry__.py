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
    "token_route_policies",
    "png_pixel_stats",
    "media_exact_dedup",
    "avi_video_stats",
    "video_frame_dedup",
    # implementation changed this round — prior rows validated old code
    # (the sampled twins and pipeline_health moved from the fixed-25%-
    # fraction sample to the FIXED-SIZE derived threshold, mirrored in
    # their oracles; wav_decode gained truncated-chunk validation;
    # decode_media's real path was restructured for BMP/WAV/PNG; the
    # LM scorers pinned shuffle_hash on their corpus-model joins —
    # bigram_lm_quality is already below in the r6 cohort)
    "minhash_estimate_calibration_sampled",
    "dedup_modality_agreement_sampled",
    "kmv_source_overlap_sampled",
    "pipeline_health",
    "wav_audio_stats",
    "multimodal_decode_features",
    "unigram_logprob_quality",
    # last driver row: round 6 — the full remaining r6 cohort, retired
    # this round (registry declaration order)
    "bigram_pmi_collocations",
    "bigram_lm_quality",
    "streaming_hll_ingest",
    "inverted_index_stats",
    "doc_token_stats",
    "shingle_novelty_scores",
    "maximal_shared_spans",
    "streaming_interval_join",
    "q18_large_orders",
    "bpe_merge_candidates",
    "streaming_stateful_tracker",
    "order_value_percentiles",
    "bm25_doc_ranking",
    "incremental_view_maintenance",
    "data_constrained_epochs",
    "csv_ingest_stats",
    "quality_calibration_bins",
    "orc_roundtrip_stats",
    "jsonl_ingest_stats",
    "cdc_chunk_overlap",
    "hard_negative_mining",
    "customers_without_orders",
    "all_activity_keys_union",
    # last driver row: round 7 — the 15 stalest (registry declaration
    # order)
    "q8_national_market_share",
    "cluster_quality_canonicals",
    "multimodal_metadata",
    "window_function_showcase",
    "q11_important_parts",
    "multimodal_type_stats",
    "snapshot_lifecycle",
    "string_function_showcase",
    "q12_late_shipment_priority",
    "hourly_anomaly_flags",
    "video_frame_counts",
    "array_map_function_showcase",
    "q16_supplier_diversity",
    "asof_last_click_before_purchase",
    "incremental_dedup_new_docs",
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
