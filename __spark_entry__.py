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


# Static, deterministic priority order: queries that have not yet had an
# external correctness row (newest operators first), so a checker that
# samples a prefix of the registry validates the least-validated code.
# This is a fixed list committed with the code — the registry order never
# depends on runtime state or files outside the package.
_PRIORITY: tuple[str, ...] = (
    # lake / table-format operators
    "bucketed_colocated_join",
    "refs_listing",
    "spec_evolution_read",
    "sorted_write_pruned_read",
    "table_changelog_rows",
    "tag_time_travel_read",
    "tag_mor_pinned_read",
    "partitions_metadata_stats",
    "streaming_dedup_ingest",
    "merge_upsert_result",
    # embedding / similarity operators
    "embedding_topk_cosine",
    "embedding_multi_query_topk",
    "embedding_norm_stats",
    "embedding_lsh_ann",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_exact",
    "embedding_ivf_ann",
    "semantic_dedup_stats",
    "embedding_quantization_error",
    # dedup / pipeline operators
    "boilerplate_filter_report",
    "vocab_coverage_curve",
    "stratified_split_report",
    "span_duplication_report",
    "source_overlap_matrix",
    "cdc_chunk_overlap",
    "minhash_near_dup",
    "simhash_near_dup",
    "near_dup_clusters",
    "unigram_logprob_quality",
    "corpus_retention_funnel",
    "source_curation_report",
    "normalized_dedup_stats",
    "doc_length_percentiles",
    "bpe_token_budget",
    "mix_rebalance_plan",
    "array_map_function_showcase",
    # events operators
    "event_type_transitions",
    "events_json_props",
    "top_user_by_value_per_type",
    "error_rate_by_day",
    "skew_split_user_enrichment",
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
