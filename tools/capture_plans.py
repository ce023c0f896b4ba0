"""Regenerate docs/PLANS.md — formatted physical plans for key queries."""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

from iceberg_hybrid_spark.queries import all_specs  # noqa: E402
from iceberg_hybrid_spark.session import get_spark  # noqa: E402

QUERIES = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "revenue_by_nation",
    "parts_never_ordered",
    "q4_priority_late_orders",
    "q13_customer_distribution",
    "near_dup_shingle_pairs",
    "embedding_topk_cosine",
    "benchmark_contamination",
    "boilerplate_ngrams",
    "sequence_packing",
    "domain_mix_sample",
    "unigram_logprob_quality",
    "near_dup_clusters",
    "bucketed_colocated_join",
    "embedding_near_dup_pairs",
    "q2_min_cost_supplier",
    "q15_top_supplier",
    "semantic_dedup_stats",
    "source_curation_report",
    "span_duplication_report",
    "source_overlap_matrix",
    "embedding_lsh_ann",
    "minhash_near_dup",
    "simhash_near_dup",
    "cdc_chunk_overlap",
    # round-5 training-run operators
    "cross_split_contamination",
    "near_dup_threshold_sweep",
    "curriculum_stages",
    "temperature_mix_weights",
    "embedding_pq_ann",
    "embedding_ivfpq_ann",
    "epoch_shuffle",
    "token_budget_selection",
    "source_token_divergence",
    # round-6 operators
    "bm25_doc_ranking",
    "data_constrained_epochs",
    "quality_calibration_bins",
    "maximal_shared_spans",
    "bpe_merge_candidates",
    # round-6 late additions
    "jsonl_ingest_stats",
    "bpe_merge_rounds",
    "bigram_lm_quality",
    "inverted_index_stats",
    "shingle_novelty_scores",
    "cluster_quality_canonicals",
    "weighted_corpus_sample",
    "cms_token_counts",
    "hll_distinct_audit",
    "bloom_fpr_audit",
    "kmv_source_overlap",
    "kmv_source_overlap_sketch",
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
    "read_route_scores",
    "embedding_pq_ann_appended",
    "lease_gc_floor",
    "quantile_sketch_audit",
    "bpe_tokenize_fertility",
    "hard_negative_mining",
    "bigram_pmi_collocations",
    "embedding_ann_recall_curve",
    "textrank_keywords",
    "event_type_drift",
    "events_hourly_gapfilled",
    "hourly_anomaly_flags",
    "daily_trend_slopes",
    "view_to_purchase_latency",
    "part_affinity_rules",
    "csv_ingest_stats",
    "orc_roundtrip_stats",
    "incremental_view_maintenance",
    "key_skew_profile",
    "rfm_customer_segments",
    # round 7
    "fk_integrity_audit",
    "embedding_dim_truncation_recall",
    "range_write_plan",
    "jaccard_prefix_filter_pairs",
    # round 8
    "embedding_pq_ann_persisted",
    "embedding_ivfpq_ann_persisted",
    "backpressure_budget_trajectory",
    # round 10 sampled audit twins
    "minhash_estimate_calibration_sampled",
    "dedup_modality_agreement_sampled",
    "kmv_source_overlap_sampled",
    # round 10 composites and codec paths
    "verify_promote_orphans",
    "pipeline_health",
    "bmp_pixel_stats",
    "wav_audio_stats",
    # round 11-12 codec paths + dedup composites
    "png_pixel_stats",
    "avi_video_stats",
    "media_exact_dedup",
    "video_frame_dedup",
    "jpeg_pixel_stats",
    "mjpg_video_stats",
]

HEADER = """# Physical plan audit (sf0.1, AQE on)

Captured via .explain("formatted"); evidence that filters/projections
push into the parquet scans, dimension joins broadcast, anti-joins use
broadcast hash, and top-k compiles to TakeOrderedAndProject.  Regenerate
with: python tools/capture_plans.py
"""


def main() -> None:
    spark = get_spark("plans")
    specs = all_specs()
    out = [HEADER, "```"]
    for name in QUERIES:
        df = specs[name].fn(spark, "/root/testdata/sf0.1")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        tree, _, details = text.partition("\n\n")
        out.append(f"===== {name} =====")
        out.append(tree)
        for line in details.splitlines():
            ls = line.strip()
            if ls.startswith(("PushedFilters", "ReadSchema", "Location")):
                out.append("    " + ls[:160])
        out.append("")
    out.append("```")
    with open("/root/repo/docs/PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print("wrote docs/PLANS.md")


if __name__ == "__main__":
    main()
