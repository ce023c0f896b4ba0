"""Capture .explain("formatted") for the r12 optimization targets.

Usage: python tools/capture_r12_plans.py <suffix> [query ...]
Writes plans/r12/<query>_<suffix>.txt for each query (default: the
top-cost set from BENCH_DETAIL).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")

from iceberg_hybrid_spark.queries import all_specs  # noqa: E402
from iceberg_hybrid_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "pipeline_health",
    "media_exact_dedup",
    "streaming_frame_dedup_replay",
    "dedup_modality_agreement",
    "dedup_modality_agreement_sampled",
    "embedding_pq_ann_appended",
    "jaccard_prefix_filter_pairs",
    "streaming_cms_ingest",
    "cluster_aware_split",
    "minhash_estimate_calibration",
    "textrank_keywords",
    "simhash_hamming_calibration",
    "kmv_source_overlap_sampled",
    "near_dup_clusters",
    "bigram_lm_quality",
    "cluster_quality_canonicals",
    "token_route_policies",
    "bpe_tokenize_fertility",
    "video_frame_dedup",
    "kmv_source_overlap_sketch",
    "minhash_estimate_calibration_sampled",
    "embedding_ann_recall_curve",
    "bpe_merge_rounds",
    "simhash_near_dup",
    "verify_promote_orphans",
    "mjpg_video_stats",
    "jpeg_pixel_stats",
    "media_health_probe",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join("/root/repo", "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-r12-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    for name in names:
        if name not in specs:
            print(f"skip (not registered): {name}")
            continue
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
