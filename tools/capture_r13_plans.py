"""Capture .explain("formatted") for the r13 optimization targets.

Usage: python tools/capture_r13_plans.py <tree> <suffix> [query ...]
Loads the package from <tree> (e.g. a pristine r12-HEAD worktree for the
"before" plans, /root/repo for "after") and writes
plans/r13/<query>_<suffix>.txt.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

DEFAULT = [
    "mjpg_video_stats",
    "jpeg_pixel_stats",
    "streaming_frame_dedup_replay",
    "streaming_hll_ingest",
    "streaming_cms_ingest",
    "pipeline_health",
    "jaccard_prefix_filter_pairs",
    "media_exact_dedup",
    "video_frame_dedup",
    "image_resize_stats",
]


def main() -> None:
    tree = sys.argv[1]
    suffix = sys.argv[2]
    sys.path.insert(0, tree)

    from iceberg_hybrid_spark.queries import all_specs  # noqa: E402
    from iceberg_hybrid_spark.session import get_spark  # noqa: E402

    names = sys.argv[3:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join("/root/repo", "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-r13-plans")
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
        print(f"wrote {path} ({len(buf.getvalue().splitlines())} lines)")


if __name__ == "__main__":
    main()
