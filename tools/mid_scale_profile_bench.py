"""Mid-scale broadcast-profile measurement (docs/SCALING.md follow-up).

For the queries whose corpus-proportional joins ride under-threshold
broadcasts in the ~sf3-sf30 window (q12/q18/q22/q3 at SPOT_REPLICAS=32),
measure wall-clock and MATERIALIZED broadcast sizes (post-AQE dataSize
metric, plans/guard.materialized_broadcast_bytes) with the default
session threshold vs the committed mid-scale profile
(session.apply_mid_scale_profile, 8 MiB), and record whether the profile
moved the join to the sort-merge path.  Evidence generator, not a test.

Usage: SPOT_REPLICAS=32 python tools/mid_scale_profile_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_hybrid_spark.plans.guard import (  # noqa: E402
    materialized_broadcast_bytes,
)
from iceberg_hybrid_spark.queries import all_specs  # noqa: E402
from iceberg_hybrid_spark.session import (  # noqa: E402
    apply_mid_scale_profile,
    get_spark,
    reset_broadcast_threshold,
)
from scale_spotcheck import build_corpus  # noqa: E402

QUERIES = (
    "q12_late_shipment_priority",
    "q18_large_orders",
    "q22_idle_rich_customers",
    "q3_shipping_priority",
)


def main() -> None:
    replicas = int(os.environ.get("SPOT_REPLICAS", "32"))
    spark = get_spark("mid-scale-profile-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    spark.conf.set("spark.sql.files.openCostInBytes", "4m")
    big_dir = build_corpus(spark, replicas)
    specs = all_specs()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    for name in QUERIES:
        fn = specs[name].fn
        rec = {"query": name, "replicas": replicas}
        for label, setup in (
            ("default", lambda: reset_broadcast_threshold(spark)),
            ("profile", lambda: apply_mid_scale_profile(spark)),
        ):
            setup()
            best, bsizes, smj = None, [], False
            for _ in range(2):
                df = fn(spark, big_dir)
                t0 = time.perf_counter()
                df.collect()
                dt = time.perf_counter() - t0
                if best is None or dt < best:
                    best = dt
                bsizes = [
                    round(sz / 1048576, 1)
                    for sz, _ in materialized_broadcast_bytes(df)
                ]
                smj = "SortMergeJoin" in (
                    df._jdf.queryExecution().executedPlan().toString()
                )
            rec[f"{label}_s"] = round(best, 2)
            rec[f"{label}_broadcast_mib"] = sorted(bsizes, reverse=True)
            rec[f"{label}_sort_merge"] = smj
        reset_broadcast_threshold(spark)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
