"""TPC-H-pattern relational core at ~sf1: one order of magnitude above
the per-round bench scale.

Builds (or reuses) the scale_spotcheck replicated corpus at N=10 — the
sf0.1 fact tables with per-replica key strides (consistent across join
sides: disjoint customer/order populations over the same calendar and
part/supplier/nation catalog), which is ~sf1 shuffle volume — and times
the 22 TPC-H pattern queries at x1 and x10 in the same session.  The
sf0.1 bench validates plans where broadcast thresholds and AQE
coalescing can hide cliffs; this is the point that either confirms the
plans or finds the next expand-shaped regression (any query >3x per 10x
data gets a plan read).

Usage:
  python tools/tpch_scale_bench.py            # all 22, N=10
  SPOT_REPLICAS=10 python tools/tpch_scale_bench.py q1_pricing_summary ...

Output: one JSON line per query {query, x1, xN, ratio}, then a summary
line.  Timings are machine-dependent — measurement tool, not a test.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_hybrid_spark.queries import all_specs  # noqa: E402
from iceberg_hybrid_spark.session import get_spark  # noqa: E402
from tools.scale_spotcheck import build_corpus  # noqa: E402

# the 22 TPC-H patterns (q7 = nation_pair_volume, q10 = top_return_customers)
TPCH_QUERIES = (
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_priority_late_orders",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "nation_pair_volume",
    "q8_national_market_share",
    "q9_profit_by_nation_year",
    "top_return_customers",
    "q11_important_parts",
    "q12_late_shipment_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_diversity",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_dominant_blue_suppliers",
    "q21_last_shipper",
    "q22_idle_rich_customers",
)


def main() -> None:
    replicas = int(os.environ.get("SPOT_REPLICAS", "10"))
    names = sys.argv[1:] or list(TPCH_QUERIES)
    spark = get_spark("tpch-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # same scan-granularity protocol as scale_spotcheck: one partition
    # per corpus file so both scales saturate the cores
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    spark.conf.set("spark.sql.files.openCostInBytes", "4m")
    base_dir = build_corpus(spark, 1)
    big_dir = build_corpus(spark, replicas)
    specs = all_specs()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    worst = (None, 0.0)
    for name in names:
        fn = specs[name].fn
        times = {}
        for label, sf_dir in (("x1", base_dir), (f"x{replicas}", big_dir)):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[label] = round(best, 2)
        ratio = (
            round(times[f"x{replicas}"] / times["x1"], 2)
            if times["x1"]
            else None
        )
        if ratio and ratio > worst[1]:
            worst = (name, ratio)
        print(json.dumps({"query": name, **times, "ratio": ratio}), flush=True)
    print(
        json.dumps({"summary": "worst_ratio", "query": worst[0], "ratio": worst[1]}),
        flush=True,
    )


if __name__ == "__main__":
    main()
