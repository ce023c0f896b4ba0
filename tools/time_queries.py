"""Targeted same-session query timer for optimization A/B runs.

Usage: python tools/time_queries.py [-n RUNS] query [query ...]
Times each query as build+execute+collect (the bench methodology) at
$SPARK_GRAFT_SF_DIR (default sf0.1), printing per-query median/min over
RUNS passes (default 3) after a warm-up pass of the first query.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import os  # noqa: E402

from iceberg_hybrid_spark.queries import all_specs  # noqa: E402
from iceberg_hybrid_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    # Session warm-up (JVM, codegen, Arrow worker pool), as bench.py does.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as _F

    _warm = _F.pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_warm(_F.col("id"))).collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().collect()
    results = {}
    for name in args.queries:
        fn = specs[name].fn
        spark.sparkContext.setJobDescription(f"time:{name}")
        ts = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            ts.append(time.perf_counter() - t0)
        results[name] = ts
        print(
            f"{name}: median {statistics.median(ts):.3f}s  "
            f"min {min(ts):.3f}s  all {[round(t, 3) for t in ts]}",
            flush=True,
        )
    total_med = sum(statistics.median(ts) for ts in results.values())
    print(f"TOTAL(median): {total_med:.3f}s")


if __name__ == "__main__":
    main()
