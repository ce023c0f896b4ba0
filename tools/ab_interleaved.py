"""Interleaved same-process A/B timer for two source trees.

Usage: python tools/ab_interleaved.py -n PASSES treeA treeB query...

Alternates A,B,A,B,... passes inside ONE SparkSession (ambient drift on
this box swings 3x on minute timescales — sequential whole-process A/Bs
are noise; interleaving hits both trees with the same drift).  Between
passes the `iceberg_hybrid_spark` package is evicted from sys.modules
and re-imported from the other tree.
"""

from __future__ import annotations

import argparse
import importlib
import statistics
import sys
import time


def load_specs(tree: str):
    for mod in [m for m in sys.modules if m.startswith("iceberg_hybrid_spark")]:
        del sys.modules[mod]
    sys.path = [p for p in sys.path if p not in ("/root/repo", "/root/headbench")]
    sys.path.insert(0, tree)
    q = importlib.import_module("iceberg_hybrid_spark.queries")
    return q.all_specs()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("tree_a")
    ap.add_argument("tree_b")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, args.tree_a)
    from iceberg_hybrid_spark.session import get_spark

    spark = get_spark("ab-interleaved")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as _F

    _warm = _F.pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_warm(_F.col("id"))).collect()

    results: dict[str, dict[str, list[float]]] = {
        q: {"A": [], "B": []} for q in args.queries
    }
    for p in range(args.n):
        # Alternate which tree goes first each pass: with a fixed A,B
        # order, any monotonic within-session drift (block/metadata
        # accumulation, JIT state) systematically lands on B — measured
        # as a ~1.1x B/A ratio on IDENTICAL code.  A,B / B,A / A,B ...
        # balances the mean position of both labels.
        order = (("A", args.tree_a), ("B", args.tree_b))
        if p % 2:
            order = tuple(reversed(order))
        for label, tree in order:
            specs = load_specs(tree)
            for name in args.queries:
                t0 = time.perf_counter()
                specs[name].fn(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                results[name][label].append(dt)
            print(f"pass {p} {label} done", flush=True)
    print(f"\n{'query':42s} {'A_med':>8s} {'B_med':>8s} {'A_min':>8s} {'B_min':>8s}  B/A  pairB/A")
    ta = tb = 0.0
    for name in args.queries:
        am = statistics.median(results[name]["A"])
        bm = statistics.median(results[name]["B"])
        ta += am
        tb += bm
        # median of per-pass paired ratios: robust to between-pass drift
        # (each pass's A and B run adjacently under ~the same ambient)
        pr = statistics.median(
            b / a for a, b in zip(results[name]["A"], results[name]["B"])
        )
        print(
            f"{name:42s} {am:8.3f} {bm:8.3f} "
            f"{min(results[name]['A']):8.3f} {min(results[name]['B']):8.3f}"
            f"  {bm / am:.2f}  {pr:.2f}"
        )
    print(f"{'TOTAL(median)':42s} {ta:8.3f} {tb:8.3f}")
    import json as _json

    print("RAW " + _json.dumps(results))


if __name__ == "__main__":
    main()
