"""Registry-wide materialized-broadcast sweep.

Executes every registered query at $SPARK_GRAFT_SF_DIR (default sf0.1)
and reads the POST-AQE BroadcastExchange dataSize metrics off each
executed plan (plans/guard.materialized_broadcast_bytes) — the runtime
complement of the static hint guard: it catches joins whose FILE-SIZE
estimate sits under the session threshold while the materialized hashed
relation does not (the mid-scale window, docs/SCALING.md).

Prints one JSON line per query that materialized any broadcast at or
above --min-report (default 1 MiB), with the full size list; a final
summary line counts queries over --budget (default 64 MiB = the session
threshold: anything above it means the estimate understated by the
whole planning margin).

Usage:
  python tools/broadcast_sweep.py [--budget-mib 64] [--min-report-mib 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_hybrid_spark.plans.guard import (  # noqa: E402
    materialized_broadcast_bytes,
)
from iceberg_hybrid_spark.queries import all_specs  # noqa: E402
from iceberg_hybrid_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-mib", type=float, default=64.0)
    ap.add_argument("--min-report-mib", type=float, default=1.0)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("broadcast-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    names = args.names or list(specs)
    over_budget = []
    errors = 0
    for name in names:
        try:
            df = specs[name].fn(spark, sf_dir)
            df.collect()
            pairs = sorted(
                materialized_broadcast_bytes(df), reverse=True
            )
        except Exception as exc:  # report, keep sweeping
            print(json.dumps({"query": name, "error": str(exc)[:120]}),
                  flush=True)
            errors += 1
            continue
        # dataSize includes the hash map's ~32 MiB allocation floor, so
        # report rows alongside: 32.0 MiB at a handful of rows is
        # allocation, not data (see guard.materialized_broadcast_bytes)
        mib = [round(s / 1048576, 1) for s, _ in pairs]
        if mib and mib[0] >= args.min_report_mib:
            rec = {
                "query": name,
                "broadcast_mib": mib,
                "broadcast_rows": [r for _, r in pairs],
            }
            if mib[0] >= args.budget_mib:
                rec["over_budget"] = True
                over_budget.append(name)
            print(json.dumps(rec), flush=True)
    print(json.dumps({
        "swept": len(names),
        "errors": errors,
        "budget_mib": args.budget_mib,
        "over_budget": over_budget,
    }), flush=True)


if __name__ == "__main__":
    main()
