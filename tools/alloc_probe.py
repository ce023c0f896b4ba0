"""Allocation-lean hash kernel probe (r12 verdict task #2).

The r11 128x strong-scaling probes named per-row string
materialization in hash-fold loops as the single-shared-heap binder
past ~16 threads (docs/SCALING.md r11).  This probe A/Bs the exact
kernel shape at 8/16/32 threads in fresh driver processes:

  A (string):    bit_xor(xxhash64(concat(string(id), 'salt')))
  B (multi-arg): bit_xor(xxhash64(id, 'salt'))

over spark.range(N) — scan-free, shuffle-free, Python-free; the only
difference is whether a string is materialized per row before hashing.

Usage: python tools/alloc_probe.py [N]   (default 400_000_000)
Prints one JSON line per (kernel, threads) with best-of-2 seconds.
"""

from __future__ import annotations

import json
import subprocess
import sys

KERNELS = {
    "string_concat": "bit_xor(xxhash64(concat(cast(id as string), 'salt')))",
    "multi_arg": "bit_xor(xxhash64(id, 'salt'))",
}

_CHILD = r"""
import sys, time
from pyspark.sql import SparkSession
n, threads, expr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
spark = (
    SparkSession.builder.master(f"local[{threads}]")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.shuffle.partitions", str(threads))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
best = None
for _ in range(2):
    t0 = time.perf_counter()
    spark.range(0, n, 1, threads).selectExpr(expr).collect()
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(f"RESULT {best:.2f}", flush=True)
"""


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000_000
    for name, expr in KERNELS.items():
        for threads in (8, 16, 32):
            out = subprocess.run(
                [sys.executable, "-c", _CHILD, str(n), str(threads), expr],
                capture_output=True,
                text=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
            sec = float(line[0].split()[1]) if line else None
            print(
                json.dumps(
                    {"kernel": name, "threads": threads, "sec": sec, "n": n}
                ),
                flush=True,
            )
            if sec is None:
                print(out.stderr[-2000:], file=sys.stderr)


if __name__ == "__main__":
    main()
