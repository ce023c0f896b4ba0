"""iceberg_hybrid_spark — a PySpark-native analytics + lakehouse engine.

Re-expresses the capabilities of the reference geo-distributed Iceberg
control plane (cning112/iceberg-hybrid, surveyed in /root/repo/SURVEY.md)
as an idiomatic Spark-first engine:

- ``session``    — SparkSession factory tuned for scale (AQE, Arrow, UTC).
- ``sources``    — table loaders / view registration over parquet lakes.
- ``operators``  — the delegated query surface (SURVEY §2.B): joins,
                   windows, set ops, aggregations, events analytics.
- ``functions``  — LLM-data-pipeline primitives: dedup (exact/minhash),
                   text analysis, embedding similarity.
- ``lake``       — from-scratch snapshot table format ("hytable"):
                   commits, time travel, snapshot diff, expiry, orphans.
- ``control``    — control-plane operators (SURVEY §2.A): registry,
                   read routing, replication planning, GC, commit gate,
                   consistency tokens, leases.
- ``streaming``  — Structured Streaming over sync events.
"""

__version__ = "0.1.0"
