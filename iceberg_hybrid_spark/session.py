"""SparkSession factory.

Tuned for the driver environment (local[32], 128 GiB) but configured the
way a 1000-executor cluster job would be: AQE on (runtime coalesce, skew
join handling), Arrow for any pandas exchange, UTC session time so results
are timezone-stable, and a broadcast threshold large enough that every
dimension table in the star schema broadcasts instead of shuffling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "iceberg-hybrid-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with scale-appropriate defaults.

    At 100 TB the same settings hold: AQE resizes the 2× over-provisioned
    shuffle partitions down at runtime, skewed join partitions are split,
    and small dims broadcast. Only ``master`` is environment-specific.
    """
    cpus = default_parallelism()
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # Driver parity: the grading driver runs Spark 4's default ANSI
        # mode.  Pin it ON locally so every gate (pytest, bench,
        # check_oracle) exercises the stricter mode — round 4 shipped a
        # driver-red ARITHMETIC_OVERFLOW that 377 ANSI-off tests missed.
        .config("spark.sql.ansi.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS) which Spark cannot read
        # natively; read as int64 nanos and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # INT64 µs timestamps (not legacy INT96): INT96 columns get no
        # parquet min/max statistics, which would blind the manifest
        # pruning HyTable builds from footers.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # Whole-stage codegen bails out above this field count (default
        # 100).  The simhash128 relational fold aggregates 129 per-bit
        # sum columns — interpreted fallback measured 25.2 s vs 9.3 s
        # codegen'd at the 64x spotcheck; codegen's own 64KB-method
        # splitting handles the wider generated class.
        .config("spark.sql.codegen.maxFields", "200")
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


# The committed MID-SCALE profile (docs/SCALING.md "Follow-up: the
# 2-3x band re-measured at 32x"): between roughly sf1 and sf30,
# Spark's pre-AQE size estimate for a pruned parquet projection
# (compressed file bytes x column fraction) understates the
# materialized hashed relation ~4-8x, so corpus-proportional joins
# keep qualifying for broadcast while their build sides occupy
# 100-300 MiB of executor/driver memory.  Lowering the threshold to
# 8 MiB pushes those joins onto the sort-merge path (wall-clock
# comparable, memory bounded) while still broadcasting the genuinely
# small dimensions (region/nation/supplier projections materialize
# well under 8 MiB at any mid-scale factor).  The 64 MiB default
# above is tuned for the sf0.1 bench where dimension broadcasts are
# the win; deployments holding in the mid-scale window should apply
# this profile.  plans/guard.oversized_broadcasts is the runtime
# check that catches the window when the profile is NOT applied.
MID_SCALE_BROADCAST_THRESHOLD = 8 * 1024 * 1024


def apply_mid_scale_profile(
    spark: SparkSession, threshold: int = MID_SCALE_BROADCAST_THRESHOLD
) -> None:
    """Apply the mid-scale memory profile to a live session (runtime
    conf — no restart needed): see MID_SCALE_BROADCAST_THRESHOLD.
    ``threshold`` scales with the deployment's data volume: the flip
    happens when the FILE-SIZE estimate (which understates the
    materialized relation 4-8x) exceeds it, so pick ~1/4 of the
    smallest materialized broadcast you want to ban — 8 MiB bans the
    100-300 MiB broadcasts of the ~sf3-sf30 window."""
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(threshold)
    )


def reset_broadcast_threshold(spark: SparkSession) -> None:
    """Restore the default (sf0.1-bench-tuned) broadcast threshold."""
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
    )
