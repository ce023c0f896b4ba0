"""Skew-aware join helpers (100 TB posture).

A shuffled equi-join hashes rows by key; a hot key (one user, one null-ish
default, one viral document) lands its entire row set on ONE reduce task
and the stage runs as long as that task.  AQE's skew-join splitting covers
sort-merge joins at runtime, but only after the skewed shuffle files
exist, and not for every join strategy — the classic remedies below are
plan-level and work everywhere:

- ``salted_join``: scatter the big side across ``salt`` sub-keys and
  replicate the small side per sub-key.  Bounded state: the small side
  grows ``salt``×, the hot key's rows spread over ``salt`` tasks.
- ``skew_split_join``: route ONLY the hot keys (found with one cheap
  aggregation) through the salted path and everything else through the
  plain join — no replication cost for the long tail.

Reference parity: the reference's sync fan-out shards work per region and
per file precisely to avoid a single hot queue
(SyncOrchestrator.scala:29,111 parallel fan-outs); salting is the same
idea applied to shuffle keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with uniform salting.

    The big side gets a per-row salt in [0, salt); the small side is
    replicated once per salt value (explode of a literal range — rows
    grow ``salt``×, so keep this for genuinely small-but-unbroadcastable
    sides).  The shuffle key becomes (key, salt): a key holding p% of the
    rows now spreads over ``salt`` tasks instead of one.

    Result equals ``big.join(small, on, how)`` exactly (each big row meets
    exactly one replica of its key's small rows).
    """
    if salt < 1:
        raise ValueError("salt must be >= 1")
    salted_big = big.withColumn(
        _SALT, F.floor(F.rand(seed=42) * salt).cast("int")
    )
    salted_small = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_big.join(salted_small, [on, _SALT], how)
    return out.drop(_SALT)


def hot_keys(df: DataFrame, on: str, threshold_rows: int) -> DataFrame:
    """Keys whose row count exceeds ``threshold_rows`` — one groupBy
    (map-side partial agg makes this cheap even on the full fact)."""
    return (
        df.groupBy(on)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") > threshold_rows)
        .select(on)
    )


def skew_split_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    threshold_rows: int = 1_000_000,
    salt: int = 16,
) -> DataFrame:
    """Inner equi-join that salts ONLY the hot keys.

    1. find keys with > threshold_rows rows in ``big`` (tiny result —
       broadcast);
    2. hot partition of both sides → ``salted_join``;
    3. cold partition → plain join (no replication);
    4. union.

    The standard production pattern when the key histogram has a short
    hot head and a long cold tail — the salted path's small-side
    replication is paid only for the handful of hot keys.
    """
    hot = hot_keys(big, on, threshold_rows)
    big_hot = big.join(F.broadcast(hot), on, "left_semi")
    big_cold = big.join(F.broadcast(hot), on, "left_anti")
    small_hot = small.join(F.broadcast(hot), on, "left_semi")
    small_cold = small.join(F.broadcast(hot), on, "left_anti")
    salted = salted_join(big_hot, small_hot, on, salt=salt)
    plain = big_cold.join(small_cold, on)
    return salted.unionByName(plain)
