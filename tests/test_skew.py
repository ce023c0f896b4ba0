"""Skew-aware joins: exact equivalence with the plain join + hot-key
spreading across shuffle partitions."""

from pyspark.sql import functions as F

from iceberg_hybrid_spark.functions.skew import hot_keys, salted_join, skew_split_join


def _skewed(spark, n=20_000, hot_frac=0.9):
    # 90% of rows share key 0; the rest spread over 1..99
    return spark.range(n).selectExpr(
        f"CASE WHEN id < {int(n * hot_frac)} THEN 0 ELSE id % 99 + 1 END AS k",
        "id AS payload",
    )


def _dim(spark):
    return spark.range(100).selectExpr("id AS k", "concat('name_', id) AS name")


def _counts(df):
    return {
        (r.k, r.name): r.c
        for r in df.groupBy("k", "name").agg(F.count(F.lit(1)).alias("c")).collect()
    }


def test_salted_join_matches_plain_join(spark):
    big, dim = _skewed(spark), _dim(spark)
    plain = big.join(dim, "k")
    salted = salted_join(big, dim, "k", salt=8)
    assert salted.count() == plain.count()
    assert _counts(salted) == _counts(plain)
    assert set(salted.columns) == set(plain.columns)


def test_salted_join_spreads_hot_key(spark):
    big, dim = _skewed(spark), _dim(spark)

    def max_partition_rows(df):
        rows = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
        return max(r["count"] for r in rows)

    # AQE's partition coalescing merges the tiny test partitions back
    # together and hides the raw shuffle distribution — turn it off to
    # observe the hash layout the salt actually produces.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plain_max = max_partition_rows(big.join(dim.hint("shuffle_hash"), "k"))
        salted_max = max_partition_rows(
            salted_join(big, dim.hint("shuffle_hash"), "k", salt=32)
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # hot key is 90% of rows on ONE task in the plain join; with 32
    # salts over the 4 test shuffle partitions the hot rows must spread
    # at least 2x (hash-bucket collisions keep it short of 4x)
    assert plain_max >= 0.9 * 20_000
    assert salted_max <= plain_max / 2


def test_hot_keys_detection(spark):
    big = _skewed(spark)
    hot = {r.k for r in hot_keys(big, "k", threshold_rows=1000).collect()}
    assert hot == {0}


def test_skew_split_join_matches_plain(spark):
    big, dim = _skewed(spark), _dim(spark)
    plain = big.join(dim, "k")
    split = skew_split_join(big, dim, "k", threshold_rows=1000, salt=8)
    assert _counts(split) == _counts(plain)


def test_left_join_salted(spark):
    # keys missing from the dim survive a salted LEFT join exactly once
    big = _skewed(spark).withColumn("k", F.col("k") + 200)  # no dim match
    dim = _dim(spark)
    out = salted_join(big, dim, "k", salt=4, how="left")
    assert out.count() == big.count()
    assert out.filter(F.col("name").isNotNull()).count() == 0
