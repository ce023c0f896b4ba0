"""Longest-prefix path localization (resolve_dest) — scalar and column
forms agree; doc-derived cases incl. overrides via longer prefixes."""

import pytest

from iceberg_hybrid_spark.control.paths import (
    NoMatchingPrefix,
    PrefixRule,
    localize_paths_df,
    resolve_dest,
)
from iceberg_hybrid_spark.lake.gc import orphans_from_inventory

RULES = [
    PrefixRule("s3://primary/warehouse", "s3://eu-mirror/warehouse"),
    # longer prefix = override for one table subtree (doc's override case)
    PrefixRule("s3://primary/warehouse/analytics", "s3://eu-fast/analytics"),
    PrefixRule("s3://other", "s3://eu-other"),
]


def test_longest_prefix_wins():
    assert (
        resolve_dest("s3://primary/warehouse/analytics/t1/f.parquet", RULES)
        == "s3://eu-fast/analytics/t1/f.parquet"
    )
    assert (
        resolve_dest("s3://primary/warehouse/sales/t2/f.parquet", RULES)
        == "s3://eu-mirror/warehouse/sales/t2/f.parquet"
    )


def test_exact_prefix_no_remainder():
    assert resolve_dest("s3://other", RULES) == "s3://eu-other"


def test_no_match_raises():
    with pytest.raises(NoMatchingPrefix):
        resolve_dest("gs://elsewhere/x", RULES)


def test_column_form_matches_scalar(spark):
    paths = [
        "s3://primary/warehouse/analytics/t1/f.parquet",
        "s3://primary/warehouse/sales/t2/f.parquet",
        "s3://other/thing",
        "gs://elsewhere/x",
    ]
    df = spark.createDataFrame([(p,) for p in paths], "file_path string")
    got = {r.file_path: r.localized_path for r in localize_paths_df(df, RULES).collect()}
    for p in paths:
        try:
            expected = resolve_dest(p, RULES)
        except NoMatchingPrefix:
            expected = None
        assert got[p] == expected, p


def test_orphans_from_inventory_anti_join(spark):
    inventory = spark.createDataFrame(
        [("data/a.parquet", 10), ("data/b.parquet", 20), ("data/stray.parquet", 5)],
        "file_path string, size_bytes long",
    )
    reachable = spark.createDataFrame(
        [("data/a.parquet",), ("data/b.parquet",)], "file_path string"
    )
    orphans = orphans_from_inventory(inventory, reachable).collect()
    assert [r.file_path for r in orphans] == ["data/stray.parquet"]
