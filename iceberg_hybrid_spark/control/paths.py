"""Path localization — ≙ resolve_dest (iceberg-arch-geo-distributed-ha.md:417-455).

The global storage registry maps source URI prefixes to per-region local
prefixes; destination resolution is LONGEST-prefix match with optional
per-rule overrides, preserving the path segments after the matched prefix.

Two forms:
- ``resolve_dest``: scalar (driver-side config resolution),
- ``localize_paths_df``: the same rule table applied to a DataFrame of
  paths as pure column expressions (a when-chain ordered by prefix
  length — no UDF, stays in whole-stage codegen; the rule table is tiny
  config so inlining it beats a broadcast join at any scale).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PrefixRule:
    """source prefix → destination prefix (per target region)."""

    source_prefix: str
    dest_prefix: str


class NoMatchingPrefix(Exception):
    pass


def resolve_dest(uri: str, rules: list[PrefixRule]) -> str:
    """Longest-prefix match, then splice the remainder onto the dest
    prefix (segment alignment per the doc's examples)."""
    best: PrefixRule | None = None
    for rule in rules:
        if uri.startswith(rule.source_prefix):
            if best is None or len(rule.source_prefix) > len(best.source_prefix):
                best = rule
    if best is None:
        raise NoMatchingPrefix(uri)
    remainder = uri[len(best.source_prefix):].lstrip("/")
    return best.dest_prefix.rstrip("/") + ("/" + remainder if remainder else "")


def localized_col(path: Column, rules: list[PrefixRule]) -> Column:
    """when-chain in descending prefix-length order ⇒ longest match wins."""
    ordered = sorted(rules, key=lambda r: len(r.source_prefix), reverse=True)
    expr = None
    for rule in ordered:
        src = rule.source_prefix
        dst = rule.dest_prefix.rstrip("/")
        remainder = F.regexp_replace(
            F.substring(path, len(src) + 1, 10**6), "^/+", ""
        )
        localized = F.when(
            remainder == "", F.lit(dst)
        ).otherwise(F.concat(F.lit(dst + "/"), remainder))
        clause = path.startswith(src)
        expr = F.when(clause, localized) if expr is None else expr.when(clause, localized)
    return expr.otherwise(F.lit(None)) if expr is not None else F.lit(None)


def localize_paths_df(
    df: DataFrame, rules: list[PrefixRule], path_col: str = "file_path",
    out_col: str = "localized_path",
) -> DataFrame:
    return df.withColumn(out_col, localized_col(F.col(path_col), rules))
