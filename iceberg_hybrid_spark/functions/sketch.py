"""Shared sketch-arithmetic SQL fragments (Spark SQL ∩ DuckDB dialect).

These strings are evaluated with IDENTICAL expression text on both
engines so the resulting integers/doubles are bit-identical — the
property every sketch oracle in ``queries/pipeline.py`` relies on.
Moved here (round 6) so the streaming state-maintenance path
(``streaming/ingest.py``) can share them without importing the query
layer.

- ``HEX_INT``: first 8 hex nibbles of an md5 column ``m`` as an exact
  BIGINT (the CAST keeps nibble*16^k products in 64-bit under ANSI —
  Spark's instr returns INT and 15*16^7 overflows int32).
- ``HLL_RHO``: HyperLogLog register rank over the 22 sub-bucket bits of
  column ``w`` — exact integer threshold sums, NEVER log2 (Spark lowers
  LOG2 to ln/ln, not exactly rounded at powers of two).  w = 0 gives the
  capped rho = 23.
- ``HLL_EST``: alpha_m * m^2 * 2^23 / snum for m = 1024 registers; the
  leading CAST-to-DOUBLE keeps Spark off its DECIMAL literal type
  (DuckDB parses bare decimals as double — the one dialect split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEX_INT = (
    "("
    + " + ".join(
        f"CAST(instr('0123456789abcdef', substring(m, {i}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (8 - i)}"
        for i in range(1, 9)
    )
    + ")"
)

HLL_RHO = (
    "(1 + "
    + " + ".join(
        f"(CASE WHEN w % {1 << k} = 0 THEN 1 ELSE 0 END)" for k in range(1, 23)
    )
    + ")"
)

HLL_EST = (
    "ROUND((CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 1024.0))"
    " * 1024 * 1024 * 8388608 / snum - 0.000000001, 3) + 0.0"
)

# DuckDB twin of the Spark-side md5(s) addressing (column `s` holds the
# shingle string)
HLL_ADDR = HEX_INT.replace("(m,", "(md5(s),")


# DuckDB twin of the Spark-side md5(w || ':' || r) count-min addressing
# (column `w` holds the token, `r` the hash row)
CMS_ADDR = HEX_INT.replace("(m,", "(md5(w || ':' || CAST(r AS VARCHAR)),")


def cms_cells(tok: DataFrame, depth: int = 4, width: int = 1024) -> DataFrame:
    """(r, cell, cnt) count-min cells from a token relation ``w`` — ONE
    partial-agg counting shuffle collapsing to <= depth x width rows.
    Cell counts are ADDITIVE (merge = unionByName + groupBy-SUM), the
    CMS property streaming state maintenance relies on — but sum is NOT
    idempotent, so at-least-once upstreams must dedup deliveries before
    folding (streaming/ingest.py ``cms_ingest_batch``; contrast the HLL
    path whose register-wise max absorbs redelivery for free).
    Addressing text is shared verbatim with the DuckDB oracles
    (``CMS_ADDR``; same md5-nibble arithmetic as
    queries/pipeline.py::cms_token_counts)."""
    four_rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    return (
        tok.select("w", four_rows)
        .select(
            "w",
            "r",
            F.md5(
                F.concat(F.col("w"), F.lit(":"), F.col("r").cast("string"))
            ).alias("m"),
        )
        .selectExpr("r", f"{HEX_INT} % {width} AS cell")
        .groupBy("r", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hll_registers(sh: DataFrame, group_col: str) -> DataFrame:
    """(group, bucket, mr) max-rank registers from a (group, s) shingle
    relation — ONE partial-agg max shuffle collapsing to <= groups x
    1024 rows; register-wise max commutes with any partitioning, so the
    same builder serves batch audits and per-micro-batch streaming
    state (merge = unionByName + the same groupBy-max)."""
    return (
        sh.select(group_col, F.md5("s").alias("m"))
        .selectExpr(group_col, f"{HEX_INT} AS h")
        .selectExpr(group_col, "h % 1024 AS bucket", "h DIV 1024 AS w")
        .selectExpr(group_col, "bucket", f"{HLL_RHO} AS rho")
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("mr"))
    )
