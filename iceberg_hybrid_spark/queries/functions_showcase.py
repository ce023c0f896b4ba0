"""Scalar/window function breadth (SURVEY §2.B scalar-fns + windows rows):
ranking-family windows, string functions, date/time functions — each as an
oracle-checked query so the function surface is verified, not just listed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import round_stable
from ..sources.tables import load_table
from .spec import QuerySpec


def window_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank / cume_dist / lead / lag /
    first_value over one ordered partition (customers by balance within
    segment; top-3 per segment keeps output bounded)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("dense_rnk"),
            F.ntile(4).over(w).alias("quartile"),
            round_stable(F.percent_rank().over(w), 6).alias("pct_rank"),
            round_stable(F.cume_dist().over(w), 6).alias("cume"),
            F.lead("c_custkey", 1).over(w).alias("next_custkey"),
            F.lag("c_custkey", 1).over(w).alias("prev_custkey"),
            F.first_value(F.col("c_custkey")).over(w).alias("richest_custkey"),
        )
        .filter(F.col("rnk") <= 3)
        .orderBy("c_mktsegment", "rnk")
    )


WINDOW_SHOWCASE_SQL = """
SELECT c_mktsegment, c_custkey, acctbal, rnk, dense_rnk, quartile,
       pct_rank, cume, next_custkey, prev_custkey, richest_custkey
FROM (
  SELECT c_mktsegment, c_custkey,
         ROUND(c_acctbal, 2) AS acctbal,
         CAST(RANK() OVER w AS INTEGER) AS rnk,
         CAST(DENSE_RANK() OVER w AS INTEGER) AS dense_rnk,
         CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
         ROUND(PERCENT_RANK() OVER w - 0.000000001, 6) + 0.0 AS pct_rank,
         ROUND(CUME_DIST() OVER w - 0.000000001, 6) + 0.0 AS cume,
         LEAD(c_custkey, 1) OVER w AS next_custkey,
         LAG(c_custkey, 1) OVER w AS prev_custkey,
         FIRST_VALUE(c_custkey) OVER w AS richest_custkey
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
) t
WHERE rnk <= 3
ORDER BY c_mktsegment, rnk
"""


def string_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substr/length/trim/lpad/replace/split-part/reverse/
    levenshtein over part names (bounded to 50 rows)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.levenshtein("p_name", "p_brand").cast("bigint").alias("name_brand_dist"),
        F.concat_ws("::", "p_brand", "p_type").alias("brand_type"),
    ).orderBy("p_partkey")


STRING_SHOWCASE_SQL = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       substring(p_name, 1, 5) AS name_prefix,
       CAST(length(p_name) AS BIGINT) AS name_len,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       reverse(p_brand) AS brand_rev,
       CAST(levenshtein(p_name, p_brand) AS BIGINT) AS name_brand_dist,
       concat_ws('::', p_brand, p_type) AS brand_type
FROM part WHERE p_partkey <= 50 ORDER BY p_partkey
"""


def date_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract year/month/day/dow/doy, date_add-style arithmetic,
    datediff, last_day, truncation — over a bounded order slice."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mon"),
        F.dayofmonth(d).cast("bigint").alias("dom"),
        F.dayofweek(d).cast("bigint").alias("dow"),  # Sunday=1
        F.dayofyear(d).cast("bigint").alias("doy"),
        (d + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), d)
        .cast("bigint")
        .alias("days_to_y2k"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.quarter(d).cast("bigint").alias("qtr"),
    ).orderBy("o_orderkey")


DATE_SHOWCASE_SQL = """
SELECT o_orderkey,
       CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
       CAST(extract(month FROM o_orderdate) AS BIGINT) AS mon,
       CAST(extract(day FROM o_orderdate) AS BIGINT) AS dom,
       CAST(extract(dow FROM o_orderdate) + 1 AS BIGINT) AS dow,
       CAST(extract(doy FROM o_orderdate) AS BIGINT) AS doy,
       o_orderdate + INTERVAL 90 DAY AS due_date,
       CAST(datediff('day', o_orderdate, TIMESTAMP '2000-01-01') AS BIGINT)
           AS days_to_y2k,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
       CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS qtr
FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey
"""


def array_map_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + map scalar functions (SURVEY §2.B scalar-fns row): build,
    slice, sort, dedup, membership-test, and aggregate arrays from
    document text, then route two derived measures through a map and
    read them back by key — all JVM column exprs (bounded to 50 rows)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 50)
    arr = F.split(F.col("text"), " ")
    uniq = F.array_distinct(arr)
    m = F.create_map(
        F.lit("words"), F.size(arr).cast("bigint"),
        F.lit("uniq"), F.size(uniq).cast("bigint"),
    )
    return docs.select(
        "doc_id",
        F.size(arr).cast("bigint").alias("n_words"),
        F.concat_ws("-", F.slice(arr, 1, 3)).alias("first3"),
        F.array_contains(arr, "the").alias("has_the"),
        F.element_at(F.array_sort(uniq), 1).alias("first_sorted_uniq"),
        F.element_at(F.array_sort(uniq), -1).alias("last_sorted_uniq"),
        F.aggregate(
            F.transform(uniq, lambda w: F.length(w).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("uniq_char_total"),
        F.element_at(m, "uniq").alias("uniq_via_map"),
        F.map_keys(m)[0].alias("first_map_key"),
    ).orderBy("doc_id")


ARRAY_MAP_SHOWCASE_SQL = """
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_words,
       array_to_string(w[1:3], '-') AS first3,
       list_contains(w, 'the') AS has_the,
       list_sort(list_distinct(w))[1] AS first_sorted_uniq,
       list_sort(list_distinct(w))[-1] AS last_sorted_uniq,
       CAST(list_sum(list_transform(list_distinct(w), x -> length(x)))
            AS BIGINT) AS uniq_char_total,
       CAST(len(list_distinct(w)) AS BIGINT) AS uniq_via_map,
       'words' AS first_map_key
FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d
WHERE doc_id <= 50 ORDER BY doc_id
"""


SPECS = [
    QuerySpec("window_function_showcase", window_function_showcase,
              WINDOW_SHOWCASE_SQL, "rank/ntile/percent_rank/cume_dist/lead/lag"),
    QuerySpec("string_function_showcase", string_function_showcase,
              STRING_SHOWCASE_SQL, "string scalar function family"),
    QuerySpec("array_map_function_showcase", array_map_function_showcase,
              ARRAY_MAP_SHOWCASE_SQL, "array + map scalar function surface"),
    QuerySpec("date_function_showcase", date_function_showcase,
              DATE_SHOWCASE_SQL, "date/time scalar function family"),
]
