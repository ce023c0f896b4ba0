"""Star-schema relational query surface (SURVEY.md §2.B).

Covers: scans with pushdown, the full join family (inner / semi / anti /
broadcast), aggregations (incl. rollup, cube, count-distinct), windows
(latest-per-group, running totals, rank-based top-k), sort/limit/top-k,
set ops (EXCEPT / INTERSECT — the snapshot-diff pattern), and pagination
(offset/limit — CatalogPort.listTablesPaginated pattern).

Scale notes: dimension tables (region/nation/supplier/customer) broadcast
under the session's 64 MB threshold even at sf100; the fact-side joins
shuffle on their join keys once and reuse the exchange.  All filters are
plain column predicates so Catalyst pushes them into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import round_stable
from ..sources.tables import load_table
from .spec import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def money_sum(expr, scale: int = 2):
    """Engine-stable money sum: cast each (deterministic, per-element)
    double term to DECIMAL(18,6) and sum exactly — summation order can no
    longer move the result, so ROUND agrees with any other engine doing
    the same.  (Raw double sums of price*(1-disc) are exact 4-decimal
    values mathematically; ~1% of groups land exactly on a round-half
    boundary where Spark and DuckDB double-rounding disagree.)

    SQL mirror: CAST(ROUND(SUM(CAST(expr AS DECIMAL(18,6))), 2) AS DOUBLE)
    """
    return F.round(F.sum(expr.cast("decimal(18,6)")), scale).cast("double")


# --- q1: pricing summary (scan + filter + wide aggregation) -----------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(charge).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- q3: shipping priority (3-way join + agg + deterministic top-k) ---------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- q5: local supplier volume (5-way join, region filter) ------------------

def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# --- flagship: revenue by nation (the entry() query) ------------------------

def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join lineitem→orders→customer→nation→region, revenue per nation.

    The reference hands query engines a file list and expects exactly this
    kind of star-schema aggregation over it (SURVEY §2.B; ReadRouter
    getDataFiles → engine scan).  nation/region broadcast; the
    lineitem⋈orders shuffle is the only exchange.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("lineitem_count"),
        )
        .orderBy("r_name", "n_name")
    )


REVENUE_BY_NATION_SQL = """
SELECT r_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS lineitem_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


# --- top customers by spend (agg + join + deterministic top-k) --------------

def top_customers_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    spend = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        F.count(F.lit(1)).alias("order_count"),
    )
    return (
        spend.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "total_spend", "order_count")
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(10)
    )


TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, total_spend, order_count
FROM (
  SELECT o_custkey,
         ROUND(SUM(o_totalprice), 2) AS total_spend,
         COUNT(*) AS order_count
  FROM orders GROUP BY o_custkey
) s
JOIN customer ON o_custkey = c_custkey
ORDER BY total_spend DESC, c_custkey ASC
LIMIT 10
"""


# --- rollup / cube (grouping-sets family) -----------------------------------

def segment_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("c_mktsegment", "n_name")
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_balance"),
        )
    )


SEGMENT_NATION_ROLLUP_SQL = """
SELECT c_mktsegment, n_name,
       COUNT(*) AS customer_count,
       ROUND(SUM(c_acctbal), 2) AS total_balance,
       ROUND(AVG(c_acctbal), 4) AS avg_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (c_mktsegment, n_name)
"""


def region_segment_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .cube("r_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_balance"),
        )
    )


REGION_SEGMENT_CUBE_SQL = """
SELECT r_name, c_mktsegment,
       COUNT(*) AS customer_count,
       ROUND(AVG(c_acctbal), 4) AS avg_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE (r_name, c_mktsegment)
"""


# --- windows: latest-per-group (getLatestMetadata pattern) ------------------

def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number over (customer, orderdate desc) — the reference's
    latest-snapshot-per-table lookup (CatalogPort.getLatestMetadata,
    ReplicationPlanner.java:75-76 argmax-by-sequence) as a window query."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
            F.round(F.col("o_totalprice"), 2).alias("latest_totalprice"),
        )
    )


LATEST_ORDER_SQL = """
SELECT o_custkey,
       o_orderkey AS latest_orderkey,
       o_orderdate AS latest_orderdate,
       ROUND(o_totalprice, 2) AS latest_totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) t WHERE rn = 1
"""


# --- windows: running totals (SyncProgress backlog pattern) -----------------

def running_revenue_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("monthly_revenue"))
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.withColumn(
        "running_revenue", F.round(F.sum("monthly_revenue").over(w), 2)
    ).orderBy("month")


RUNNING_REVENUE_SQL = """
SELECT month, monthly_revenue,
       ROUND(SUM(monthly_revenue) OVER (
           ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_revenue
FROM (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         ROUND(SUM(o_totalprice), 2) AS monthly_revenue
  FROM orders GROUP BY 1
) m
ORDER BY month
"""


# --- semi / anti joins (sync skip-if-exists / dedup patterns) ---------------

def priority_counts_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders having ≥1 returned lineitem — LEFT SEMI join, the reference's
    skip-if-exists probe (SyncOrchestrator.scala:114-118) inverted."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


PRIORITY_RETURNS_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — the orphan-detection set difference
    (Inventory − Reachable, iceberg-arch-geo-distributed-ha.md:886-899)."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        part.join(li, F.col("p_partkey") == F.col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


PARTS_NEVER_ORDERED_SQL = """
SELECT p_partkey, p_name, p_brand
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
ORDER BY p_partkey
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


# --- set ops: EXCEPT / INTERSECT (snapshot-diff pattern) --------------------

def open_minus_finished_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT — the manifest set-diff at the heart of
    ReplicationPlanner.java:78-84 (files@vN − files@vK)."""
    orders = _t(spark, sf_dir, "orders")
    open_ = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    fin = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return open_.subtract(fin).orderBy("o_custkey")


OPEN_MINUS_FINISHED_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY o_custkey
"""


def all_activity_keys_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + dedup-count — the remaining set-op (union) with a
    per-source count (orders ∪ lineitem key usage)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    unioned = orders.select(
        F.col("o_orderkey").alias("orderkey"), F.lit("orders").alias("src")
    ).unionByName(
        li.select(F.col("l_orderkey").alias("orderkey"), F.lit("lineitem").alias("src"))
    )
    return (
        unioned.groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.countDistinct("orderkey").alias("distinct_keys"),
        )
        .orderBy("src")
    )


UNION_KEYS_SQL = """
SELECT src, COUNT(*) AS row_count, COUNT(DISTINCT orderkey) AS distinct_keys
FROM (
  SELECT o_orderkey AS orderkey, 'orders' AS src FROM orders
  UNION ALL
  SELECT l_orderkey AS orderkey, 'lineitem' AS src FROM lineitem
) u
GROUP BY src ORDER BY src
"""


def open_and_finished_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    open_ = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    fin = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return open_.intersect(fin).orderBy("o_custkey")


OPEN_AND_FINISHED_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY o_custkey
"""


# --- supplier/part volume top-k --------------------------------------------

def supplier_part_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("s_name", "p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.count(F.lit(1)).alias("shipment_count"),
        )
        .orderBy(F.desc("total_qty"), F.asc("s_name"), F.asc("p_brand"))
        .limit(15)
    )


SUPPLIER_PART_VOLUME_SQL = """
SELECT s_name, p_brand,
       ROUND(SUM(l_quantity), 2) AS total_qty,
       COUNT(*) AS shipment_count
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN part ON l_partkey = p_partkey
GROUP BY s_name, p_brand
ORDER BY total_qty DESC, s_name ASC, p_brand ASC
LIMIT 15
"""


# --- date/time scalar functions + stats -------------------------------------

def monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_sales"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_sale"),
            F.round(F.min("o_totalprice"), 2).alias("min_sale"),
            F.round(F.max("o_totalprice"), 2).alias("max_sale"),
        )
        .orderBy("month")
    )


MONTHLY_ORDER_STATS_SQL = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
       COUNT(*) AS order_count,
       ROUND(SUM(o_totalprice), 2) AS total_sales,
       ROUND(AVG(o_totalprice), 4) AS avg_sale,
       ROUND(MIN(o_totalprice), 2) AS min_sale,
       ROUND(MAX(o_totalprice), 2) AS max_sale
FROM orders GROUP BY 1 ORDER BY month
"""


def nations_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — distinct-aggregation path."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("nation_count"),
            F.count(F.lit(1)).alias("customer_count"),
        )
        .orderBy("c_mktsegment")
    )


NATIONS_PER_SEGMENT_SQL = """
SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS nation_count,
       COUNT(*) AS customer_count
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# --- conditional aggregation ------------------------------------------------

def order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum(CASE WHEN …) conditional aggregation — the commit-gate quorum
    computation (approved==required && rejected==0,
    InMemoryCommitGateAdapter.java:212-227) is exactly this shape."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
            .cast("bigint")
            .alias("open_count"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("finished_count"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0))
            .cast("bigint")
            .alias("pending_count"),
            F.round(
                F.sum(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")).otherwise(0.0)),
                2,
            ).alias("open_value"),
        )
        .orderBy("o_orderpriority")
    )


ORDER_STATUS_PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_count,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_count,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS pending_count,
       ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END), 2) AS open_value
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- pagination (CatalogPort.listTablesPaginated pattern) -------------------

def orders_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


ORDERS_PAGE_SQL = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100
"""


# --- argmax per group (ReadRouter.selectOptimalRegion pattern) --------------

def top_nation_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score each group then argmax — ReadRouter.scala:75-88 (score all regions
    in parallel, maxBy score) as a rank-1 window query."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    per_nation = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum("c_acctbal"), 2).alias("total_balance"))
    )
    w = Window.partitionBy("r_name").orderBy(F.desc("total_balance"), F.asc("n_name"))
    return (
        per_nation.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("r_name", F.col("n_name").alias("top_nation"), "total_balance")
        .orderBy("r_name")
    )


TOP_NATION_PER_REGION_SQL = """
SELECT r_name, n_name AS top_nation, total_balance
FROM (
  SELECT r_name, n_name, total_balance,
         ROW_NUMBER() OVER (PARTITION BY r_name
                            ORDER BY total_balance DESC, n_name ASC) AS rn
  FROM (
    SELECT r_name, n_name, ROUND(SUM(c_acctbal), 2) AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
  ) pn
) ranked WHERE rn = 1
ORDER BY r_name
"""


def nation_health_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's weighted region health score
    (ReadRouter.scala:93-116: 0.7*storage + 0.3*activity) computed as a
    pure column expression over per-nation aggregates."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    agg = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.avg("c_acctbal").alias("_avg_bal"),
            F.count(F.lit(1)).alias("customer_count"),
        )
    )
    score = F.round(
        0.7 * (F.col("_avg_bal") / 10000.0) + 0.3 * (F.col("customer_count") / 1000.0), 6
    )
    return (
        agg.select("n_name", "customer_count", score.alias("health_score"))
        .orderBy(F.desc("health_score"), F.asc("n_name"))
    )


NATION_HEALTH_SCORE_SQL = """
SELECT n_name, customer_count,
       ROUND(0.7 * (avg_bal / 10000.0) + 0.3 * (customer_count / 1000.0), 6)
           AS health_score
FROM (
  SELECT n_name, AVG(c_acctbal) AS avg_bal, COUNT(*) AS customer_count
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
) a
ORDER BY health_score DESC, n_name ASC
"""


# --- q7-style: volume between nation pairs ----------------------------------

def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 adaptation: shipping volume between (customer nation,
    supplier nation) pairs per year — two independent dimension lineages
    joined to one fact scan."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation", "supp_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("volume"),
            F.count(F.lit(1)).alias("shipment_count"),
        )
        .filter(F.col("ship_year").isin(1996, 1997))
        .orderBy("cust_nation", "supp_nation", "ship_year")
    )


NATION_PAIR_VOLUME_SQL = """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS volume,
       COUNT(*) AS shipment_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
  AND year(l_shipdate) IN (1996, 1997)
GROUP BY 1, 2, 3
ORDER BY cust_nation, supp_nation, ship_year
"""


# --- q10-style: returned-item reporting --------------------------------------

def top_return_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 adaptation: customers ranked by revenue lost to returns
    in a quarter."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("lost_revenue"),
            F.count(F.lit(1)).alias("returned_items"),
        )
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


TOP_RETURN_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS lost_revenue,
       COUNT(*) AS returned_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- percentiles (distribution stats) ---------------------------------------

def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per segment (Spark ``percentile`` ≡
    DuckDB ``quantile_cont`` — both linear interpolation)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .orderBy("c_mktsegment")
    )


ORDER_PERCENTILES_SQL = """
SELECT c_mktsegment,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99,
       COUNT(*) AS order_count
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# --- q6: forecast revenue (selective filter fully pushed to the scan) -------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 adaptation: pure scan+filter+agg — every predicate reaches
    the parquet reader (PushedFilters), no join, no shuffle beyond the
    single-row final agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


Q6_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
       AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --- q14: promo revenue ratio -----------------------------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 adaptation: conditional aggregation ratio over a
    fact⋈dim join (part broadcasts)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    num = F.sum(
        F.when(F.col("p_type").startswith("PROMO"), disc.cast("decimal(18,6)"))
        .otherwise(F.lit(0).cast("decimal(18,6)"))
    ).cast("double")
    den = F.sum(disc.cast("decimal(18,6)")).cast("double")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(round_stable(F.lit(100.0) * num / den, 4).alias("promo_revenue"))
    )


Q14_SQL = """
SELECT ROUND(100.0
         * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                         THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
         - 0.000000001, 4) + 0.0 AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
"""


# --- q9-style: profit by supplier nation × year -----------------------------

def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adaptation (no ps_supplycost in the testdata): revenue by
    SUPPLIER nation and ship year — joins the fact through l_suppkey
    (a different lineage than the customer-side star queries)."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("bigint").alias("o_year"),
        )
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_profit"
            )
        )
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS o_year,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)
            AS DOUBLE) AS sum_profit
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


# --- q18: large-volume orders (HAVING → semi join back to the fact) ---------

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 adaptation: groupBy-HAVING subquery identifies big
    orders, then joins back through orders⋈customer for the report —
    top-100 by quantity with deterministic tie-break."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 180)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY 1 HAVING ROUND(SUM(l_quantity), 2) > 180
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
LIMIT 100
"""


# --- q13: customer order-count distribution (outer join + re-aggregation) --

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 adaptation: LEFT OUTER join keeps zero-order customers,
    then a second aggregation builds the histogram of customers per
    order count."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count ignores nulls
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) pc
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# --- q19: disjunctive multi-attribute predicate join ------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 adaptation: OR-of-ANDs join predicate (brand × size ×
    quantity bands) — exercises disjunctive filter handling where only
    the shared l_partkey = p_partkey conjunct drives the join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("matched_lines"),
        )
    )


Q19_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS matched_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# --- q2-style: cheapest supplier per part (min-per-group correlation) -------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adaptation (no partsupp in the testdata): per part brand,
    the supplier with the minimum account balance — the correlated
    min-subquery pattern expressed as a window rank (one shuffle, no
    re-join against the aggregate)."""
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    # min_by over a (acctbal, suppkey) struct key, NOT a window ranked on
    # the ~25-value nation key: the aggregate partial-combines map-side
    # (each input partition reduces to <=25 rows before the shuffle),
    # where a window would sort the whole supplier table through 25
    # tasks.  The struct key keeps the suppkey tiebreak deterministic.
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.min_by(
                F.struct("s_suppkey", "s_name", "s_acctbal"),
                F.struct("s_acctbal", "s_suppkey"),
            ).alias("best")
        )
        .select(
            "n_name", "best.s_suppkey", "best.s_name", "best.s_acctbal"
        )
        .orderBy("n_name")
    )


Q2_SQL = """
SELECT n_name, s_suppkey, s_name, s_acctbal
FROM (
  SELECT n_name, s_suppkey, s_name, s_acctbal,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY s_acctbal ASC, s_suppkey ASC) AS rn
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
) x WHERE rn = 1 ORDER BY n_name
"""


# --- q15-style: top revenue supplier(s) (argmax against an aggregate) -------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 adaptation: revenue per supplier over a quarter, then
    the supplier(s) achieving the global maximum — the view + scalar-max
    correlation, expressed with a window max over the aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    # Broadcast scalar-max against the aggregate, not a global
    # (single-partition) window: the empty-key window would funnel every
    # per-supplier row through one task at scale.
    max_rev = rev.agg(F.max("total_revenue").alias("max_rev"))
    top = rev.crossJoin(F.broadcast(max_rev)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    return (
        top.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# --- q22-style: above-average idle customers (scalar subquery + anti join) --

def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adaptation: customers with above-average positive
    balance and NO orders — scalar-aggregate subquery (broadcast as a
    1-row cross join) + LEFT ANTI join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


Q22_SQL = """
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1 ORDER BY c_nationkey
"""


# --- explicit GROUPING SETS (beyond rollup/cube) ----------------------------

def segment_priority_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS: totals by (segment), by (priority), and
    overall — the general form rollup/cube specialize."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    j = cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
    j.createOrReplaceTempView("_gs_join")
    return spark.sql("""
        SELECT c_mktsegment AS segment, o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS order_count
        FROM _gs_join
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
        ORDER BY segment NULLS FIRST, priority NULLS FIRST
    """)


GROUPING_SETS_SQL = """
SELECT c_mktsegment AS segment, o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
ORDER BY segment NULLS FIRST, priority NULLS FIRST
"""


# --- q4: late-shipment priority counts (correlated-condition EXISTS) -------

def q4_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adaptation (no l_commitdate: lateness = shipped after the
    order date + 30 days): EXISTS with a CORRELATED inequality,
    decorrelated through the per-key extremum —

        EXISTS (l: l_shipdate > X)  ⟺  MAX(l_shipdate) > X

    so lineitem collapses to one (l_orderkey, max_shipdate) row via a
    map-side-partial aggregate BEFORE any join, and the join itself is a
    plain equi-join on the key.  The r10 sf1 bench caught the direct
    semi-join form broadcasting the ENTIRE 2-column lineitem as the
    build side (267 MiB materialized at 10x — the non-equi residual
    riding on the equi-key let the size estimate slip under the 64 MiB
    threshold; 5.5x wall on 10x data, and a guaranteed driver OOM at
    real scale).  The aggregate form is value-identical, cuts the join
    side ~6:1 to one row per order, and at 100 TB degrades to one
    partial-agg shuffle + a shuffled equi-join — no corpus-proportional
    broadcast anywhere (10x ratio 5.5 → ~1.3)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    in_window = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    last_ship = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_shipdate")
    )
    late = in_window.join(
        last_ship, F.col("l_orderkey") == F.col("o_orderkey")
    ).filter(
        F.col("max_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY 1 ORDER BY o_orderpriority
"""


# --- q17: small-quantity revenue vs per-part average ------------------------

def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 adaptation: lineitems whose quantity is below 0.2× their
    PART's average quantity — the correlated per-group average, expressed
    as an aggregate joined back to the fact.  (Integer-valued doubles sum
    exactly, so the 0.2*avg threshold is engine-identical.)"""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("p_brand").isin("Brand#1", "Brand#2"))
        .join(avg_q, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            round_stable(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
                / 7.0,
                4,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("matched_lines"),
        )
    )


Q17_SQL = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
             - 0.000000001, 4) + 0.0 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS matched_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand IN ('Brand#1', 'Brand#2')
  AND l_quantity < 0.2 * (SELECT AVG(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = lineitem.l_partkey)
"""


# --- q8: national market share (share-of-total conditional ratio) -----------

def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 adaptation: of all ECONOMY-part revenue sold to AMERICA
    customers in 1996-1997, the share supplied by NATION_6, per order
    year.  The two dimension lineages (customer→nation→region filter,
    supplier→nation share flag) hang off one fact scan; all five dims
    broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    supp = _t(spark, sf_dir, "supplier")
    cust_nat = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    supp_nat = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nat), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nat), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            round_stable(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_6", rev)
                    .otherwise(F.lit(0.0))
                    .cast("decimal(18,6)")
                ).cast("double")
                / F.sum(rev.cast("decimal(18,6)")).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
       ROUND(CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_6'
                                THEN l_extendedprice * (1 - l_discount)
                                ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE)
             - 0.000000001, 6) + 0.0 AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND p_type = 'ECONOMY' AND r_name = 'AMERICA'
GROUP BY 1 ORDER BY o_year
"""


# --- q11: important parts (group agg vs global-scalar threshold) ------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adaptation (no partsupp: value = shipped revenue instead
    of stock value): per-part revenue from NATION_3's suppliers, keeping
    parts above 0.1% of the nation's total — the aggregate-vs-global-
    scalar pattern as a broadcast cross join.  The threshold compares
    exact DECIMAL sums (value·1000 > total), so no float boundary."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    val = (
        li.join(
            F.broadcast(
                supp.join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,6)")
            ).alias("value_exact")
        )
    )
    total = val.agg(F.sum("value_exact").alias("total_exact"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("value_exact") * 1000 > F.col("total_exact"))
        .select(
            "l_partkey",
            F.round(F.col("value_exact"), 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


Q11_SQL = """
WITH val AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS value_exact
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY 1
)
SELECT l_partkey, CAST(ROUND(value_exact, 2) AS DOUBLE) AS part_value
FROM val
WHERE value_exact * 1000 > (SELECT SUM(value_exact) FROM val)
ORDER BY part_value DESC, l_partkey ASC
"""


# --- q12: late shipments by priority class (conditional two-way counts) -----

def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adaptation (no l_shipmode/receiptdate: late = shipped
    more than 60 days after the order date; classes by ship year):
    join + CASE-conditional dual counts of critical vs other priority."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


Q12_SQL = """
SELECT CAST(YEAR(l_shipdate) AS INT) AS ship_year,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY 1 ORDER BY ship_year
"""


# --- q16: supplier diversity per part attribute (NOT IN + count distinct) ---

def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adaptation (supplier relationships observed from
    lineitem instead of partsupp): distinct suppliers per (p_type,
    p_size) outside Brand#1, excluding delinquent (negative-balance)
    suppliers — the NOT IN subquery as a broadcast LEFT ANTI join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 14, 19, 23)
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_type"), F.asc("p_size"))
    )


Q16_SQL = """
SELECT p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 14, 19, 23)
  -- NOT EXISTS, not NOT IN: matches the Spark side's left_anti null
  -- semantics if the subquery ever produced a NULL key
  AND NOT EXISTS (SELECT 1 FROM supplier
                  WHERE s_acctbal < 0 AND s_suppkey = l_suppkey)
GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_type ASC, p_size ASC
"""


# --- q20: dominant suppliers of blue parts (nested agg + semi-join chain) ---

def q20_dominant_blue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adaptation (no ps_availqty: excess = the supplier moved
    more than half of a part's 1996 volume): nested aggregation feeding
    a semi-join chain up to the supplier list.  Quantities are integer-
    valued doubles, so qty·2 > total is exact in both engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    blue = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("blue%"))
        .select("p_partkey")
    )
    sp = (
        li.join(F.broadcast(blue), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    # per-part total via a window keeps the (l_partkey) shuffle from sp
    w = Window.partitionBy("l_partkey")
    dominant = (
        sp.withColumn("part_qty", F.sum("supp_qty").over(w))
        .filter(F.col("supp_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
WITH sp AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'blue%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
)
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM (
    SELECT l_suppkey, supp_qty,
           SUM(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
    FROM sp
  ) x WHERE supp_qty * 2 > part_qty
)
ORDER BY s_suppkey
"""


# --- q21: suppliers who kept waiting (EXISTS + NOT EXISTS correlation) ------

def q21_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adaptation (no receipt/commit dates: the 'blocking'
    supplier is the one whose line shipped strictly last among a
    finished multi-supplier order): EXISTS(another supplier) AND NOT
    EXISTS(another supplier shipped later), decorrelated into per-
    (order, supplier) aggregates + windows — no per-row subqueries, two
    shuffles on o_orderkey that AQE reuses."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem").join(
        orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("s_max")
    )
    w = Window.partitionBy("l_orderkey")
    per_os = (
        per_os.withColumn("nsupp", F.count(F.lit(1)).over(w))
        .withColumn("m1", F.max("s_max").over(w))
        .withColumn(
            "cnt_m1",
            F.sum(F.when(F.col("s_max") == F.col("m1"), 1).otherwise(0)).over(w),
        )
        .withColumn(
            "m2",
            F.max(F.when(F.col("s_max") < F.col("m1"), F.col("s_max"))).over(w),
        )
        .withColumn(
            "max_other",
            F.when(F.col("nsupp") == 1, F.lit(None))
            .when((F.col("s_max") < F.col("m1")) | (F.col("cnt_m1") > 1), F.col("m1"))
            .otherwise(F.col("m2")),
        )
    )
    waits = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            per_os.select("l_orderkey", "l_suppkey", "nsupp", "max_other"),
            ["l_orderkey", "l_suppkey"],
        )
        .filter((F.col("nsupp") > 1) & (F.col("l_shipdate") >= F.col("max_other")))
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        waits.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


Q21_SQL = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name ORDER BY numwait DESC, s_name ASC LIMIT 20
"""


SPECS = [
    QuerySpec("q8_national_market_share", q8_national_market_share, Q8_SQL,
              "share-of-total ratio over a dual-lineage star join"),
    QuerySpec("q11_important_parts", q11_important_parts, Q11_SQL,
              "aggregate vs global-scalar threshold (exact decimal)"),
    QuerySpec("q12_late_shipment_priority", q12_late_shipment_priority, Q12_SQL,
              "CASE-conditional dual counts over a lateness join"),
    QuerySpec("q16_supplier_diversity", q16_supplier_diversity, Q16_SQL,
              "NOT IN as broadcast anti join + COUNT(DISTINCT)"),
    QuerySpec("q20_dominant_blue_suppliers", q20_dominant_blue_suppliers, Q20_SQL,
              "nested aggregation + semi-join chain"),
    QuerySpec("q21_last_shipper", q21_last_shipper, Q21_SQL,
              "EXISTS/NOT-EXISTS decorrelated into windowed aggregates"),
    QuerySpec("q4_priority_late_orders", q4_priority_late_orders, Q4_SQL,
              "correlated-inequality EXISTS semi join"),
    QuerySpec("q17_small_quantity_revenue", q17_small_quantity_revenue, Q17_SQL,
              "per-group average correlation joined back to the fact"),
    QuerySpec("q2_min_cost_supplier", q2_min_cost_supplier, Q2_SQL,
              "min-per-group correlation as window rank"),
    QuerySpec("q15_top_supplier", q15_top_supplier, Q15_SQL,
              "argmax against an aggregated view"),
    QuerySpec("q22_idle_rich_customers", q22_idle_rich_customers, Q22_SQL,
              "scalar-avg subquery + anti join"),
    QuerySpec("segment_priority_grouping_sets", segment_priority_grouping_sets,
              GROUPING_SETS_SQL, "explicit GROUPING SETS"),
    QuerySpec("q13_customer_distribution", q13_customer_distribution, Q13_SQL,
              "LEFT OUTER join + two-level aggregation histogram"),
    QuerySpec("q19_disjunctive_revenue", q19_disjunctive_revenue, Q19_SQL,
              "OR-of-ANDs predicate join"),
    QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL,
              "pure pushdown filter + single-row agg"),
    QuerySpec("q14_promo_revenue", q14_promo_revenue, Q14_SQL,
              "conditional-aggregation ratio over fact⋈dim"),
    QuerySpec("q9_profit_by_nation_year", q9_profit_by_nation_year, Q9_SQL,
              "supplier-lineage star join + year bucketing"),
    QuerySpec("q18_large_orders", q18_large_orders, Q18_SQL,
              "HAVING subquery joined back to the fact (top-k)"),
    QuerySpec("order_value_percentiles", order_value_percentiles,
              ORDER_PERCENTILES_SQL, "exact interpolated percentiles per group"),
    QuerySpec("nation_pair_volume", nation_pair_volume, NATION_PAIR_VOLUME_SQL,
              "Q7-style dual-dimension-lineage volume"),
    QuerySpec("top_return_customers", top_return_customers, TOP_RETURN_CUSTOMERS_SQL,
              "Q10-style returned-item ranking"),
    QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_SQL,
              "TPC-H Q1-style wide aggregation with filter pushdown"),
    QuerySpec("q3_shipping_priority", q3_shipping_priority, Q3_SQL,
              "3-way join + agg + deterministic top-k"),
    QuerySpec("q5_nation_revenue", q5_nation_revenue, Q5_SQL,
              "5-way star join with region filter"),
    QuerySpec("revenue_by_nation", revenue_by_nation, REVENUE_BY_NATION_SQL,
              "flagship star aggregation (entry query)"),
    QuerySpec("top_customers_by_spend", top_customers_by_spend, TOP_CUSTOMERS_SQL,
              "agg + join + top-k"),
    QuerySpec("segment_nation_rollup", segment_nation_rollup, SEGMENT_NATION_ROLLUP_SQL,
              "ROLLUP grouping sets"),
    QuerySpec("region_segment_cube", region_segment_cube, REGION_SEGMENT_CUBE_SQL,
              "CUBE grouping sets"),
    QuerySpec("latest_order_per_customer", latest_order_per_customer, LATEST_ORDER_SQL,
              "latest-per-group window (getLatestMetadata pattern)"),
    QuerySpec("running_revenue_by_month", running_revenue_by_month, RUNNING_REVENUE_SQL,
              "running-total window frame"),
    QuerySpec("priority_counts_with_returns", priority_counts_with_returns,
              PRIORITY_RETURNS_SQL, "LEFT SEMI join (EXISTS)"),
    QuerySpec("parts_never_ordered", parts_never_ordered, PARTS_NEVER_ORDERED_SQL,
              "LEFT ANTI join (orphan-detection pattern)"),
    QuerySpec("customers_without_orders", customers_without_orders,
              CUSTOMERS_WITHOUT_ORDERS_SQL, "LEFT ANTI join"),
    QuerySpec("open_minus_finished_custkeys", open_minus_finished_custkeys,
              OPEN_MINUS_FINISHED_SQL, "EXCEPT (snapshot-diff pattern)"),
    QuerySpec("open_and_finished_custkeys", open_and_finished_custkeys,
              OPEN_AND_FINISHED_SQL, "INTERSECT"),
    QuerySpec("all_activity_keys_union", all_activity_keys_union, UNION_KEYS_SQL,
              "UNION ALL + per-source distinct counts"),
    QuerySpec("supplier_part_volume", supplier_part_volume, SUPPLIER_PART_VOLUME_SQL,
              "fact⋈dim⋈dim broadcast joins + top-k"),
    QuerySpec("monthly_order_stats", monthly_order_stats, MONTHLY_ORDER_STATS_SQL,
              "date_trunc bucketing + min/max/avg"),
    QuerySpec("nations_per_segment", nations_per_segment, NATIONS_PER_SEGMENT_SQL,
              "exact COUNT(DISTINCT)"),
    QuerySpec("order_status_pivot", order_status_pivot, ORDER_STATUS_PIVOT_SQL,
              "conditional aggregation (quorum pattern)"),
    QuerySpec("orders_page", orders_page, ORDERS_PAGE_SQL,
              "ORDER BY + OFFSET/LIMIT pagination"),
    QuerySpec("top_nation_per_region", top_nation_per_region, TOP_NATION_PER_REGION_SQL,
              "argmax-per-group (routeRead pattern)"),
    QuerySpec("nation_health_score", nation_health_score, NATION_HEALTH_SCORE_SQL,
              "weighted scoring expression (scoreRegion pattern)"),
]
