"""Advanced join + text-weighting operators (SURVEY §2.B joins row:
"range/interval via non-equi conditions; as-of via window").

- as-of join: for each purchase, the user's most recent prior click.
  Spark has no ASOF JOIN operator; the composition is equi-join on the
  key + range predicate + rank-1 window.  (At 100 TB the same result
  comes from the union-sort-last_value pattern, one shuffle on user_id —
  the windowed form here keeps the plan simple and the semantics
  identical; both shuffle only on the join key.)  DuckDB oracle uses its
  native ASOF LEFT JOIN.
- range join: interval self-join (orders of the same customer within 30
  days) — equi key + range residual, the banded-join shape.
- TF-IDF: explode → tf per (doc,term), df per term, idf = ln(N/df) —
  corpus-wide statistics with per-doc weights, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .spec import QuerySpec


def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"), F.col("user_id"), F.col("ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_event_id"),
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id")) & (F.col("click_ts") <= F.col("ts")),
        "left",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.desc_nulls_last("click_ts"), F.desc_nulls_last("click_event_id")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("click_ts").alias("last_click_ts"),
        )
        .orderBy("event_id")
    )


ASOF_SQL = """
SELECT p.event_id, p.user_id,
       p.ts AS purchase_ts,
       c.ts AS last_click_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
ORDER BY p.event_id
"""


def orders_within_30_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded interval self-join: follow-up orders of the same customer
    within 30 days — equi shuffle on the customer key, range residual."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("first_orderkey"),
        F.col("o_orderdate").alias("first_date"),
    )
    b = orders.select(
        F.col("o_custkey").alias("b_custkey"),
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_orderdate").alias("next_date"),
    )
    pairs = a.join(
        b,
        (F.col("custkey") == F.col("b_custkey"))
        & (F.col("next_orderkey") != F.col("first_orderkey"))
        & (F.col("next_date") >= F.col("first_date"))
        & (F.col("next_date") <= F.col("first_date") + F.expr("INTERVAL 30 DAYS")),
    )
    return (
        pairs.groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("followup_pairs"))
        .orderBy("custkey")
    )


RANGE_JOIN_SQL = """
SELECT a.o_custkey AS custkey, COUNT(*) AS followup_pairs
FROM orders a
JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND b.o_orderkey <> a.o_orderkey
 AND b.o_orderdate >= a.o_orderdate
 AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY
GROUP BY a.o_custkey
ORDER BY custkey
"""


def doc_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF term weights: tf from per-doc explode, df per term over the
    WHOLE corpus, idf = ln(N/df); reported for doc_id < 20 (statistics
    stay corpus-wide).  Two shuffles (doc-term, term) regardless of
    corpus size; the N scalar broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tokens.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("nn"))
    idf = F.log(F.col("nn") * 1.0 / F.col("df"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .filter(F.col("doc_id") < 20)
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(idf, 6).alias("idf"),
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
        .orderBy("doc_id", "term")
    )


TFIDF_SQL = """
WITH tokens AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tokens GROUP BY 1, 2
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY 1
), n AS (SELECT COUNT(*) AS nn FROM documents)
SELECT doc_id, term, tf,
       ROUND(ln(nn * 1.0 / df), 6) AS idf,
       ROUND(tf * ln(nn * 1.0 / df), 6) AS tfidf
FROM tf JOIN dfreq USING (term), n
WHERE doc_id < 20
ORDER BY doc_id, term
"""


SPECS = [
    QuerySpec("asof_last_click_before_purchase", asof_last_click_before_purchase,
              ASOF_SQL, "as-of join (key equi + range + rank-1 window)"),
    QuerySpec("orders_within_30_days", orders_within_30_days, RANGE_JOIN_SQL,
              "banded interval self-join"),
    QuerySpec("doc_tfidf", doc_tfidf, TFIDF_SQL,
              "TF-IDF term weighting with corpus-wide statistics"),
]
