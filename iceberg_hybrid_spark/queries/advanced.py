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


# Per-basket fan-out cap for association-rule mining: each basket
# contributes at most cap*(cap-1)/2 pair rows regardless of its size.
# TPC-H baskets run 1-7 distinct parts, so 5 genuinely binds here while
# keeping the sf-scale result rich; a production corpus with retail
# mega-baskets is exactly where the cap earns its keep.
_BASKET_CAP = 5


def part_affinity_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining (Agrawal et al., SIGMOD 1993) over order
    baskets: parts that co-occur in the same order far above chance —
    support, directed confidence, and lift for every pair above the
    min-support floor, top-20 by lift.  The market-basket operator
    behind "customers who bought X also bought Y".

    Scale shape: ONE shuffle on the order key (collect_set) does basket
    de-dup, assembly, AND the ``_BASKET_CAP`` smallest-part-keys cap
    (the standard market-basket fan-out mitigation — a retail
    mega-basket of 10k items would otherwise contribute 50M pair rows
    by itself); pairs then generate MAP-SIDE from each sorted capped
    array (x before y in the array ⇒ x < y), so pair volume is
    O(baskets·cap²) at ANY basket-size distribution — never all-pairs
    across baskets, never quadratic in a pathological basket, and no
    self-join at all (r8 rewrite: replaced distinct → row_number window
    → self-join, three shuffles; 16x floor 7.5 -> 3.9 s).  The cap rule
    is deterministic (smallest part keys win) and expressed identically
    in the oracle SQL, so the value gate pins the capped semantics.
    Pair counts partial-aggregate; the per-part counts and the
    single-row basket total attach to the min-support-filtered pair
    relation (the whitelisted scalar shape).  Integer arithmetic until
    the three final divisions."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE shuffle on the order key does dedup + cap + basket assembly:
    # collect_set de-dups parts within the basket, array_sort + slice
    # keeps the _BASKET_CAP smallest, and pairs then GENERATE MAP-SIDE
    # from the sorted array (x before y in the array ⇒ x < y, so no
    # self-join and no separate distinct/window shuffles — r8 rewrite,
    # was distinct → row_number window → self-join, three shuffles).
    baskets = li.groupBy(F.col("l_orderkey").alias("o")).agg(
        F.slice(
            F.array_sort(F.collect_set("l_partkey")), 1, _BASKET_CAP
        ).alias("parts")
    )
    n_b = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    part_n = (
        baskets.select(F.explode("parts").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_p"))
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) ->"
                    " transform(slice(parts, i + 2, size(parts)),"
                    " y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("pr")
        )
        .select("pr.part_a", "pr.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("pair_orders"))
        .filter(F.col("pair_orders") >= 3)
    )
    na = part_n.select(F.col("p").alias("part_a"), F.col("n_p").alias("orders_a"))
    nb = part_n.select(F.col("p").alias("part_b"), F.col("n_p").alias("orders_b"))
    return (
        pairs.join(na, "part_a")
        .join(nb, "part_b")
        .crossJoin(F.broadcast(n_b))
        .selectExpr(
            "part_a",
            "part_b",
            "pair_orders",
            "orders_a",
            "orders_b",
            "ROUND(CAST(pair_orders AS DOUBLE) / n_baskets"
            " - 0.000000001, 6) + 0.0 AS support",
            "ROUND(CAST(pair_orders AS DOUBLE) / orders_a"
            " - 0.000000001, 4) + 0.0 AS confidence_a_to_b",
            "ROUND(CAST(pair_orders * n_baskets AS DOUBLE)"
            " / (orders_a * orders_b) - 0.000000001, 4) + 0.0 AS lift",
        )
        .orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


PART_AFFINITY_SQL = """
WITH op_all AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), op AS (
  SELECT o, p FROM (
    SELECT o, p, row_number() OVER (PARTITION BY o ORDER BY p) AS rn
    FROM op_all
  ) WHERE rn <= 5
), n_b AS (
  SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_baskets FROM op
), part_n AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS n_p FROM op GROUP BY p
), pairs AS (
  SELECT a.p AS part_a, b.p AS part_b, CAST(COUNT(*) AS BIGINT)
           AS pair_orders
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
)
SELECT part_a, part_b, pair_orders,
       na.n_p AS orders_a, nb.n_p AS orders_b,
       ROUND(CAST(pair_orders AS DOUBLE) / n_baskets
             - 0.000000001, 6) + 0.0 AS support,
       ROUND(CAST(pair_orders AS DOUBLE) / na.n_p
             - 0.000000001, 4) + 0.0 AS confidence_a_to_b,
       ROUND(CAST(pair_orders * n_baskets AS DOUBLE)
             / (na.n_p * nb.n_p) - 0.000000001, 4) + 0.0 AS lift
FROM pairs
JOIN part_n na ON pairs.part_a = na.p
JOIN part_n nb ON pairs.part_b = nb.p
CROSS JOIN n_b
ORDER BY lift DESC, part_a ASC, part_b ASC
LIMIT 20
"""


# Gini from the grouped count-of-counts histogram: with keys ordered by
# per-key count ascending, G = 2·Σ(rank_i·x_i)/(n·Σx) − (n+1)/n; a group
# of k keys all with count c starting after r0 lower-ranked keys
# contributes c·(k·r0 + k(k+1)/2) to Σ(rank_i·x_i) — exact BIGINT
# arithmetic until the two final divisions, identical text both engines.
_GINI = (
    "ROUND(CAST(2 * s_rank AS DOUBLE) / (n_keys * n_rows)"
    " - CAST(n_keys + 1 AS DOUBLE) / n_keys - 0.000000001, 4) + 0.0"
)


def _skew_profile_one(df, key: str, label: str):
    per_key = df.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    hist = per_key.groupBy("c").agg(F.count(F.lit(1)).alias("nk"))
    w = (
        Window.orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist2 = hist.withColumn(
        "r0", F.coalesce(F.sum("nk").over(w), F.lit(0)).cast("bigint")
    )
    totals = hist2.agg(
        F.sum("nk").alias("n_keys"),
        F.sum(F.col("c") * F.col("nk")).alias("n_rows"),
        F.max("c").alias("max_count"),
        F.sum(
            F.expr("c * (nk * r0 + (nk * (nk + 1)) DIV 2)")
        ).alias("s_rank"),
    )
    p99 = (
        hist2.crossJoin(F.broadcast(totals.select("n_keys")))
        .agg(
            F.min(
                F.when(
                    F.col("r0") + F.col("nk")
                    >= F.ceil(F.col("n_keys") * 0.99),
                    F.col("c"),
                )
            ).alias("p99_count")
        )
    )
    return (
        totals.crossJoin(F.broadcast(p99))
        .selectExpr(
            f"'{label}' AS key_name",
            "n_keys",
            "n_rows",
            "max_count",
            "p99_count",
            "ROUND(CAST(max_count AS DOUBLE) / n_rows"
            " - 0.000000001, 6) + 0.0 AS top1_share",
            f"{_GINI} AS gini",
        )
    )


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key SKEW DIAGNOSIS: per-key-count Gini coefficient, hottest
    key's row share, and the p99 key count for the join keys the engine
    actually shuffles on — the report that tells you WHICH joins need
    the salted path (`functions/skew`) before a straggler tells you in
    production.  Gini 0 = perfectly uniform keys; near 1 = a handful of
    keys carry the table.

    Scale shape: per key column, one counting shuffle to the per-key
    relation, then the COUNT-OF-COUNTS histogram (bounded by the number
    of distinct frequencies, not keys) carries everything: rank sums
    for Gini come from the grouped closed form in exact BIGINT
    arithmetic (see _GINI), p99 from a cumulative scan of the same
    bounded histogram — the corpus is never globally sorted."""
    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")
    parts = [
        _skew_profile_one(ev, "user_id", "events.user_id"),
        _skew_profile_one(li, "l_orderkey", "lineitem.l_orderkey"),
        _skew_profile_one(li, "l_partkey", "lineitem.l_partkey"),
        _skew_profile_one(docs, "lang", "documents.lang"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("key_name")


def _skew_sql_one(table: str, key: str, label: str) -> str:
    return f"""
SELECT '{label}' AS key_name, n_keys, n_rows, max_count, p99_count,
       ROUND(CAST(max_count AS DOUBLE) / n_rows - 0.000000001, 6) + 0.0
         AS top1_share,
       {_GINI} AS gini
FROM (
  SELECT CAST(SUM(nk) AS BIGINT) AS n_keys,
         CAST(SUM(c * nk) AS BIGINT) AS n_rows,
         MAX(c) AS max_count,
         CAST(SUM(c * (nk * r0 + (nk * (nk + 1)) // 2)) AS BIGINT)
           AS s_rank
  FROM (
    SELECT c, nk,
           CAST(COALESCE(SUM(nk) OVER (ORDER BY c
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS r0
    FROM (SELECT c, CAST(COUNT(*) AS BIGINT) AS nk
          FROM (SELECT {key}, CAST(COUNT(*) AS BIGINT) AS c
                FROM {table} GROUP BY {key}) pk
          GROUP BY c) h
  ) h2
) t CROSS JOIN (
  SELECT MIN(CASE WHEN r0 + nk >= CEIL(n_keys * 0.99) THEN c END)
           AS p99_count
  FROM (
    SELECT c, nk,
           CAST(COALESCE(SUM(nk) OVER (ORDER BY c
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS r0
    FROM (SELECT c, CAST(COUNT(*) AS BIGINT) AS nk
          FROM (SELECT {key}, CAST(COUNT(*) AS BIGINT) AS c
                FROM {table} GROUP BY {key}) pk
          GROUP BY c) h
  ) hh CROSS JOIN (
    SELECT CAST(SUM(nk) AS BIGINT) AS n_keys
    FROM (SELECT c, CAST(COUNT(*) AS BIGINT) AS nk
          FROM (SELECT {key}, CAST(COUNT(*) AS BIGINT) AS c
                FROM {table} GROUP BY {key}) pk
          GROUP BY c) h
  ) nt
) p"""


KEY_SKEW_SQL = (
    "SELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        _skew_sql_one(t, k, lbl)
        for t, k, lbl in (
            ("events", "user_id", "events.user_id"),
            ("lineitem", "l_orderkey", "lineitem.l_orderkey"),
            ("lineitem", "l_partkey", "lineitem.l_partkey"),
            ("documents", "lang", "documents.lang"),
        )
    )
    + "\n) u ORDER BY key_name"
)


def _rfm_thresholds(vals, col: str):
    """1-row (t1, t2, t3) quartile thresholds for an INTEGER metric via
    the bounded value-histogram: t_q = smallest v whose cumulative key
    count reaches ceil(q*n) — a type-1 (integer-rank, no interpolation)
    quantile, so thresholds are actual data values and every downstream
    comparison is integer-exact in both engines."""
    hist = vals.groupBy(col).agg(F.count(F.lit(1)).alias("k"))
    w = (
        Window.orderBy(col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("k").over(w))
    n = cum.agg(F.sum("k").alias("n"))
    return (
        cum.crossJoin(F.broadcast(n))
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("cum")
                        >= F.ceil(F.col("n").cast("double") * F.lit(q)),
                        F.col(col),
                    )
                ).alias(f"t{i}")
                for i, q in ((1, 0.25), (2, 0.5), (3, 0.75))
            ]
        )
    )


def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (the classic CRM operator): every
    customer scored 1-4 on Recency (days since last order — lower is
    better), Frequency (order count), and Monetary (lifetime spend,
    binned to 1000-currency cells for thresholding), then the 64-cell
    segment grid reported with sizes and average spend — the table
    behind "champions / at-risk / hibernating" targeting.

    Scale shape: one counting shuffle to the per-customer metric
    relation; each quartile threshold comes from a BOUNDED value
    histogram (recency ≤ calendar days, frequency ≤ max orders, spend
    bins ≤ price-range/1000 cells — all corpus-independent), never a
    global sort or NTILE; scoring is map-side integer comparisons
    against the three broadcast 1-row threshold relations
    (type-1 quantiles: actual data values, integer-exact in both
    engines); the output grid is ≤ 64 rows."""
    orders = load_table(spark, sf_dir, "orders")
    maxd = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("d0"))
    cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("d_last"),
            F.count(F.lit(1)).alias("f"),
            F.sum("o_totalprice").alias("m_raw"),
        )
        .crossJoin(F.broadcast(maxd))
        .selectExpr(
            "o_custkey",
            "CAST(datediff(d0, d_last) AS BIGINT) AS r_days",
            "CAST(f AS BIGINT) AS f",
            "m_raw",
            "CAST(FLOOR(m_raw / 1000.0) AS BIGINT) AS m_bin",
        )
    )
    rt = _rfm_thresholds(cust.select("r_days"), "r_days")
    ft = _rfm_thresholds(cust.select("f"), "f")
    mt = _rfm_thresholds(cust.select("m_bin"), "m_bin")
    scored = (
        cust.crossJoin(F.broadcast(rt.selectExpr(
            "t1 AS rt1", "t2 AS rt2", "t3 AS rt3")))
        .crossJoin(F.broadcast(ft.selectExpr(
            "t1 AS ft1", "t2 AS ft2", "t3 AS ft3")))
        .crossJoin(F.broadcast(mt.selectExpr(
            "t1 AS mt1", "t2 AS mt2", "t3 AS mt3")))
        .selectExpr(
            "m_raw",
            # low recency is GOOD: 4 at/below the first quartile
            "CAST(4 - (CASE WHEN r_days > rt1 THEN 1 ELSE 0 END"
            " + CASE WHEN r_days > rt2 THEN 1 ELSE 0 END"
            " + CASE WHEN r_days > rt3 THEN 1 ELSE 0 END) AS INT)"
            " AS r_score",
            "CAST(1 + CASE WHEN f > ft1 THEN 1 ELSE 0 END"
            " + CASE WHEN f > ft2 THEN 1 ELSE 0 END"
            " + CASE WHEN f > ft3 THEN 1 ELSE 0 END AS INT) AS f_score",
            "CAST(1 + CASE WHEN m_bin > mt1 THEN 1 ELSE 0 END"
            " + CASE WHEN m_bin > mt2 THEN 1 ELSE 0 END"
            " + CASE WHEN m_bin > mt3 THEN 1 ELSE 0 END AS INT)"
            " AS m_score",
        )
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.expr(
                "ROUND(AVG(m_raw) - 0.000000001, 2) + 0.0"
            ).alias("avg_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


def _rfm_hist_sql(metric: str) -> str:
    return f"""(
  SELECT MIN(CASE WHEN cum >= CEIL(CAST(n AS DOUBLE) * 0.25) THEN v END) AS t1,
         MIN(CASE WHEN cum >= CEIL(CAST(n AS DOUBLE) * 0.5) THEN v END) AS t2,
         MIN(CASE WHEN cum >= CEIL(CAST(n AS DOUBLE) * 0.75) THEN v END) AS t3
  FROM (
    SELECT v, SUM(k) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM (SELECT {metric} AS v, CAST(COUNT(*) AS BIGINT) AS k
          FROM cust GROUP BY {metric}) h
  ) c CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cust) t
)"""


RFM_SEGMENTS_SQL = f"""
WITH maxd AS (
  SELECT CAST(MAX(o_orderdate) AS DATE) AS d0 FROM orders
), cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE), d0)
              AS BIGINT) AS r_days,
         CAST(COUNT(*) AS BIGINT) AS f,
         SUM(o_totalprice) AS m_raw,
         CAST(FLOOR(SUM(o_totalprice) / 1000.0) AS BIGINT) AS m_bin
  FROM orders CROSS JOIN maxd
  GROUP BY o_custkey, d0
), rt AS {_rfm_hist_sql("r_days")},
ft AS {_rfm_hist_sql("f")},
mt AS {_rfm_hist_sql("m_bin")},
scored AS (
  SELECT m_raw,
         CAST(4 - (CASE WHEN r_days > rt.t1 THEN 1 ELSE 0 END
                 + CASE WHEN r_days > rt.t2 THEN 1 ELSE 0 END
                 + CASE WHEN r_days > rt.t3 THEN 1 ELSE 0 END) AS INT)
           AS r_score,
         CAST(1 + CASE WHEN f > ft.t1 THEN 1 ELSE 0 END
                + CASE WHEN f > ft.t2 THEN 1 ELSE 0 END
                + CASE WHEN f > ft.t3 THEN 1 ELSE 0 END AS INT) AS f_score,
         CAST(1 + CASE WHEN m_bin > mt.t1 THEN 1 ELSE 0 END
                + CASE WHEN m_bin > mt.t2 THEN 1 ELSE 0 END
                + CASE WHEN m_bin > mt.t3 THEN 1 ELSE 0 END AS INT)
           AS m_score
  FROM cust CROSS JOIN rt CROSS JOIN ft CROSS JOIN mt
)
SELECT r_score, f_score, m_score,
       CAST(COUNT(*) AS BIGINT) AS customers,
       ROUND(AVG(m_raw) - 0.000000001, 2) + 0.0 AS avg_monetary
FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# Every foreign-key edge of the star schema, (edge label, child table,
# child key, parent table, parent key).  Shared by the Spark query and
# the generated oracle so the two can never audit different edges.
_FK_EDGES = [
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]

# The TPC-H fixture is referentially CLEAN — every edge above audits to
# zero orphans and zero NULL FKs, so the audit's NULL/orphan branches
# would pass the value gate even if their semantics regressed (exactly
# how the r7 MATCH-SIMPLE bug stayed invisible until review).  This
# probe edge derives a child relation WITH both defect classes from the
# data itself — identical CASE text on both engines — so the gate pins
# MATCH SIMPLE (NULL FK is legal, never an orphan) and orphan counting
# on non-empty branches every round.
_FK_PROBE_EDGE = "probe(nulls+orphans)->nation"
_FK_PROBE_EXPR = (
    "CAST(CASE WHEN c_custkey % 11 = 0 THEN NULL "
    "WHEN c_custkey % 13 = 0 THEN c_nationkey + 1000 "
    "ELSE c_nationkey END AS BIGINT)"
)


def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every FK edge of the schema: per
    edge, the child row count, ORPHAN child rows (a NON-NULL key with no
    matching parent — an integrity violation a broken ingest or partial
    delete leaves behind), NULL-key child rows (reported separately:
    SQL's MATCH SIMPLE rule says a NULL FK SATISFIES the constraint, so
    counting it as an orphan would flag legal rows), parent rows, and
    UNREFERENCED parents (dead dimension rows a retention sweep can
    reclaim).  The nightly data-quality gate a lakehouse runs before
    publishing a snapshot to consumers.

    Scale shape: per edge, ONE key-partitioned full-outer join between
    the child's counting aggregate (partial-aggregated map-side to
    distinct-key cardinality before the shuffle) and the parent's key
    projection — never row×row; dims broadcast under AQE when small.
    Output is one row per edge, whatever the corpus."""
    import functools

    edges = [(e, ct, ck, pt, pk, None) for e, ct, ck, pt, pk in _FK_EDGES]
    edges.append(
        (_FK_PROBE_EDGE, "customer", "k", "nation", "n_nationkey",
         _FK_PROBE_EXPR)
    )
    parts = []
    for edge, ct, ck, pt, pk, derive in sorted(edges):
        child = load_table(spark, sf_dir, ct)
        if derive is not None:
            child = child.selectExpr(f"{derive} AS {ck}")
        child_keys = child.groupBy(F.col(ck).alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        )
        parent_keys = load_table(spark, sf_dir, pt).select(
            F.col(pk).alias("k"), F.lit(1).alias("p")
        )
        per_key = child_keys.join(parent_keys, "k", "full")
        parts.append(
            per_key.agg(
                F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("child_rows"),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("p").isNull() & F.col("k").isNotNull(),
                            F.col("c"),
                        )
                    ),
                    F.lit(0),
                ).cast("bigint").alias("orphan_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("k").isNull(), F.col("c"))), F.lit(0)
                ).cast("bigint").alias("null_fk_rows"),
                F.count("p").alias("parent_rows"),
                F.count(
                    F.when(F.col("c").isNull() & F.col("p").isNotNull(), F.lit(1))
                ).alias("unreferenced_parents"),
            ).select(F.lit(edge).alias("fk_edge"), "*")
        )
    return functools.reduce(lambda a, b: a.unionByName(b), parts).orderBy(
        "fk_edge"
    )


def _fk_integrity_sql() -> str:
    edges = [(e, ct, ck, pt, pk, ck) for e, ct, ck, pt, pk in _FK_EDGES]
    edges.append(
        (_FK_PROBE_EDGE, "customer", "k", "nation", "n_nationkey",
         _FK_PROBE_EXPR)
    )
    parts = []
    for edge, ct, ck, pt, pk, child_expr in sorted(edges):
        parts.append(f"""
SELECT '{edge}' AS fk_edge,
       CAST(COALESCE(SUM(c), 0) AS BIGINT) AS child_rows,
       CAST(COALESCE(SUM(CASE WHEN p IS NULL AND k IS NOT NULL THEN c END), 0)
            AS BIGINT) AS orphan_rows,
       CAST(COALESCE(SUM(CASE WHEN k IS NULL THEN c END), 0) AS BIGINT)
         AS null_fk_rows,
       CAST(COUNT(p) AS BIGINT) AS parent_rows,
       CAST(COUNT(CASE WHEN c IS NULL AND p IS NOT NULL THEN 1 END) AS BIGINT)
         AS unreferenced_parents
FROM (SELECT ch.k, ch.c, pa.p
      FROM (SELECT {child_expr} AS k, COUNT(*) AS c FROM {ct} GROUP BY 1) ch
      FULL JOIN (SELECT {pk} AS k, 1 AS p FROM {pt}) pa ON ch.k = pa.k)""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY fk_edge"


FK_INTEGRITY_SQL = _fk_integrity_sql()


# ANALYZE-profiled columns of the orders table: (name, kind) where kind
# picks the canonical min/max representation — numeric as DOUBLE, string
# as-is, timestamp via DATE so both engines format 'YYYY-MM-DD'.
_STATS_COLS = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "date"),
    ("o_orderpriority", "str"),
)


def column_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE equivalent: per-column statistics of the orders
    table in ONE scan — row count, null count, exact NDV (the value the
    gate pins), the mergeable-sketch NDV's bounded-error claim (the
    at-scale path: ``approx_count_distinct`` is ONE pass and mergeable,
    where exact NDV per column is a shuffle each), and canonical
    min/max (numeric as DOUBLE, strings as-is, dates as 'YYYY-MM-DD' —
    the representation both engines format identically).  These are the
    statistics a lake table carries for cost-based planning and
    file-skipping (the manifest min/max path `lake/table.py` already
    uses per file; this is the table-level roll a catalog stores).

    Same estimate-gating contract as ``approx_vs_exact_users``: the
    sketch value itself is engine-specific, so the oracle-compared
    output carries the exact NDV plus the claim the sketch landed
    within 3x its 5% rsd — deterministic (fixed hash family), a stable
    contract rather than a flaky tolerance.

    Scale shape: nulls / min / max / NDV sketches come from ONE
    expand-free pass over the scan (every expression partial-aggregates
    map-side); the exact-NDV audit runs on a STACKED narrow
    (col_name, value) relation — one shuffle of map-side-distinct pairs
    — instead of Spark's multi-countDistinct expand, which replicates
    every full-width row once per audited column (measured 5.5x at the
    16x corpus; the stacked form is 1.1x and 2x faster at 1x).  The
    100 TB profile drops the exact-NDV audit and keeps the single-pass
    sketches."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in _STATS_COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint").alias(f"{c}__nulls")
        )
        aggs.append(
            F.approx_count_distinct(c, rsd=0.05).alias(f"{c}__andv")
        )
        if kind == "num":
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
        elif kind == "date":
            aggs.append(
                F.min(F.col(c).cast("date")).cast("string").alias(f"{c}__min")
            )
            aggs.append(
                F.max(F.col(c).cast("date")).cast("string").alias(f"{c}__max")
            )
        else:
            aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
    row = orders.agg(*aggs)
    stack_args = []
    for c, kind in _STATS_COLS:
        min_num = f"{c}__min" if kind == "num" else "CAST(NULL AS DOUBLE)"
        max_num = f"{c}__max" if kind == "num" else "CAST(NULL AS DOUBLE)"
        min_str = f"{c}__min" if kind != "num" else "CAST(NULL AS STRING)"
        max_str = f"{c}__max" if kind != "num" else "CAST(NULL AS STRING)"
        stack_args.append(
            f"'{c}', {c}__nulls, {c}__andv, "
            f"{min_num}, {max_num}, {min_str}, {max_str}"
        )
    base = row.selectExpr(
        "n_rows",
        f"stack({len(_STATS_COLS)}, {', '.join(stack_args)}) AS "
        "(col_name, n_nulls, andv, min_num, max_num, min_str, max_str)",
    )
    # exact-NDV audit: stacked narrow (col_name, value) relation — one
    # shuffle of map-side-distinct pairs, no full-width row replication
    stack_vals = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c, _ in _STATS_COLS
    )
    ndv = (
        orders.selectExpr(
            f"stack({len(_STATS_COLS)}, {stack_vals}) AS (col_name, v)"
        )
        .groupBy("col_name")
        .agg(F.countDistinct("v").alias("ndv_exact"))
    )
    return (
        # LEFT join + COALESCE: an all-NULL or empty column contributes
        # nothing to the stacked NDV relation, but the profile must
        # still carry its row (the oracle's per-column aggregates always
        # return one).  The bounds check uses the ngram_jaccard-style
        # branch-free greatest() guard: at ndv 0 the sketch is also 0,
        # so 0/1 <= 0.15 agrees with the oracle's TRUE — and ANSI mode
        # cannot raise DIVIDE_BY_ZERO.
        base.join(F.broadcast(ndv), "col_name", "left")
        .withColumn("ndv_exact", F.coalesce("ndv_exact", F.lit(0)))
        .selectExpr(
            "col_name", "n_rows", "n_nulls", "ndv_exact",
            "abs(andv - ndv_exact)"
            " / CAST(GREATEST(ndv_exact, 1) AS DOUBLE) <= 0.15"
            " AS approx_within_bounds",
            "min_num", "max_num", "min_str", "max_str",
        )
        .orderBy("col_name")
    )


def _column_stats_sql() -> str:
    parts = []
    for c, kind in _STATS_COLS:
        if kind == "num":
            mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
            mns, mxs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        elif kind == "date":
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            mns = f"CAST(CAST(MIN({c}) AS DATE) AS VARCHAR)"
            mxs = f"CAST(CAST(MAX({c}) AS DATE) AS VARCHAR)"
        else:
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            mns, mxs = f"CAST(MIN({c}) AS VARCHAR)", f"CAST(MAX({c}) AS VARCHAR)"
        parts.append(f"""\
SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       COUNT(DISTINCT {c}) AS ndv_exact,
       TRUE AS approx_within_bounds,
       {mn} AS min_num, {mx} AS max_num,
       {mns} AS min_str, {mxs} AS max_str
FROM orders""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_name"


COLUMN_STATS_SQL = _column_stats_sql()


SPECS = [
    QuerySpec("rfm_customer_segments", rfm_customer_segments,
              RFM_SEGMENTS_SQL,
              "RFM segmentation: 1-4 quartile scores from bounded "
              "value histograms (type-1 thresholds), 64-cell grid"),
    QuerySpec("key_skew_profile", key_skew_profile, KEY_SKEW_SQL,
              "join-key skew diagnosis: Gini, top-1 share, p99 key "
              "count from the count-of-counts histogram"),
    QuerySpec("part_affinity_rules", part_affinity_rules,
              PART_AFFINITY_SQL,
              "association-rule mining over order baskets: "
              "support/confidence/lift, top-20 by lift (Agrawal)"),
    QuerySpec("asof_last_click_before_purchase", asof_last_click_before_purchase,
              ASOF_SQL, "as-of join (key equi + range + rank-1 window)"),
    QuerySpec("orders_within_30_days", orders_within_30_days, RANGE_JOIN_SQL,
              "banded interval self-join"),
    QuerySpec("doc_tfidf", doc_tfidf, TFIDF_SQL,
              "TF-IDF term weighting with corpus-wide statistics"),
    QuerySpec("fk_integrity_audit", fk_integrity_audit, FK_INTEGRITY_SQL,
              "referential-integrity audit: orphans + unreferenced "
              "parents per FK edge, one key join each"),
    QuerySpec("column_stats_profile", column_stats_profile,
              COLUMN_STATS_SQL,
              "ANALYZE TABLE: per-column nulls/NDV/min-max in one "
              "scan with sketch-NDV bounded-error gating"),
]
