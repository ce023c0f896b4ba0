"""Event-stream analytics (SURVEY.md §2.B streaming row; batch-queryable).

The reference's sync-event store (SyncPort / InMemorySyncAdapter) is an
append-only event table consumed with filters, sorts, windows and status
aggregations.  These queries exercise that surface over the driver's
``events`` table: tumbling windows, sessionization (gap-based), lag/lead
transitions, JSON extraction, and argmax.

The true streaming versions (readStream + watermark + windowed agg +
applyInPandasWithState) live in ``iceberg_hybrid_spark.streaming``; the
batch forms here are what the DuckDB oracle can verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import round_stable
from ..sources.tables import load_table
from .spec import QuerySpec


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status-count aggregation — the getPendingEvents/getFailedEvents
    family (SyncPort.scala:42-77) generalized to a full breakdown."""
    return (
        _ev(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.countDistinct("user_id").alias("user_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("event_type")
    )


EVENTS_BY_TYPE_SQL = """
SELECT event_type,
       COUNT(*) AS event_count,
       COUNT(DISTINCT user_id) AS user_count,
       ROUND(SUM(value), 2) AS total_value,
       ROUND(AVG(value), 4) AS avg_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation.  In streaming form this is
    ``groupBy(window('ts','1 hour'))`` with a watermark; epoch-aligned
    window starts equal date_trunc('hour') so the oracle matches."""
    ev = _ev(spark, sf_dir)
    win = F.window(F.col("ts"), "1 hour")
    return (
        ev.groupBy(win.start.alias("hour_start"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("hour_start")
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour_start,
       COUNT(*) AS event_count,
       ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY 1 ORDER BY hour_start
"""


def events_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("event_count"))
        .orderBy("day", "event_type")
    )


EVENTS_DAILY_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, COUNT(*) AS event_count
FROM events GROUP BY 1, 2 ORDER BY day, event_type
"""


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h-window/1h-slide counts: each event lands in two
    epoch-aligned windows (streaming F.window(slide) semantics, batch
    form).  Oracle replicates via a 2-element unnest of window starts."""
    ev = _ev(spark, sf_dir)
    win = F.window(F.col("ts"), "2 hours", "1 hour")
    return (
        ev.groupBy(win.start.alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("window_start")
    )


EVENTS_SLIDING_SQL = """
SELECT window_start,
       COUNT(*) AS event_count,
       ROUND(SUM(value), 2) AS total_value
FROM (
  SELECT unnest([date_trunc('hour', ts),
                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
         value
  FROM events
) w
GROUP BY window_start ORDER BY window_start
"""


def approx_vs_exact_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL) checked against the exact count — the
    at-scale distinct-count path.

    The HLL estimate itself is engine-specific (DuckDB cannot reproduce
    Spark's sketch), so the oracle-comparable output carries (a) the
    exact count, pinned by value hash, and (b) ``approx_within_bounds``
    — the claim that the sketch landed within 3x its configured 5% rsd —
    which the oracle asserts is always TRUE.  Observed relative error on
    the fixtures: 0 / 0.7% / 6.7% at sf0.001/0.01/0.1, and the estimate
    is deterministic (fixed hash family, no sampling), so the bound is a
    stable contract, not a flaky tolerance."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.15
            ).alias("approx_within_bounds"),
        )
        .orderBy("event_type")
    )


APPROX_VS_EXACT_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS approx_within_bounds
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap) via lag + running
    sum — the batch shadow of a session_window streaming aggregation."""
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "is_new_session",
        F.when(
            F.col("prev_ts").isNull()
            # interval comparison works for TIMESTAMP and TIMESTAMP_NTZ
            # alike (a cast to long is illegal for NTZ) and matches the
            # oracle's fractional-seconds epoch() diff exactly
            | (F.col("ts") - F.col("prev_ts") > F.expr("INTERVAL 1800 SECONDS")),
            1,
        ).otherwise(0),
    )
    return (
        with_gap.groupBy("user_id")
        .agg(
            F.sum("is_new_session").cast("bigint").alias("session_count"),
            F.count(F.lit(1)).alias("event_count"),
        )
        .orderBy("user_id")
    )


USER_SESSIONS_SQL = """
SELECT user_id,
       CAST(SUM(is_new_session) AS BIGINT) AS session_count,
       COUNT(*) AS event_count
FROM (
  SELECT user_id,
         CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) > 1800
              THEN 1 ELSE 0 END AS is_new_session
  FROM (
    SELECT user_id, ts,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
  ) g
) s
GROUP BY user_id ORDER BY user_id
"""


def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead transition matrix — the event status-transition tracking
    (SyncEvent Pending→InProgress→Completed) generalized."""
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("transition_count"))
        .orderBy("prev_type", "next_type")
    )


EVENT_TRANSITIONS_SQL = """
SELECT prev_type, event_type AS next_type, COUNT(*) AS transition_count
FROM (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type
  FROM events
) t
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
ORDER BY prev_type, next_type
"""


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction (the reference parses Iceberg schema JSON
    strings and marker JSON — SURVEY §2.B scalar-fns row)."""
    ev = _ev(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            round_stable(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.min("k").alias("min_k"),
            F.count(F.lit(1)).alias("event_count"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_SQL = """
SELECT event_type,
       ROUND(AVG(k) - 0.000000001, 4) + 0.0 AS avg_k,
       MAX(k) AS max_k,
       MIN(k) AS min_k,
       COUNT(*) AS event_count
FROM (
  SELECT event_type, CAST(props->>'$.k' AS INTEGER) AS k FROM events
) j
GROUP BY event_type ORDER BY event_type
"""


def top_user_by_value_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/arg_max — ReadRouter's argmax (maxByOption(_._2),
    ReadRouter.scala:75-88) in aggregate form."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.max_by("user_id", "value").alias("top_user_id"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .orderBy("event_type")
    )


TOP_USER_SQL = """
SELECT event_type,
       arg_max(user_id, value) AS top_user_id,
       ROUND(MAX(value), 4) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def skew_split_user_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-remediated fact-to-dimension enrichment through the oracle
    gate: events (fact, hot user keys) joined to a per-user first-seen
    dimension via ``functions.skew.skew_split_join`` — only keys above
    the hot threshold take the salted path (small side replicated
    salt x for those keys alone), the cold tail takes the plain join.
    The oracle is the PLAIN equi-join's SQL: salting must be a pure
    physical-plan remedy, bit-identical in results.  All measures are
    integer (microsecond ages) so the check is exact."""
    from ..functions import skew as K

    events = _ev(spark, sf_dir)
    first_seen = events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    joined = K.skew_split_join(
        events, first_seen, "user_id", threshold_rows=80, salt=8
    )
    # ts is TIMESTAMP_NTZ; session TZ is UTC so the cast is lossless and
    # any offset cancels in the subtraction
    age_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("first_ts").cast("timestamp")
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(age_us).cast("bigint").alias("total_age_us"),
            F.sum((F.col("ts") == F.col("first_ts")).cast("int"))
            .cast("bigint")
            .alias("first_events"),
        )
        .orderBy("event_type")
    )


SKEW_SPLIT_SQL = """
WITH first_seen AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
)
SELECT e.event_type, COUNT(*) AS n_events,
       CAST(SUM(epoch_us(e.ts) - epoch_us(f.first_ts)) AS BIGINT)
           AS total_age_us,
       CAST(SUM(CASE WHEN e.ts = f.first_ts THEN 1 ELSE 0 END) AS BIGINT)
           AS first_events
FROM events e JOIN first_seen f ON e.user_id = f.user_id
GROUP BY e.event_type ORDER BY e.event_type
"""


def error_rate_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Failure-rate monitoring — mirror of the backpressure controller's
    failure-rate input (iceberg-arch-hybrid-replica-dr.md:172-185)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("error_count"),
            round_stable(
                F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("error_rate"),
        )
        .orderBy("day")
    )


ERROR_RATE_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       COUNT(*) AS event_count,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS error_count,
       ROUND(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1.0
             / COUNT(*) - 0.000000001, 6) + 0.0 AS error_rate
FROM events GROUP BY 1 ORDER BY day
"""


def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: per user, the
    first view, the first click strictly after it, the first purchase
    strictly after that; report stage reach counts.  Three aggregate+join
    rounds — each stage is one shuffle keyed by user (the sessionized
    funnel pattern of product analytics at any scale)."""
    ev = _ev(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("clicked")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("purchased")))
    )


CONVERSION_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_buy
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS viewed,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS clicked,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS purchased
"""


def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted in
    each later week they remain active — cohort week × week offset grid.
    Two shuffles (per-user min, then cohort grid agg) at any scale."""
    ev = _ev(spark, sf_dir)
    weeks = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


COHORT_RETENTION_SQL = """
WITH weeks AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
  FROM events
),
cohort AS (
  SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY 1
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS active_users
FROM weeks JOIN cohort USING (user_id)
GROUP BY 1, 2 ORDER BY cohort_week, week_offset
"""


def events_hourly_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly time series for one event type: a dense hour
    scaffold from the corpus min/max hours (``sequence`` + explode)
    left-joined to the per-hour counts so silent hours appear as
    explicit zeros — the completeness transform every monitoring
    dashboard needs (a missing hour and a zero hour are different
    incidents).  Reports the zero hours and a gap flag.

    Scale shape: the scaffold derives from an O(1) min/max agg and its
    length is calendar-bounded (hours in the observed span, not rows);
    the counts side is one counting shuffle; the join is
    scaffold-sized.  The 'purchase' filter pushes into the scan."""
    ev = _ev(spark, sf_dir).filter(F.col("event_type") == "purchase")
    cnt = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start")
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.round(F.sum("value"), 2).alias("v"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    scaffold = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start")
    )
    return (
        scaffold.join(cnt, "hour_start", "left")
        .selectExpr(
            "hour_start",
            "CAST(COALESCE(c, 0) AS BIGINT) AS event_count",
            "COALESCE(v, CAST(0.0 AS DOUBLE)) + 0.0 AS total_value",
            "CAST(CASE WHEN c IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap",
        )
        .orderBy("hour_start")
    )


EVENTS_GAPFILL_SQL = """
WITH cnt AS (
  SELECT date_trunc('hour', ts) AS hour_start,
         CAST(COUNT(*) AS BIGINT) AS c, ROUND(SUM(value), 2) AS v
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events WHERE event_type = 'purchase'
), scaffold AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
  FROM bounds
)
SELECT CAST(s.hour_start AS TIMESTAMP) AS hour_start,
       COALESCE(c.c, 0) AS event_count,
       COALESCE(c.v, CAST(0.0 AS DOUBLE)) + 0.0 AS total_value,
       CAST(CASE WHEN c.c IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
FROM scaffold s LEFT JOIN cnt c ON s.hour_start = c.hour_start
ORDER BY hour_start
"""


def view_to_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: for every user who purchased
    after first viewing, the seconds between FIRST view and the first
    purchase at-or-after it — p50/p90/p99 plus conversion counts, the
    time-to-convert report funnels are tuned against.

    Scale shape: two min-agg shuffles on the corpus-cardinality user
    key (first view; first qualifying purchase via a conditional min
    over the same pass), one hash join, then exact percentiles over the
    converted-users relation (one row per converter; swap in the
    histogram sketch at corpus scale).  Epoch-microsecond arithmetic is
    integer until the final seconds division."""
    ev = _ev(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("first_view")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    conv = (
        purchases.join(views, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("first_purchase"),
            F.min("first_view").alias("first_view"),
        )
        .selectExpr(
            "user_id",
            "CAST(unix_micros(CAST(first_purchase AS TIMESTAMP))"
            " - unix_micros(CAST(first_view AS TIMESTAMP))"
            " AS DOUBLE) / 1000000.0 AS latency_s",
        )
    )
    return (
        conv.agg(
            F.count(F.lit(1)).alias("converted_users"),
            round_stable(F.expr("percentile(latency_s, 0.5)"), 2).alias(
                "p50_s"
            ),
            round_stable(F.expr("percentile(latency_s, 0.9)"), 2).alias(
                "p90_s"
            ),
            round_stable(F.expr("percentile(latency_s, 0.99)"), 2).alias(
                "p99_s"
            ),
        )
    )


VIEW_PURCHASE_LATENCY_SQL = """
WITH views AS (
  SELECT user_id, MIN(ts) AS first_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), conv AS (
  SELECT p.user_id,
         CAST(epoch_us(MIN(p.ts)) - epoch_us(MIN(v.first_view))
              AS DOUBLE) / 1000000.0 AS latency_s
  FROM events p JOIN views v ON p.user_id = v.user_id
  WHERE p.event_type = 'purchase' AND p.ts >= v.first_view
  GROUP BY p.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS converted_users,
       ROUND(quantile_cont(latency_s, 0.5) - 0.000000001, 2) + 0.0 AS p50_s,
       ROUND(quantile_cont(latency_s, 0.9) - 0.000000001, 2) + 0.0 AS p90_s,
       ROUND(quantile_cont(latency_s, 0.99) - 0.000000001, 2) + 0.0 AS p99_s
FROM conv
"""


# OLS closed-form fragments over exact integer sums (n, Σx, Σy, Σxy,
# Σx², Σy² are all BIGINT-exact; only the final divisions are float) —
# identical literal text in both engines, so slope/intercept/r² are
# bit-identical up to those two correctly-rounded divisions.
_OLS_SLOPE_NUM = "(n * sxy - sx * sy)"
_OLS_SLOPE_DEN = "(n * sxx - sx * sx)"
_OLS_SLOPE = (
    f"(CAST({_OLS_SLOPE_NUM} AS DOUBLE) / {_OLS_SLOPE_DEN})"
)
_OLS_INTERCEPT = (
    f"((sy - {_OLS_SLOPE} * sx) / CAST(n AS DOUBLE))"
)
_OLS_R2 = (
    f"(CAST({_OLS_SLOPE_NUM} AS DOUBLE) * {_OLS_SLOPE_NUM}"
    f" / ({_OLS_SLOPE_DEN} * CAST(n * syy - sy * sy AS DOUBLE)))"
)


def daily_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type volume TREND: ordinary-least-squares fit of daily
    counts against the day index — slope (events/day of growth or
    decay), intercept, and r² — the monitoring query that tells a
    growing signal from a flat one before a human eyeballs a chart.

    Scale shape: one counting shuffle to the bounded (type, day)
    relation, then one partial-agg shuffle accumulating the five OLS
    sums per type — the closed form needs no iteration and the sums
    are BIGINT-exact (day indexes and counts are integers), so both
    engines agree bit-for-bit until the final divisions."""
    ev = _ev(spark, sf_dir)
    daily = ev.groupBy(
        F.col("event_type"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
    ).agg(F.count(F.lit(1)).alias("y"))
    lo = daily.agg(F.min("d").alias("d0"))
    xy = daily.crossJoin(F.broadcast(lo)).selectExpr(
        "event_type",
        "CAST(datediff(d, d0) AS BIGINT) AS x",
        "CAST(y AS BIGINT) AS y",
    )
    sums = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return sums.selectExpr(
        "event_type",
        "n AS n_days",
        f"ROUND({_OLS_SLOPE} - 0.000000001, 4) + 0.0 AS slope",
        f"ROUND({_OLS_INTERCEPT} - 0.000000001, 4) + 0.0 AS intercept",
        f"ROUND({_OLS_R2} - 0.000000001, 4) + 0.0 AS r2",
    ).orderBy("event_type")


DAILY_TREND_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), lo AS (
  SELECT MIN(d) AS d0 FROM daily
), xy AS (
  SELECT event_type,
         CAST(date_diff('day', d0, d) AS BIGINT) AS x, y
  FROM daily CROSS JOIN lo
), sums AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM xy GROUP BY event_type
)
SELECT event_type, n AS n_days,
       ROUND({_OLS_SLOPE} - 0.000000001, 4) + 0.0 AS slope,
       ROUND({_OLS_INTERCEPT} - 0.000000001, 4) + 0.0 AS intercept,
       ROUND({_OLS_R2} - 0.000000001, 4) + 0.0 AS r2
FROM sums ORDER BY event_type
"""


def hourly_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection on the hourly event-count series:
    median/MAD z-scores (the estimator that survives the anomalies it
    hunts — mean/stddev get dragged by the very outliers being flagged;
    1.4826 rescales MAD to sigma under normality).  Flags hours with
    |z| > 3 and reports the top-10 most anomalous — the alerting query
    a monitoring pipeline runs over ingest volumes.

    Scale shape: one counting shuffle collapses the corpus to the
    calendar-bounded hourly relation; median and MAD are exact
    percentile aggregates over that bounded relation (at corpus scale
    the histogram-sketch sibling supplies them); scoring is map-side
    arithmetic and the top-10 is TakeOrderedAndProject on the rounded
    score."""
    ev = _ev(spark, sf_dir)
    cnt = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start")
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    med = cnt.agg(F.expr("percentile(c, 0.5)").alias("med"))
    dev = cnt.crossJoin(F.broadcast(med)).selectExpr(
        "hour_start", "c", "med", "abs(c - med) AS ad"
    )
    mad = dev.agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    # MAD is exactly 0 whenever >=50% of hours share the median count
    # (steady-rate or heavily gapped streams) — unguarded, ANSI mode
    # raises DIVIDE_BY_ZERO.  Convention: a degenerate scale estimator
    # yields mad_z = 0 (no robust score exists).  The relation is
    # calendar-bounded, so the CASE guard costs nothing; identical
    # guard text in HOURLY_ANOMALY_SQL.
    scored = dev.crossJoin(F.broadcast(mad)).selectExpr(
        "hour_start",
        "CAST(c AS BIGINT) AS event_count",
        "ROUND(CASE WHEN mad > 0"
        " THEN (c - med) / (CAST(1.4826 AS DOUBLE) * mad)"
        " ELSE CAST(0.0 AS DOUBLE) END"
        " - 0.000000001, 4) + 0.0 AS mad_z",
    )
    return (
        scored.selectExpr(
            "hour_start",
            "event_count",
            "mad_z",
            "CAST(CASE WHEN abs(mad_z) > 3.0 THEN 1 ELSE 0 END AS INT)"
            " AS is_anomaly",
        )
        .orderBy(F.desc(F.abs(F.col("mad_z"))), F.asc("hour_start"))
        .limit(10)
    )


HOURLY_ANOMALY_SQL = """
WITH cnt AS (
  SELECT date_trunc('hour', ts) AS hour_start,
         CAST(COUNT(*) AS DOUBLE) AS c
  FROM events GROUP BY 1
), med AS (
  SELECT quantile_cont(c, 0.5) AS med FROM cnt
), dev AS (
  SELECT hour_start, c, med, abs(c - med) AS ad FROM cnt CROSS JOIN med
), mad AS (
  SELECT quantile_cont(ad, 0.5) AS mad FROM dev
), scored AS (
  SELECT hour_start, CAST(c AS BIGINT) AS event_count,
         ROUND(CASE WHEN mad > 0
               THEN (c - med) / (CAST(1.4826 AS DOUBLE) * mad)
               ELSE CAST(0.0 AS DOUBLE) END
               - 0.000000001, 4) + 0.0 AS mad_z
  FROM dev CROSS JOIN mad
)
SELECT CAST(hour_start AS TIMESTAMP) AS hour_start, event_count, mad_z,
       CAST(CASE WHEN abs(mad_z) > 3.0 THEN 1 ELSE 0 END AS INT)
         AS is_anomaly
FROM scored ORDER BY abs(mad_z) DESC, hour_start ASC LIMIT 10
"""


# EWMA fragments shared verbatim by both engines.  The recurrence
# ewma_t = a*x_t + (1-a)*ewma_{t-1} is unrolled to its closed form over
# the last _EWMA_W present hours: a normalized decay-weighted lag sum
# (pandas ewm(adjust=True) over a bounded horizon).  Unrolling instead
# of recursing keeps the whole computation ONE window node — no
# recursive CTE, no iterative job, no driver loop; 0.7^24 ~ 1.9e-4 so
# the truncated tail is far below the 4 dp output resolution.
_EWMA_W = 24
_EWMA_DECAY = "0.7"
_EWMA_OVER = "OVER (PARTITION BY event_type ORDER BY hour_start)"
_EWMA_NUM = " + ".join(
    f"POWER(CAST({_EWMA_DECAY} AS DOUBLE), {k - 1})"
    f" * COALESCE(LAG(c, {k}) {_EWMA_OVER}, CAST(0.0 AS DOUBLE))"
    for k in range(1, _EWMA_W + 1)
)
_EWMA_DEN = " + ".join(
    f"POWER(CAST({_EWMA_DECAY} AS DOUBLE), {k - 1})"
    f" * (CASE WHEN LAG(c, {k}) {_EWMA_OVER} IS NULL"
    f" THEN CAST(0.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END)"
    for k in range(1, _EWMA_W + 1)
)


def ewma_hourly_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA burst detector on per-type hourly volumes: each hour is
    scored against the exponentially-weighted mean of its own type's
    previous 24 present hours (decay 0.7), the classic ingest-rate
    baseline a streaming pipeline keeps per key.  burst_score is
    |ln(count/ewma)| — symmetric in spikes and droughts — and is_burst
    fires when the hour is >1.5x or <1/1.5x its baseline.  Complements
    ``hourly_anomaly_flags``: MAD scores hours against the GLOBAL
    distribution; EWMA scores them against their own key's RECENT
    history, so a slow regime change never poisons the baseline.

    Scale shape: ONE counting shuffle collapses the corpus to the
    calendar-bounded (type x hour) relation; the 24 LAG terms share a
    single Window node (one sort per type partition of a bounded
    relation); scoring is map-side arithmetic and the top-50 is
    TakeOrderedAndProject.  At 100 TB the hourly relation is still
    types x hours — the window never sees raw events.

    Oracle: identical unrolled fragment text in both engines; the
    bounded float sums differ only in last-ulp ordering, absorbed by
    the 4 dp rounding."""
    ev = _ev(spark, sf_dir)
    cnt = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_start")
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    scored = cnt.selectExpr(
        "event_type",
        "hour_start",
        "c",
        f"({_EWMA_NUM}) AS num",
        f"({_EWMA_DEN}) AS den",
    ).filter("den > 0")
    return (
        scored.selectExpr(
            "event_type",
            "hour_start",
            "CAST(c AS BIGINT) AS event_count",
            "ROUND(num / den - 0.000000001, 4) + 0.0 AS ewma_prev",
            "ROUND(ABS(LN(c * den / num)) - 0.000000001, 4) + 0.0"
            " AS burst_score",
            "CAST(CASE WHEN c * den / num > 1.5 OR c * den / num < 1.0 / 1.5"
            " THEN 1 ELSE 0 END AS INT) AS is_burst",
        )
        .orderBy(F.desc("burst_score"), "event_type", "hour_start")
        .limit(50)
    )


EWMA_HOURLY_SQL = f"""
WITH cnt AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_start,
         CAST(COUNT(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT event_type, hour_start, c,
         ({_EWMA_NUM}) AS num,
         ({_EWMA_DEN}) AS den
  FROM cnt
)
SELECT event_type, CAST(hour_start AS TIMESTAMP) AS hour_start,
       CAST(c AS BIGINT) AS event_count,
       ROUND(num / den - 0.000000001, 4) + 0.0 AS ewma_prev,
       ROUND(ABS(LN(c * den / num)) - 0.000000001, 4) + 0.0 AS burst_score,
       CAST(CASE WHEN c * den / num > 1.5 OR c * den / num < 1.0 / 1.5
            THEN 1 ELSE 0 END AS INT) AS is_burst
FROM scored WHERE den > 0
ORDER BY burst_score DESC, event_type, hour_start LIMIT 50
"""


def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence construction from the event stream: each
    user's most recent 20 events, ordered, serialized as one
    '>'-joined event-type string — the example shape a behavioral /
    recommendation model trains on, with per-sequence length, distinct
    type count, and time-span features.  Reports the 100 most active
    users (deterministic tiebreak) — the cohort whose sequences
    dominate a per-user training mix.

    Scale shape: state is BOUNDED BEFORE collection — one shuffle on
    user_id, a row_number window keeps only the last 20 events per
    user, and only then does the per-user aggregate build the (<= 20
    element) sequence, so no executor ever materializes an unbounded
    user history (the whale-user failure mode of collect_list-first
    designs).  Top-100 is TakeOrderedAndProject.

    Cross-engine determinism: ordering is (ts, event_id) — event_id
    breaks timestamp ties; Spark serializes via
    sort_array(collect_list(struct)) (deterministic regardless of
    arrival order), DuckDB via string_agg(... ORDER BY)."""
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    recent = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
    )
    return (
        recent.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("event_type").alias("distinct_types"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("seq"),
            # EXACT microsecond epoch on BOTH engines (unix_micros ==
            # DuckDB epoch_us; the NTZ->TIMESTAMP cast is a wall-clock
            # no-op under the session's pinned UTC): unix_timestamp
            # truncates to whole seconds and diverges from a
            # fractional-seconds oracle by 1 minute when the fractional
            # parts straddle a 60 s boundary — the same pitfall
            # user_sessions' interval comparison documents
            F.floor(
                (
                    F.unix_micros(F.max(F.col("ts").cast("timestamp")))
                    - F.unix_micros(F.min(F.col("ts").cast("timestamp")))
                )
                / 60000000.0
            )
            .cast("bigint")
            .alias("span_minutes"),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(100)
    )


USER_EVENT_SEQ_SQL = """
WITH recent AS (
  SELECT user_id, ts, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS distinct_types,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS seq,
       CAST(FLOOR((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 60000000.0)
            AS BIGINT) AS span_minutes
FROM recent WHERE rn <= 20
GROUP BY user_id
ORDER BY n_events DESC, user_id LIMIT 100
"""


# Jensen-Shannon term fragments, identical literal text in both engines
# (CASTs keep Spark off DECIMAL literals; the p > 0 guards give the
# standard 0·ln0 = 0 convention; all evaluated on a <= weeks x types
# bounded relation, so CASE branching costs nothing).
_JS_M = "((pc + pp) / CAST(2.0 AS DOUBLE))"
_JS_TP = (
    f"CASE WHEN pc > 0 THEN pc * ln(pc / {_JS_M})"
    " ELSE CAST(0.0 AS DOUBLE) END"
)
_JS_TQ = (
    f"CASE WHEN pp > 0 THEN pp * ln(pp / {_JS_M})"
    " ELSE CAST(0.0 AS DOUBLE) END"
)


def event_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: week-over-week Jensen-Shannon
    divergence of the event-type mix — the data-quality alarm a
    production ingest runs so a schema change, bot surge, or broken
    emitter shows up as a distribution shift, not as a silent model
    regression three stages later.  JS (symmetric, bounded by ln 2) is
    the standard drift metric; 0 means the mix is stable.

    Scale shape: ONE counting shuffle on (week, type); everything
    after — week totals, the consecutive-week pairing, the full
    week-pair x type scaffold, the JS terms — runs on a bounded
    relation (weeks x types).  The scaffold cross-join is
    aggregate-bounded by construction (whitelisted scalar shape).
    Oracle: identical term text; the <= types-sized double sums differ
    only in last-ulp ordering, absorbed by the 6 dp rounding."""
    ev = _ev(spark, sf_dir)
    cnt = (
        ev.select(
            F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
            "event_type",
        )
        .groupBy("wk", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.groupBy("wk").agg(F.sum("c").alias("n"))
    p = cnt.join(tot, "wk").selectExpr(
        "wk", "event_type", "CAST(c AS DOUBLE) / n AS prob"
    )
    w = Window.orderBy("wk")  # bounded: one row per week
    wk_pairs = (
        tot.select("wk", "n", F.lag("wk").over(w).alias("prev_wk"))
        .filter(F.col("prev_wk").isNotNull())
    )
    types = ev.select("event_type").distinct()
    grid = wk_pairs.crossJoin(types)
    pc = p.selectExpr("wk AS cw", "event_type AS ct", "prob AS pc")
    pp = p.selectExpr("wk AS pw", "event_type AS pt", "prob AS pp")
    joined = (
        grid.join(
            pc,
            (F.col("wk") == F.col("cw")) & (F.col("event_type") == F.col("ct")),
            "left",
        )
        .join(
            pp,
            (F.col("prev_wk") == F.col("pw"))
            & (F.col("event_type") == F.col("pt")),
            "left",
        )
        .selectExpr(
            "wk",
            "prev_wk",
            "n",
            "COALESCE(pc, CAST(0.0 AS DOUBLE)) AS pc",
            "COALESCE(pp, CAST(0.0 AS DOUBLE)) AS pp",
        )
        .selectExpr("wk", "prev_wk", "n",
                    f"{_JS_TP} AS tp", f"{_JS_TQ} AS tq")
    )
    return (
        joined.groupBy("wk", "prev_wk", "n")
        .agg(
            F.expr(
                "ROUND(CAST(0.5 AS DOUBLE) * SUM(tp)"
                " + CAST(0.5 AS DOUBLE) * SUM(tq) - 0.000000001, 6) + 0.0"
            ).alias("js_divergence")
        )
        .selectExpr("wk", "prev_wk", "n AS n_events", "js_divergence")
        .orderBy("wk")
    )


EVENT_DRIFT_SQL = f"""
WITH cnt AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS wk, event_type,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT wk, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY wk
), p AS (
  SELECT cnt.wk, cnt.event_type, CAST(c AS DOUBLE) / n AS prob
  FROM cnt JOIN tot ON cnt.wk = tot.wk
), wk_pairs AS (
  SELECT wk, n, LAG(wk) OVER (ORDER BY wk) AS prev_wk FROM tot
  QUALIFY prev_wk IS NOT NULL
), types AS (
  SELECT DISTINCT event_type FROM events
), grid AS (
  SELECT wk, prev_wk, n, event_type FROM wk_pairs CROSS JOIN types
), joined AS (
  SELECT g.wk, g.prev_wk, g.n,
         COALESCE(pc.prob, CAST(0.0 AS DOUBLE)) AS pc,
         COALESCE(pp.prob, CAST(0.0 AS DOUBLE)) AS pp
  FROM grid g
  LEFT JOIN p pc ON pc.wk = g.wk AND pc.event_type = g.event_type
  LEFT JOIN p pp ON pp.wk = g.prev_wk AND pp.event_type = g.event_type
), terms AS (
  SELECT wk, prev_wk, n, {_JS_TP} AS tp, {_JS_TQ} AS tq FROM joined
)
SELECT wk, prev_wk, n AS n_events,
       ROUND(CAST(0.5 AS DOUBLE) * SUM(tp)
             + CAST(0.5 AS DOUBLE) * SUM(tq) - 0.000000001, 6) + 0.0
         AS js_divergence
FROM terms GROUP BY wk, prev_wk, n ORDER BY wk
"""


SPECS = [
    QuerySpec("event_type_drift", event_type_drift, EVENT_DRIFT_SQL,
              "week-over-week Jensen-Shannon drift of the event-type "
              "mix — the ingest data-quality alarm"),
    QuerySpec("events_hourly_gapfilled", events_hourly_gapfilled,
              EVENTS_GAPFILL_SQL,
              "dense hourly series with explicit zero/gap rows "
              "(sequence scaffold + left join)"),
    QuerySpec("hourly_anomaly_flags", hourly_anomaly_flags,
              HOURLY_ANOMALY_SQL,
              "robust median/MAD z-score anomaly flags on hourly "
              "volumes, top-10 most anomalous"),
    QuerySpec("ewma_hourly_baseline", ewma_hourly_baseline,
              EWMA_HOURLY_SQL,
              "per-type EWMA ingest-rate baseline (decay 0.7, 24h "
              "horizon) with symmetric burst scores, top-50"),
    QuerySpec("user_event_sequences", user_event_sequences,
              USER_EVENT_SEQ_SQL,
              "bounded training-sequence construction: last-20 event "
              "types per user, serialized + featurized, top-100 users"),
    QuerySpec("daily_trend_slopes", daily_trend_slopes, DAILY_TREND_SQL,
              "per-type OLS volume trend (slope/intercept/r2) from "
              "BIGINT-exact closed-form sums"),
    QuerySpec("view_to_purchase_latency", view_to_purchase_latency,
              VIEW_PURCHASE_LATENCY_SQL,
              "first-view to first-purchase conversion latency "
              "percentiles (time-to-convert report)"),
    QuerySpec("weekly_cohort_retention", weekly_cohort_retention,
              COHORT_RETENTION_SQL, "first-week cohort × week-offset retention grid"),
    QuerySpec("conversion_funnel", conversion_funnel, CONVERSION_FUNNEL_SQL,
              "ordered view→click→purchase funnel stage counts"),
    QuerySpec("events_by_type", events_by_type, EVENTS_BY_TYPE_SQL,
              "event status breakdown (getPendingEvents family)"),
    QuerySpec("events_hourly_window", events_hourly_window, EVENTS_HOURLY_SQL,
              "tumbling 1h window aggregation"),
    QuerySpec("events_daily_by_type", events_daily_by_type, EVENTS_DAILY_SQL,
              "daily×type bucketing"),
    QuerySpec("events_sliding_window", events_sliding_window, EVENTS_SLIDING_SQL,
              "sliding 2h/1h window counts"),
    QuerySpec("approx_vs_exact_users", approx_vs_exact_users,
              APPROX_VS_EXACT_SQL,
              "HLL approx_count_distinct: exact count hash-pinned, "
              "estimate checked by relative-error bound"),
    QuerySpec("user_sessions", user_sessions, USER_SESSIONS_SQL,
              "gap-based sessionization via lag + running sum"),
    QuerySpec("event_type_transitions", event_type_transitions,
              EVENT_TRANSITIONS_SQL, "lag/lead transition matrix"),
    QuerySpec("events_json_props", events_json_props, EVENTS_JSON_SQL,
              "JSON scalar extraction + agg"),
    QuerySpec("top_user_by_value_per_type", top_user_by_value_per_type,
              TOP_USER_SQL, "max_by / arg_max"),
    QuerySpec("skew_split_user_enrichment", skew_split_user_enrichment,
              SKEW_SPLIT_SQL,
              "hot-key-salted fact enrichment vs plain-join oracle"),
    QuerySpec("error_rate_by_day", error_rate_by_day, ERROR_RATE_SQL,
              "failure-rate monitoring aggregation"),
]
