"""Event-time query surface over the ``events`` table (SURVEY §2B streaming
rows, batch equivalents).

Tumbling / sliding / session windows and the as-of join are implemented
with Spark's native event-time primitives (``F.window``,
``F.session_window``) — the exact operators the streaming path reuses.
The as-of join uses the union+last-non-null window pattern, which scales
as one shuffle+sort instead of an O(n^2) inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ._helpers import dec, fmt_ts
from .registry import query


# --------------------------------------------------------------------------
# Tumbling 10-minute windows per event type.
# --------------------------------------------------------------------------
@query(
    "q_events_tumbling",
    oracle="""
SELECT
  strftime(make_timestamp(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT)
                          * 1000000), '%Y-%m-%d %H:%M:%S') AS wstart,
  event_type,
  COUNT(*) AS n_events,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            fmt_ts(F.col("w.start"), "wstart"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# Sliding windows: 10-minute length, 5-minute slide (each event in 2).
# --------------------------------------------------------------------------
@query(
    "q_events_sliding",
    oracle="""
SELECT
  strftime(make_timestamp(
    CAST(floor(epoch(ts) / 300) * 300 - k * 300 AS BIGINT) * 1000000),
    '%Y-%m-%d %H:%M:%S') AS wstart,
  COUNT(*) AS n_events,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
GROUP BY 1
""",
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(fmt_ts(F.col("w.start"), "wstart"), "n_events", "sum_value")
    )


# --------------------------------------------------------------------------
# Session windows: 15-minute inactivity gap per user.
# Oracle = classic gaps-and-islands (lag + cumulative sum).
# --------------------------------------------------------------------------
@query(
    "q_events_session",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, value,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts) >= 900000000
         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events),
islands AS (
  SELECT user_id, ts, value,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked)
SELECT user_id,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  COUNT(*) AS n_events,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM islands
GROUP BY user_id, session_id
""",
)
def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "15 minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            fmt_ts(F.col("w.start"), "session_start"),
            "n_events",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# As-of join: each purchase matched to the user's latest click at-or-before.
# Spark: union + last(ignoreNulls) over an event-time window — one shuffle,
# no inequality join; the standard scalable as-of pattern.
# Oracle: DuckDB's native ASOF LEFT JOIN.
# --------------------------------------------------------------------------
@query(
    "q_asof_click_purchase",
    oracle="""
SELECT p.event_id,
  p.user_id,
  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
  CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
""",
)
def q_asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    # kind 0 = click (sorts before a purchase at the identical timestamp,
    # making the as-of inclusive), kind 1 = purchase.
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.last(
        F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        tagged.withColumn("click_ts_raw", click_ts)
        .where(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            fmt_ts("ts", "purchase_ts"),
            fmt_ts("click_ts_raw", "click_ts"),
            (F.unix_micros("ts") - F.unix_micros("click_ts_raw")).alias(
                "gap_us"
            ),
        )
    )


# --------------------------------------------------------------------------
# Daily rollup per event type (date_trunc on event time).
# --------------------------------------------------------------------------
@query(
    "q_events_daily",
    oracle="""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
  event_type,
  COUNT(*) AS n,
  COUNT(DISTINCT user_id) AS n_users,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
                "day"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# First-touch attribution: earliest event per (user, type) via min-struct —
# a single aggregation, no window shuffle.
# --------------------------------------------------------------------------
@query(
    "q_events_first_per_user_type",
    oracle="""
SELECT user_id, event_type,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
  COUNT(*) AS n_events
FROM events
GROUP BY user_id, event_type
""",
)
def q_events_first_per_user_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        fmt_ts(F.min("ts"), "first_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )
