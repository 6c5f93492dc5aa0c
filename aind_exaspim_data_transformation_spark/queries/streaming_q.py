"""Streaming queries for the driver harness.

These run a real Structured Streaming job (availableNow trigger) to a
memory sink, then return the drained table. Aggregation results match the
batch twins in ``events_q`` — cross-checked in tests — but the driver
records rows-only here (streaming is not SQL-expressible for the DuckDB
oracle). ``q_stream_tumbling`` does carry an oracle: with a 2-hour
watermark and a finite replay, no rows are late, so the complete-mode
result equals the batch computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..streaming.events import (
    run_to_memory,
    stream_dedup,
    stream_session_windows,
    stream_stateful_user_stats,
    stream_tumbling_counts,
    stream_user_stats_tws,
)
from .registry import query

_COUNTER = {"n": 0}


def _unique(name: str) -> str:
    _COUNTER["n"] += 1
    return f"{name}_{_COUNTER['n']}"


@query(
    "q_stream_tumbling",
    oracle="""
SELECT
  strftime(make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)
                          * 1000000), '%Y-%m-%d %H:%M:%S') AS wstart,
  event_type,
  COUNT(*) AS n_events,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = _unique("stream_tumbling")
    run_to_memory(
        stream_tumbling_counts(spark, sf_dir, "1 hour"),
        name,
        output_mode="complete",
    )
    return spark.table(name)


@query(
    "q_stream_sessions",
    oracle="""
WITH marked AS (
  SELECT user_id, ts,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts) >= 900000000
         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events),
islands AS (
  SELECT user_id, ts,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked)
SELECT user_id,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  COUNT(*) AS n_events
FROM islands
GROUP BY user_id, session_id
""",
)
def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Finite replay + complete mode => merged sessions equal the batch
    # gaps-and-islands computation.
    name = _unique("stream_sessions")
    run_to_memory(
        stream_session_windows(spark, sf_dir), name, output_mode="complete"
    )
    return spark.table(name)


@query(
    "q_stream_stateful_user_stats",
    oracle="""
SELECT user_id, COUNT(*) AS n_events,
  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
    AS sum_value
FROM events
GROUP BY user_id
""",
)
def q_stream_stateful_user_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # The memory sink appends one row per key per micro-batch in update
    # mode, so keep only the LAST update per user (n_events strictly
    # increases per update) — correct whether availableNow yields one
    # micro-batch or many. Half-up cents match the oracle's
    # floor(v*100+0.5) (same convention as the TWS twin).
    name = _unique("stream_stateful")
    run_to_memory(
        stream_stateful_user_stats(spark, sf_dir), name, output_mode="update"
    )
    rk = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    )
    return (
        spark.table(name)
        .withColumn("_rk", rk)
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


@query(
    "q_stream_stream_join",
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
 AND c.ts <= p.ts
""",
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases joined to same-user clicks
    within the preceding 30 minutes, watermarks bounding both join
    states. On a finite replay the result equals the batch range join."""
    from pyspark.sql import functions as F

    from ..streaming.events import read_events_stream, run_to_memory

    ev = read_events_stream(spark, sf_dir)
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select("purchase_id", "click_id")
    name = _unique("stream_stream_join")
    run_to_memory(joined, name, output_mode="append")
    return spark.table(name)


@query(
    "q_stream_dedup",
    oracle="""
SELECT event_type, COUNT(*) AS n_unique
FROM (SELECT DISTINCT event_id, event_type FROM events)
GROUP BY event_type
""",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = _unique("stream_dedup")
    run_to_memory(stream_dedup(spark, sf_dir), name, output_mode="append")
    return (
        spark.table(name)
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n_unique")
    )


# transformWithStateInPandas (the Spark 4.x arbitrary-state successor to
# applyInPandasWithState) speaks a protobuf-based state-server protocol.
# This container ships pyspark WITHOUT google.protobuf; the from-spec
# runtime shim (``protoshim``) provides it — installed driver-side by
# the operator and worker-side by the processor's unpickle hook — so the
# query registers unconditionally and runs end-to-end either way.
@query(
    "q_stream_tws_user_stats",
    oracle="""
SELECT user_id, COUNT(*) AS n_events,
  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
    AS sum_value,
  epoch_us(MIN(ts)) AS first_us,
  epoch_us(MAX(ts)) AS last_us
FROM events
GROUP BY user_id
""",
)
def q_stream_tws_user_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Typed ValueState per user holding (count, cents, first/last
    micros). The memory sink appends one row per key per
    micro-batch in update mode, so the result keeps only the LAST
    update per user (``n_events`` strictly increases per update, so
    max-``n_events`` is that final state) — correct whether
    availableNow yields one micro-batch or many. Cents use explicit
    half-up rounding, matching the oracle's ``floor(v*100+0.5)``."""
    from ..streaming.events import tws_state_store

    name = _unique("stream_tws")
    with tws_state_store(spark):
        run_to_memory(
            stream_user_stats_tws(spark, sf_dir),
            name,
            output_mode="update",
        )
    rk = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    )
    return (
        spark.table(name)
        .withColumn("_rk", rk)
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )
