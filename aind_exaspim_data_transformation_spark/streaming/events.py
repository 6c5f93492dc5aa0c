"""Structured Streaming operators over the events table (SURVEY §2B
streaming rows).

The events parquet is replayed as a file stream; watermarks bound state so
these plans run unbounded at scale. Each helper returns a streaming
DataFrame; callers pick the sink (memory for tests, foreachBatch for the
Zarr/parquet sinks).

Design notes for 100 TB streams:
- watermark + windowed aggregation keeps state size O(windows x keys in
  the watermark horizon), independent of stream length;
- ``dropDuplicates`` with watermark ages dedup state out;
- session windows merge in the state store (no global sort).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _events_schema(ts_type) -> StructType:
    """Explicit schema: streaming sources cannot infer."""
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over events.parquet with event-time column.

    ``ts`` has shipped as TIMESTAMP(NANOS) (read as raw nanosecond longs
    via ``spark.sql.legacy.parquet.nanosAsLong=true``, set by
    ``session.get_spark``) and as TIMESTAMP(MICROS) isAdjustedToUTC=false
    (TIMESTAMP_NTZ). Probe the physical type with a batch scan of the
    footer, then declare the matching stream schema and normalize to
    TIMESTAMP — the batch twin is ``sources.tables.load_table``.
    """
    # Scan-level normalization (same as the batch twin): NTZ-physical
    # micros surface as TIMESTAMP, so the stream declares TimestampType
    # and needs no per-row cast (which also means the probe below can
    # only ever report 'bigint' or 'timestamp').
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    ts_batch = dict(
        spark.read.option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
        .dtypes
    ).get("ts")
    # The file stream source requires a directory; glob-filter to events
    # (the prefix form also matches split files like events-0.parquet,
    # which multi-micro-batch tests use with max_files_per_trigger).
    reader = (
        spark.readStream.format("parquet")
        .option("pathGlobFilter", "events*.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    if ts_batch == "bigint":
        raw = reader.schema(_events_schema(LongType())).load(sf_dir)
        # Integer division: double division loses precision at 1.7e18 ns.
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    from pyspark.sql.types import TimestampType

    return reader.schema(_events_schema(TimestampType())).load(sf_dir)


def stream_tumbling_counts(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts per event type."""
    ev = read_events_stream(spark, sf_dir, max_files_per_trigger)
    return (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_session_windows(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Watermarked session windows (15-minute gap) per user."""
    ev = read_events_stream(spark, sf_dir, max_files_per_trigger)
    return (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "15 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )


def stream_dedup(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon.

    ``dropDuplicatesWithinWatermark``, NOT ``dropDuplicates``: with a
    plain ``dropDuplicates(["event_id"])`` the watermark never evicts
    dedup state unless the event-time column is itself part of the key
    list, so state grows with STREAM LENGTH — the round-14 streaming
    scale sweep measured exactly that (state = all 10M keys after the
    full replay, ``numRowsDroppedByWatermark = 0`` every batch). The
    WithinWatermark form ages each key out once the watermark passes
    its event time + delay: state is O(keys in the horizon + one
    in-flight batch), the only shape that survives an unbounded
    stream. Semantics: duplicates are suppressed when they arrive
    within the watermark delay of the first occurrence — the standard
    production contract (a duplicate arriving later than the horizon
    would also be beyond the source's replay window); global exact
    dedup over all history is the batch path (queries/dedup_q.py).
    """
    ev = read_events_stream(spark, sf_dir, max_files_per_trigger)
    return ev.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_stateful_user_stats(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, value-sum in cents) kept in the state store. The
    arbitrary-state API is the escape hatch for operators windowed
    aggregation can't express (e.g. cross-event session logic)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = read_events_stream(
        spark, sf_dir, max_files_per_trigger
    ).withWatermark("ts", "2 hours")

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, cents = state.get
        else:
            n, cents = 0, 0
        for pdf in pdfs:
            n += len(pdf)
            # Explicit half-up (floor(v*100+0.5)): pandas .round() is
            # half-to-even while the DuckDB oracle's round() is
            # half-away — they must agree on .5 boundaries (repo
            # invariant; same fix as stream_user_stats_tws).
            cents += int(
                np.floor(pdf["value"] * 100 + 0.5).astype("int64").sum()
            )
        state.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [cents / 100.0],
            }
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_foreach_batch_parquet(
    df: DataFrame, out_dir: str, partition_col: str | None = None
) -> int:
    """foreachBatch sink: each micro-batch lands as parquet (optionally
    partitioned). The pattern the Zarr sink uses in streaming mode —
    foreachBatch hands the batch to ANY batch writer, including the shard
    writer UDF. Returns the number of micro-batches processed."""
    n_batches = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        writer = batch_df.write.mode("append")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(out_dir)
        n_batches["n"] += 1

    q = (
        df.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{out_dir}_checkpoint")
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drain a streaming DataFrame into an in-memory table (availableNow:
    processes everything currently in the source, then stops)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


from contextlib import contextmanager


@contextmanager
def tws_state_store(spark: SparkSession):
    """Scope the RocksDB state-store provider around a
    ``transformWithStateInPandas`` run. TWS stores each state variable
    in its own column family, which the default HDFS-backed provider
    rejects (``multipleColumnFamiliesNotSupported``); RocksDB ships in
    the Spark distribution. Scoped (the conf is read at query start) so
    other streaming queries in the same session keep whatever provider
    their existing checkpoints were created with."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def stream_user_stats_tws(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Per-user running stats via ``transformWithStateInPandas`` — the
    Spark 4.x successor to ``applyInPandasWithState`` (typed state
    variables on the new operator's state store; timers/TTL available).
    Keeps (count, value-cents, first/last event micros) in a ValueState
    and emits the refreshed row per key per micro-batch.

    Run it under ``tws_state_store(spark)`` (RocksDB provider). Where
    the container has no google.protobuf, the from-spec shim
    (``protoshim``) provides the state-protocol runtime: installed here
    for the driver, via PYTHONPATH for pre-JVM sessions
    (``session.get_spark``), and — covering ANY session — re-installed
    at unpickle time in each Python worker by the processor's
    ``__setstate__`` before the state clients' first lazy protobuf
    import. (Spark's jars contain a ``google/`` resource dir that
    Python would otherwise assemble into an empty namespace package.)

    Money is accumulated in integer cents and event times in integer
    micros, so the emitted doubles/strings are exact regardless of how
    rows split across micro-batches. Cents use explicit half-up
    rounding (``floor(v*100 + 0.5)``) — pandas ``.round()`` is
    half-to-even while DuckDB/Spark ``round`` are half-away/half-up,
    and the three must agree on .5 boundaries (repo invariant)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming import StatefulProcessor

    from ..protoshim import ensure_spark_visibility

    ensure_spark_visibility(spark)

    class UserStats(StatefulProcessor):
        def __getstate__(self):
            return self.__dict__

        def __setstate__(self, state):
            # Runs in the worker during UDF unpickling — i.e. BEFORE
            # the TWS pre-init handshake imports StateMessage_pb2 —
            # so the shim is in place no matter how the session was
            # created. No-op where real protobuf exists.
            from aind_exaspim_data_transformation_spark.protoshim import (
                install,
            )

            install()
            self.__dict__.update(state)

        def init(self, handle) -> None:
            self._state = handle.getValueState(
                "stats",
                "n LONG, cents LONG, first_us LONG, last_us LONG",
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, cents, first_us, last_us = self._state.get()
            else:
                n, cents, first_us, last_us = 0, 0, None, None
            for pdf in rows:
                n += len(pdf)
                cents += int(
                    np.floor(pdf["value"] * 100 + 0.5)
                    .astype("int64")
                    .sum()
                )
                ts = pdf["ts"]
                if getattr(ts.dtype, "tz", None) is not None:
                    ts = ts.dt.tz_localize(None)
                us = ts.astype("datetime64[us]").astype("int64")
                lo, hi = int(us.min()), int(us.max())
                first_us = lo if first_us is None else min(first_us, lo)
                last_us = hi if last_us is None else max(last_us, hi)
            self._state.update((n, cents, first_us, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [cents / 100.0],
                    "first_us": [first_us],
                    "last_us": [last_us],
                }
            )

        def close(self) -> None:
            pass

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger)
    return ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStats(),
        outputStructType=(
            "user_id long, n_events long, sum_value double, "
            "first_us long, last_us long"
        ),
        outputMode="Update",
        timeMode="None",
    )
