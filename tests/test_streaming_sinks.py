"""Streaming sink coverage: foreachBatch -> parquet, and batch/stream
result equivalence for the windowed aggregations."""

from pyspark.sql import functions as F

from aind_exaspim_data_transformation_spark.queries import QUERIES
from aind_exaspim_data_transformation_spark.streaming.events import (
    read_events_stream,
    run_foreach_batch_parquet,
)

from conftest import SF_SMALL


def test_foreach_batch_parquet_sink(spark, tmp_path):
    out = str(tmp_path / "events_out")
    stream = read_events_stream(spark, SF_SMALL).where(
        F.col("event_type") == "purchase"
    )
    n_batches = run_foreach_batch_parquet(stream, out, "event_type")
    assert n_batches >= 1
    written = spark.read.parquet(out)
    from aind_exaspim_data_transformation_spark.sources.tables import (
        load_table,
    )

    expected = (
        load_table(spark, SF_SMALL, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert written.count() == expected
    # partitioned layout on disk
    assert (tmp_path / "events_out" / "event_type=purchase").exists()


def test_stream_tumbling_equals_batch(spark):
    stream_rows = {
        tuple(r)
        for r in QUERIES["q_stream_tumbling"](spark, SF_SMALL)
        .select("wstart", "event_type", "n_events")
        .collect()
    }
    batch_rows = {
        (r["wstart"], r["event_type"], r["n_events"])
        for r in QUERIES["q_events_tumbling"](spark, SF_SMALL)
        .withColumn(
            "wstart",
            F.date_format(
                F.from_unixtime(
                    (F.unix_timestamp(F.to_timestamp("wstart")) / 3600).cast(
                        "long"
                    )
                    * 3600
                ),
                "yyyy-MM-dd HH:mm:ss",
            ),
        )
        .groupBy("wstart", "event_type")
        .agg(F.sum("n_events").alias("n_events"))
        .collect()
    }
    assert stream_rows == batch_rows
