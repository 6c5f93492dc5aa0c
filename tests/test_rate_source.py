"""Rate source (§2B streaming sources row): synthetic load generator for
streaming-path testing without input files."""

from pyspark.sql import functions as F


def test_rate_source_produces_rows(spark, tmp_path):
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .load()
        .withColumn("bucket", F.col("value") % 10)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_probe")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.monotonic() + 20
        while time.monotonic() < deadline:
            if spark.table("rate_probe").count() > 0:
                break
            time.sleep(0.5)
        rows = spark.table("rate_probe")
        assert rows.count() > 0
        assert set(rows.columns) == {"timestamp", "value", "bucket"}
        assert rows.agg(F.max("bucket")).collect()[0][0] <= 9
    finally:
        q.stop()
