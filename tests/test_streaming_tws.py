"""transformWithStateInPandas user stats vs the batch aggregate.

The Spark 4.x arbitrary-state operator's Python worker speaks a
protobuf-based state-server protocol. This container's pyspark has no
google.protobuf — the from-spec wire-format shim
(``aind_exaspim_data_transformation_spark.protoshim``) provides it, so
the end-to-end test now runs UNCONDITIONALLY (it was importorskip-gated
through round 5): real JVM state server, real ValueState round trips.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aind_exaspim_data_transformation_spark.streaming.events import (
    run_to_memory,
    stream_user_stats_tws,
    tws_state_store,
)

SF_DIR = "/root/testdata/sf0.001"


def test_tws_plan_builds(spark):
    df = stream_user_stats_tws(spark, SF_DIR)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "user_id",
        "n_events",
        "sum_value",
        "first_us",
        "last_us",
    ]


def test_tws_matches_batch_aggregate(spark):
    with tws_state_store(spark):
        run_to_memory(
            stream_user_stats_tws(spark, SF_DIR),
            "tws_stats_test",
            output_mode="update",
        )
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["first_us"])
        for r in spark.table("tws_stats_test").collect()
    }
    from aind_exaspim_data_transformation_spark.sources.tables import (
        load_table,
    )

    expected = {
        r["user_id"]: (r["n"], r["s"], r["f"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(
                    F.floor(F.col("value") * 100 + 0.5).cast("long")
                ).cast("double")
                / 100.0
            ).alias("s"),
            F.unix_micros(F.min("ts")).alias("f"),
        )
        .collect()
    }
    assert got == expected


def test_tws_state_store_conf_is_scoped(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    with tws_state_store(spark):
        assert "RocksDB" in spark.conf.get(key)
    assert spark.conf.get(key, None) == before


def test_tws_last_update_wins_across_micro_batches(spark, tmp_path):
    """Pins the load-bearing invariant behind q_stream_tws_user_stats's
    memory-sink reduction: with the input split so every user arrives
    in ≥2 micro-batches, the sink holds multiple update rows per key,
    ``n_events`` strictly increases per update, and max-``n_events``
    (last update) still equals the batch aggregate."""
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF_DIR}/events.parquet")
    half = src.num_rows // 2
    d = tmp_path / "ev"
    d.mkdir()
    # interleave so (almost) every user appears in both files
    import pyarrow.compute as pc

    idx = list(range(src.num_rows))
    pq.write_table(src.take(idx[0::2]), d / "events-0.parquet")
    pq.write_table(src.take(idx[1::2]), d / "events-1.parquet")
    assert half > 0

    with tws_state_store(spark):
        run_to_memory(
            stream_user_stats_tws(
                spark, str(d), max_files_per_trigger=1
            ),
            "tws_multibatch_test",
            output_mode="update",
        )
    sink = spark.table("tws_multibatch_test")
    per_user = sink.groupBy("user_id").count()
    multi = per_user.where(F.col("count") >= 2).count()
    assert multi > 0, "expected >1 micro-batch (multiple updates/user)"
    # n_events strictly increases across a user's updates
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("n_events")
    dup = (
        sink.withColumn("prev", F.lag("n_events").over(w))
        .where(F.col("prev").isNotNull() & (F.col("n_events") <= F.col("prev")))
        .count()
    )
    assert dup == 0
    # last-update-wins == batch aggregate
    rk = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    )
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["first_us"], r["last_us"])
        for r in sink.withColumn("_rk", rk).where(F.col("_rk") == 1).collect()
    }
    expected = {
        r["user_id"]: (r["n"], r["s"], r["f"], r["l"])
        for r in spark.read.parquet(str(d))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(
                    F.floor(F.col("value") * 100 + 0.5).cast("long")
                ).cast("double")
                / 100.0
            ).alias("s"),
            F.unix_micros(F.min("ts")).alias("f"),
            F.unix_micros(F.max("ts")).alias("l"),
        )
        .collect()
    }
    assert got == expected
