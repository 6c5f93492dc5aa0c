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
