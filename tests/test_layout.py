"""Bucketing + salting: result equivalence and plan-shape guarantees."""

from pyspark.sql import functions as F

from aind_exaspim_data_transformation_spark.operators.layout import (
    bucketed_join_plan_is_shuffle_free,
    salted_aggregate,
    salted_join,
    write_bucketed,
)
from aind_exaspim_data_transformation_spark.sources.tables import load_table

from conftest import SF_SMALL


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF_SMALL, "orders")
        lineitem = load_table(spark, SF_SMALL, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(orders, "b_orders", ["o_orderkey"], 8)
        write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], 8)
        joined, shuffle_free = bucketed_join_plan_is_shuffle_free(
            spark, "b_orders", "b_lineitem", ["o_orderkey"]
        )
        assert shuffle_free, "bucketed join must not shuffle"
        # and the result is still correct
        expected = orders.join(
            lineitem, "o_orderkey"
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, SF_SMALL, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(cust, "o_custkey").select(
        "o_orderkey", "c_name"
    )
    salted = salted_join(orders, cust, "o_custkey", n_salts=8).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_aggregate_equals_plain(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    plain = {
        r["l_returnflag"]: (r["n"], r["qty"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty"),
        )
        .collect()
    }
    two_phase = {
        r["l_returnflag"]: (r["n"], r["qty"])
        for r in salted_aggregate(
            li,
            "l_returnflag",
            8,
            partial_aggs=[
                F.count(F.lit(1)).alias("pn"),
                F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("pq"),
            ],
            final_aggs=[
                F.sum("pn").alias("n"),
                F.sum("pq").alias("qty"),
            ],
        ).collect()
    }
    assert plain == two_phase


def test_write_bucketed_survives_orphaned_location(spark, tmp_path):
    """Crash-retry safety (round-8 verdict item 1): a prior run that died
    between saveAsTable and cleanup leaves the warehouse directory behind
    with no catalog entry; a retry must succeed, not raise
    LOCATION_ALREADY_EXISTS."""
    from aind_exaspim_data_transformation_spark.operators.layout import (
        _managed_table_location,
    )

    orders = load_table(spark, SF_SMALL, "orders").limit(100)
    table = "b_orphan_retry"
    try:
        # Simulate the killed run: materialize the managed location, then
        # wipe only the catalog entry (what a fresh JVM's empty in-memory
        # catalog looks like to the retry).
        write_bucketed(orders, table, ["o_orderkey"], 4)
        loc = _managed_table_location(spark, table)
        assert loc is not None and loc.exists()
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        loc.mkdir(parents=True, exist_ok=True)
        (loc / "part-orphan.parquet").write_bytes(b"stale")
        assert not spark.catalog.tableExists(table)

        write_bucketed(orders, table, ["o_orderkey"], 4)  # must not raise
        assert spark.table(table).count() == 100
        assert not (loc / "part-orphan.parquet").exists()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
