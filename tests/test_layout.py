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
