"""Set-operation surface: union / intersect / except and their ALL variants."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


def _segment_keys(spark: SparkSession, sf_dir: str, seg: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == seg)
        .select(F.col("c_nationkey").alias("nationkey"))
    )


@query(
    "q_union_distinct_nations",
    oracle="""
SELECT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION
  SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
""",
)
def q_union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _segment_keys(spark, sf_dir, "BUILDING")
    b = _segment_keys(spark, sf_dir, "MACHINERY")
    return a.unionByName(b).distinct()


@query(
    "q_union_all_counts",
    oracle="""
SELECT nationkey, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION ALL
  SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
GROUP BY nationkey
""",
)
def q_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _segment_keys(spark, sf_dir, "BUILDING")
    b = _segment_keys(spark, sf_dir, "MACHINERY")
    return (
        a.unionByName(b)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_intersect_nations",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
""",
)
def q_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _segment_keys(spark, sf_dir, "BUILDING")
    b = _segment_keys(spark, sf_dir, "AUTOMOBILE")
    return a.intersect(b)


@query(
    "q_except_parts_by_qty",
    oracle="""
SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity = 1
EXCEPT
SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity = 50
""",
)
def q_except_parts_by_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) over keys whose difference stays non-empty at
    every SF. Replaces q_except_nations (round-14): a 25-value nation
    domain is fully covered by both operand sides once the customer
    table passes a few hundred rows, so that difference was inherently
    empty at sf0.01+ — a setop demo that demonstrates nothing. Part
    keys partition into ~30 lineitems each at every SF (both sides
    stay sparse subsets: ~45% of parts have a qty-1 item, ~55% lack a
    qty-50 item), so the EXCEPT emits ~25% of parts at any scale
    (51 / 468 / 494,827 rows at sf0.001 / 0.01 / 10)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_quantity") == 1).select(
        F.col("l_partkey").alias("partkey")
    )
    b = li.where(F.col("l_quantity") == 50).select(
        F.col("l_partkey").alias("partkey")
    )
    return a.subtract(b)  # EXCEPT (distinct) semantics


@query(
    "q_intersect_all_keys",
    oracle="""
SELECT orderkey FROM (
  SELECT l_orderkey AS orderkey FROM lineitem WHERE l_returnflag = 'R'
  INTERSECT ALL
  SELECT l_orderkey AS orderkey FROM lineitem WHERE l_linestatus = 'F')
""",
)
def q_intersect_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("orderkey")
    )
    b = li.where(F.col("l_linestatus") == "F").select(
        F.col("l_orderkey").alias("orderkey")
    )
    return a.intersectAll(b)


@query(
    "q_except_all_keys",
    oracle="""
SELECT orderkey FROM (
  SELECT l_orderkey AS orderkey FROM lineitem WHERE l_returnflag = 'R'
  EXCEPT ALL
  SELECT l_orderkey AS orderkey FROM lineitem WHERE l_linestatus = 'F')
""",
)
def q_except_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("orderkey")
    )
    b = li.where(F.col("l_linestatus") == "F").select(
        F.col("l_orderkey").alias("orderkey")
    )
    return a.exceptAll(b)
