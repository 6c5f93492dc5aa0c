"""Third relational batch: the remaining classic TPC-H query shapes
adapted to the available star schema (which lacks ``partsupp``,
``l_shipmode`` and commit/receipt dates — each query notes its
adaptation).

Shapes covered here: multi-level ratio-of-aggregates over a 6-way join
(Q8), computed-measure rollup by nation x year (Q9), lateness bucketing
with conditional counts (Q12), aggregate-then-argmax view (Q15),
distinct-count variety report (Q16), correlated per-group average
threshold (Q17), and the double EXISTS / NOT EXISTS "sole late
supplier" pattern (Q21).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ._helpers import SQL_DEC, SQL_DISC_PRICE, dec, disc_price
from .registry import query


# --------------------------------------------------------------------------
# Q8-style national market share: of all revenue from customers in region
# ASIA, what fraction was supplied by NATION_3, per order year.
# --------------------------------------------------------------------------
@query(
    "q08_market_share",
    oracle=f"""
WITH all_nations AS (
  SELECT year(o_orderdate) AS yr,
         sn.n_name AS supp_nation,
         {SQL_DISC_PRICE} AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = 'ASIA')
SELECT yr,
  CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE)
    / CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS mkt_share,
  CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS total_volume
FROM all_nations
GROUP BY yr
""",
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (SURVEY §2B joins/aggregation): ratio of two exact
    decimal sums inside one grouped aggregate over a 6-way join; all
    dimension sides broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "ASIA"
    )
    cn = nation.select(
        F.col("n_nationkey").alias("ck"), F.col("n_regionkey").alias("crk")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    volume = disc_price()
    nation3 = F.when(
        F.col("supp_nation") == "NATION_3", volume
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("ck"))
        .join(F.broadcast(region), F.col("crk") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sk"))
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            (
                F.sum(nation3).cast("double")
                / F.sum(volume).cast("double")
            ).alias("mkt_share"),
            F.sum(volume).cast("double").alias("total_volume"),
        )
    )


# --------------------------------------------------------------------------
# Q9-style product-type profit. No partsupp/ps_supplycost in this schema:
# cost is modeled as p_retailprice * l_quantity (exact decimal), so
# profit = disc_price - retail cost, rolled up by supplier nation x year.
# --------------------------------------------------------------------------
@query(
    "q09_nation_profit",
    oracle=f"""
SELECT sn.n_name AS nation, year(o_orderdate) AS yr,
  CAST(CAST(SUM({SQL_DISC_PRICE}
           - CAST(p_retailprice AS {SQL_DEC})
             * CAST(l_quantity AS {SQL_DEC})) AS VARCHAR) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY sn.n_name, year(o_orderdate)
""",
)
def q09_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: computed profit measure (exact decimal difference
    of products) grouped by nation x year; part filtered on a name
    substring before the join (pushdown-friendly)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%red%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    sn = nation.select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("nation")
    )
    profit = disc_price() - dec("p_retailprice") * dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sk"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("yr"))
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


# --------------------------------------------------------------------------
# Q12-style lateness report. No l_shipmode/commit/receipt dates: a line is
# "late" when it shipped more than 90 days after the order date; per
# priority bucket count late high-priority vs late low-priority lines.
# --------------------------------------------------------------------------
@query(
    "q12_late_shipments",
    oracle="""
SELECT o_orderpriority,
  COUNT(*) AS n_lines,
  CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
           THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
  CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
            AND o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS n_late_high
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts over a date-interval lateness
    predicate (timestamp + INTERVAL arithmetic), grouped by priority."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 90 DAYS"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            one_if(late).alias("n_late"),
            one_if(late & high).alias("n_late_high"),
        )
    )


# --------------------------------------------------------------------------
# Q15-style top supplier: revenue per supplier over one quarter; return
# the supplier(s) achieving the maximum (exact-decimal argmax, so ties
# are deterministic).
# --------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, SUM({SQL_DISC_PRICE}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(CAST(total_rev AS VARCHAR) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate-defined view + scalar-subquery argmax.
    The max comparison happens on the exact decimal sum (never double),
    so both engines select the same supplier set."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(disc_price()).alias("total_rev"))
    )
    mx = revenue.agg(F.max("total_rev").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
# Q16-style part/supplier variety. No partsupp: the lineitem fact is the
# part<->supplier relationship; count distinct suppliers per part
# (brand, type, size) bucket, excluding one brand and one type.
# --------------------------------------------------------------------------
@query(
    "q16_part_variety",
    oracle="""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 11, 19, 27, 35, 43)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: negated + IN-list dimension predicates and a
    grouped COUNT(DISTINCT) over the fact's supplier key."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 11, 19, 27, 35, 43)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17-style small-quantity revenue: average yearly revenue lost if small
# orders (below 20% of the part's average quantity) were not filled.
# --------------------------------------------------------------------------
@query(
    "q17_small_quantity_revenue",
    oracle=f"""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS {SQL_DEC})) AS VARCHAR) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * (CAST(CAST(SUM(CAST(l_quantity AS {SQL_DEC})) AS VARCHAR) AS DOUBLE)
                  / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average-quantity threshold.
    The threshold is 0.2 * (exact decimal sum as double / count) computed
    with the identical operation order in both engines, so the double
    comparison is bit-deterministic."""
    # Round-12 sf30 plan audit: thresholds are only ever consulted for
    # the brand's parts (1/25 of the part table), so the per-part
    # aggregation runs over the BRAND-FILTERED lineitem (a map-only
    # broadcast join prunes 96% of rows before the shuffle) instead of
    # all of lineitem. Per-part sums are over the identical row sets,
    # so every threshold double is unchanged; and the threshold
    # relation now stays broadcast-sized at any SF (brand parts only)
    # where the all-parts version fell back to a sort-merge join at
    # sf30.
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#23"
    )
    li_brand = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    thresholds = li_brand.groupBy(
        F.col("l_partkey").alias("t_partkey")
    ).agg(
        (
            F.lit(0.2)
            * (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("qty_thr")
    )
    return (
        li_brand.join(
            F.broadcast(thresholds), li.l_partkey == F.col("t_partkey")
        )
        .where(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q21-style suppliers who kept orders waiting. No receipt/commit dates:
# a line is "late" when shipped >45 days after the order date. For each
# finished ('F') multi-supplier order where EXACTLY ONE supplier shipped
# late, charge that supplier with each of its late lines.
# --------------------------------------------------------------------------
@query(
    "q21_waiting_suppliers",
    oracle="""
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 45 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 45 DAY)
GROUP BY s_suppkey, s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (double EXISTS / NOT EXISTS). Spark plan avoids
    the two correlated self-joins entirely: one per-order aggregate
    computes the distinct-supplier count and the set of late suppliers,
    then keeps orders whose late set is exactly one supplier — a single
    shuffle on l_orderkey instead of three."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 45 DAYS"
    )
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.collect_set(F.when(late, F.col("l_suppkey"))).alias(
                "late_supps"
            ),
            F.sum(F.when(late, 1).otherwise(0)).alias("n_late_lines"),
        )
    )
    culprits = per_order.where(
        (F.col("n_supp") > 1) & (F.size("late_supps") == 1)
    ).select(
        F.element_at("late_supps", 1).alias("s_suppkey"),
        F.col("n_late_lines"),
    )
    return (
        culprits.groupBy("s_suppkey")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .join(F.broadcast(supp), "s_suppkey")
        .select("s_suppkey", "s_name", "numwait")
    )
