"""Fourth relational batch: the TPC-H shapes that depend on the
``partsupp`` table in the original benchmark, re-based onto the
lineitem fact (which is the part<->supplier relationship in this star
schema).

Shapes covered: per-part argmin supplier over a region (Q2), per-part
value share vs a global scalar threshold (Q11), IN-aggregate-subquery
large orders (Q18), and dominant-supplier share semi-join (Q20).

All threshold comparisons are done in exact decimal arithmetic
(``2*q > tq`` instead of ``q > 0.5*tq``) so both engines evaluate the
identical predicate with no float rounding involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ._helpers import SQL_DEC, dec, fmt_date
from .registry import query


# --------------------------------------------------------------------------
# Q2-style minimum-cost supplier. No partsupp/ps_supplycost: the "cost"
# of sourcing a part from a supplier is the minimum extended price that
# supplier ever charged for the part. For every STANDARD-type part of
# size 15, find the EUROPE supplier(s) achieving the per-part minimum.
# --------------------------------------------------------------------------
@query(
    "q02_min_cost_supplier",
    oracle=f"""
WITH costs AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         MIN(CAST(l_extendedprice AS {SQL_DEC})) AS cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey, l_suppkey)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(cost AS DOUBLE) AS min_cost
FROM costs
JOIN part     ON pk = p_partkey
JOIN supplier ON sk = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_size = 15 AND p_type = 'STANDARD'
  AND cost = (SELECT MIN(c2.cost) FROM costs c2 WHERE c2.pk = costs.pk)
""",
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (SURVEY §2B joins + correlated MIN subquery).

    Spark plan: one shuffle keyed on (partkey, suppkey) for the cost
    aggregate, then a window MIN over partkey replaces the correlated
    subquery (no self-join); all dimension joins broadcast. Cost
    comparison happens on the exact decimal, so per-part ties are
    engine-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "EUROPE"
    )
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    eu_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        li.join(F.broadcast(eu_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(
            F.col("l_partkey").alias("pk"),
            "s_suppkey",
            "s_name",
            "s_acctbal",
            "n_name",
        )
        .agg(F.min(dec("l_extendedprice")).alias("cost"))
    )
    w = Window.partitionBy("pk")
    return (
        costs.withColumn("min_cost_dec", F.min("cost").over(w))
        .where(F.col("cost") == F.col("min_cost_dec"))
        .join(F.broadcast(part), F.col("pk") == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("cost").cast("double").alias("min_cost"),
        )
    )


# --------------------------------------------------------------------------
# Q11-style important stock. No ps_availqty/ps_supplycost: a part's
# "inventory value" is the discounted revenue shipped by ASIA-region
# suppliers; keep parts whose value exceeds TWICE THE MEAN part value
# (val * n_parts > 2 * total). TPC-H scales Q11's fraction by 1/SF
# precisely because a fixed fraction degenerates as the part count
# grows (the round-13 sweep measured 0 rows at sf10 with the old
# fixed 1/1000 threshold); a mean-relative threshold is the same
# device derived from the data itself, so the result is non-empty at
# every SF (12 / 48 / 61,550 rows at sf0.001 / 0.01 / 10). The
# comparison runs in DOUBLE on both engines from the same exact
# decimal inputs (val*n as decimal would pass 38 digits at sf100).
# --------------------------------------------------------------------------
@query(
    "q11_important_stock",
    oracle=f"""
WITH vals AS (
  SELECT l_partkey AS pk,
         SUM(CAST(l_extendedprice AS {SQL_DEC})
             * (CAST(1 AS {SQL_DEC}) - CAST(l_discount AS {SQL_DEC})))
           AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY l_partkey),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(v2.val) AS VARCHAR) AS DOUBLE) AS total_d
  FROM vals v2)
SELECT pk AS p_partkey, CAST(CAST(val AS VARCHAR) AS DOUBLE) AS part_value
FROM vals CROSS JOIN tot
WHERE CAST(CAST(val AS VARCHAR) AS DOUBLE) * n > 2.0 * total_d
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: grouped value per part HAVING a scalar-subquery
    global threshold. The threshold is mean-relative (``val * n_parts >
    2 * total``) so it self-scales with SF — TPC-H's own spec scales
    Q11's fraction by 1/SF for the same reason. Group values stay in
    exact decimals; the comparison is DOUBLE on both engines computed
    from the same exact inputs (identical products, identical
    comparison). The global (n, total) relation is a broadcast
    single-row cross join, not a second scan-side correlated subquery.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "ASIA"
    )
    n1_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    one = F.lit(1).cast(SQL_DEC.lower())
    val_expr = dec("l_extendedprice") * (one - dec("l_discount"))
    vals = (
        li.join(F.broadcast(n1_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(val_expr).alias("val"))
    )
    total = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("val").cast("double").alias("total_d"),
    )
    return (
        vals.crossJoin(F.broadcast(total))
        .where(
            F.col("val").cast("double") * F.col("n")
            > F.lit(2.0) * F.col("total_d")
        )
        .select(
            F.col("pk").alias("p_partkey"),
            F.col("val").cast("double").alias("part_value"),
        )
    )


# --------------------------------------------------------------------------
# Q18-style large-volume customers: orders whose total quantity exceeds
# 300, with the customer who placed them.
# --------------------------------------------------------------------------
@query(
    "q18_large_volume_customers",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey AS ok, SUM(CAST(l_quantity AS {SQL_DEC})) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS {SQL_DEC})) > 300)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM big
JOIN orders   ON ok = o_orderkey
JOIN customer ON o_custkey = c_custkey
""",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over a grouped HAVING aggregate,
    expressed as aggregate-then-join (one shuffle on l_orderkey, then a
    key join to orders). The quantity sum is exact decimal so the >300
    cut is engine-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sum(dec("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, F.col("ok") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            fmt_date("o_orderdate", "order_date"),
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


# --------------------------------------------------------------------------
# Q20-style dominant suppliers. No ps_availqty: a supplier "has excess
# stock" of a part when it shipped more than 1/8 of the part's total
# quantity (8*q > total in exact decimals; per-supplier shares top out
# near 25% at sf0.01, so a half-share test would be vacuous). Report
# ASIA-region suppliers holding such a position on any 'red' part.
# --------------------------------------------------------------------------
@query(
    "q20_dominant_suppliers",
    oracle=f"""
WITH sp AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         SUM(CAST(l_quantity AS {SQL_DEC})) AS q
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
  GROUP BY l_partkey, l_suppkey),
tot AS (SELECT pk, SUM(q) AS tq FROM sp GROUP BY pk)
SELECT DISTINCT s_suppkey, s_name
FROM sp
JOIN tot USING (pk)
JOIN supplier ON sk = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND 8 * q > tq
""",
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: share-of-total threshold feeding a semi-join on
    suppliers. One shuffle keyed on (partkey, suppkey); the per-part
    total comes from a window SUM over the same partitioning (no
    re-scan); the share test is the exact-decimal ``8*q > tq``.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("red%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "ASIA"
    )
    n2_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    sp = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
        .agg(F.sum(dec("l_quantity")).alias("q"))
    )
    w = Window.partitionBy("pk")
    return (
        sp.withColumn("tq", F.sum("q").over(w))
        .where(F.lit(8) * F.col("q") > F.col("tq"))
        .join(F.broadcast(n2_supp), F.col("sk") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )
