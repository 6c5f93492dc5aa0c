"""The remaining classic TPC-H shapes (Q13/Q14/Q19/Q22), adapted to the
driver's reduced star schema — this completes the 22-query family:
Q1-Q6/Q8-Q12/Q15-Q18/Q20-Q21 live in relational*.py and Q7 is
`q_nation_pair_volume`.

Adaptations forced by the schema (no o_comment / p_container /
l_shipmode / l_shipinstruct / c_phone columns in the generated data):
Q13 drops the comment NOT-LIKE filter, Q19's disjunctive predicate
ranges over (brand, size, quantity), and Q22 stratifies on
c_mktsegment instead of phone country codes. The join/aggregate
shapes — the part the optimizer is graded on — are the originals.

Exactness: money goes through DECIMAL(12,2) (see _helpers); Q22's
balance-vs-average comparison is pure int64 arithmetic
(cents * n > sum_cents), never a float boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ._helpers import SQL_DISC_PRICE, disc_price
from .registry import query

# --------------------------------------------------------------------------
# Q13: customer order-count distribution (left join + double aggregate).
# --------------------------------------------------------------------------
_Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count
"""


@query("q13_customer_distribution", oracle=_Q13_ORACLE)
def q13_customer_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, ... orders.

    Round-14 (guide §2.3/§3.1): aggregate orders per custkey BEFORE the
    outer join. The join orientation only lets Spark broadcast the
    orders side, and the old raw-rows form did exactly that
    (`BroadcastHashJoin LeftOuter BuildRight` over the FACT table —
    fine at bench estimates, impossible at scale). The per-custkey
    count is |customer|-bounded, map-side partial, and
    coalesce(count, 0) over the null-extended rows equals
    COUNT(o_orderkey). Collect-compare identical; oracle green 3 SFs;
    0.35 s -> 0.26 s at sf0.1."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    per_ord = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("_n")
    )
    per_cust = cust.join(
        per_ord, cust.c_custkey == per_ord.o_custkey, "left"
    ).select(F.coalesce("_n", F.lit(0)).alias("c_count"))
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


# --------------------------------------------------------------------------
# Q14: promotion revenue share for one month.
# --------------------------------------------------------------------------
_Q14_ORACLE = f"""
WITH m AS (
  SELECT p_type, {SQL_DISC_PRICE} AS dp
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00')
SELECT
  CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN dp
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR)
       AS DOUBLE) AS promo_sum,
  CAST(CAST(SUM(dp) AS VARCHAR) AS DOUBLE) AS total_sum,
  100.0 * (CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN dp
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR)
       AS DOUBLE)
    / CAST(CAST(SUM(dp) AS VARCHAR) AS DOUBLE)) AS promo_revenue_pct
FROM m
"""


@query("q14_promotion_effect", oracle=_Q14_ORACLE)
def q14_promotion_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of one month's discounted revenue from PROMO
    parts. One broadcast join (part is a dim), one aggregate; both
    sums are exact decimals, the percentage is computed with the same
    double parenthesization on both engines."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-03-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    m = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).select("p_type", disc_price().alias("dp"))
    promo = F.sum(
        F.when(F.col("p_type").startswith("PROMO"), F.col("dp")).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    ).cast("double")
    total = F.sum("dp").cast("double")
    return m.agg(
        promo.alias("promo_sum"),
        total.alias("total_sum"),
        (F.lit(100.0) * (promo / total)).alias("promo_revenue_pct"),
    )


# --------------------------------------------------------------------------
# Q19: disjunctive (brand, size, quantity) predicate pushed into one
# join — the classic OR-of-ANDs the optimizer must not expand into
# three scans.
# --------------------------------------------------------------------------
_Q19_PRED = """(
  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
    AND l_quantity BETWEEN 1 AND 11)
  OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
    AND l_quantity BETWEEN 10 AND 20)
  OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
    AND l_quantity BETWEEN 20 AND 35))"""

@query(
    "q19_discounted_revenue",
    oracle=f"""
SELECT CAST(CAST(SUM({SQL_DISC_PRICE}) AS VARCHAR) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_Q19_PRED}
""",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: one lineitem-part join with a disjunctive
    brand/size/quantity predicate (adapted from container/shipmode,
    absent in this schema). The predicate references BOTH sides, so it
    evaluates post-join; the p_brand IN (...) prefix is still pushable
    to the part scan."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    q = F.col("l_quantity")
    s = F.col("p_size")
    pred = (
        (
            (F.col("p_brand") == "Brand#1")
            & s.between(1, 15)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & s.between(10, 30)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & s.between(20, 50)
            & q.between(20, 35)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(pred)
        .agg(
            F.sum(disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q22: positive-balance customers above their strata's average with no
# URGENT-priority orders (anti join), stratified by market segment (no
# phone column). TPC-H's "no orders at all" predicate relies on dbgen
# leaving a third of custkeys orderless; this generator gives every
# customer orders at the gate SFs (0 no-order customers at sf0.001 and
# sf0.01 — round-13 sweep), so the anti join targets the URGENT subset
# instead: ~(4/5)^(orders per customer) of customers survive at every
# SF (12 / 127 / 121,580 base rows at sf0.001 / 0.01 / 10).
# --------------------------------------------------------------------------
_Q22_SEGMENTS = "'AUTOMOBILE', 'BUILDING', 'FURNITURE'"

_Q22_ORACLE = f"""
WITH c AS (
  SELECT c_custkey, c_mktsegment,
    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
  WHERE c_mktsegment IN ({_Q22_SEGMENTS})),
avg_pos AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s
  FROM c WHERE cents > 0)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust,
  CAST(SUM(cents) AS BIGINT) AS total_cents
FROM c CROSS JOIN avg_pos
WHERE c.cents * avg_pos.n > avg_pos.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


@query("q22_sales_opportunity", oracle=_Q22_ORACLE)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers in selected strata with
    above-average positive balances and no URGENT-priority orders
    (anti join against the filtered orders side — the filter pushes
    into the scan, shrinking the anti join's build input 5x). The
    balance-vs-average comparison is exact int64 arithmetic
    (cents * n > sum_cents) — no float boundary to disagree on; the
    two-value average relation broadcasts."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin(
            "AUTOMOBILE", "BUILDING", "FURNITURE"
        )
    )
    c = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    avg_pos = c.where(F.col("cents") > 0).agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_pos))
        .where(F.col("cents") * F.col("n") > F.col("s"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum("cents").alias("total_cents"),
        )
    )
