"""Core relational surface: scans, filters, joins, aggregations (SURVEY §2B).

TPC-H-flavoured queries over the synthetic star schema. Scale notes:

- Dimension tables (region/nation/supplier) are explicitly ``broadcast()`` —
  at 100 TB the fact tables shuffle only for fact-fact joins.
- Aggregations use hash aggregation with map-side partial aggregation
  (automatic in Spark); exact decimal sums avoid float nondeterminism.
- Top-k uses orderBy+limit which Spark executes as TakeOrdered (no global
  sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ._helpers import (
    DEC,
    SQL_CHARGE,
    SQL_DEC,
    SQL_DISC_PRICE,
    charge,
    davg,
    dec,
    exact_percentiles_two_level,
    disc_price,
    dsum,
    fan_out_small_scan,
    fmt_date,
    sql_davg,
    sql_dsum,
)
from .registry import query


# --------------------------------------------------------------------------
# Q1-style pricing summary: filter -> groupBy -> rich agg (partial+final).
# --------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
  {sql_dsum("l_quantity", "sum_qty")},
  {sql_dsum("l_extendedprice", "sum_base_price")},
  CAST(CAST(SUM({SQL_DISC_PRICE}) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM({SQL_CHARGE}) AS VARCHAR) AS DOUBLE) AS sum_charge,
  {sql_davg("l_quantity", "avg_qty")},
  {sql_davg("l_extendedprice", "avg_price")},
  {sql_davg("l_discount", "avg_disc")},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        F.sum(disc_price()).cast("double").alias("sum_disc_price"),
        F.sum(charge()).cast("double").alias("sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --------------------------------------------------------------------------
# Q3-style shipping priority: 3-way join + top-k with deterministic order.
# --------------------------------------------------------------------------
@query(
    "q03_shipping_priority",
    oracle=f"""
SELECT o_orderkey,
  CAST(CAST(SUM({SQL_DISC_PRICE}) AS VARCHAR) AS DOUBLE) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            fmt_date("o_orderdate", "orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q4-style order priority count: left-semi join (EXISTS).
# --------------------------------------------------------------------------
@query(
    "q04_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS via semi join against a PRE-AGGREGATED lineitem
    (round-12 sf30 plan audit): ``EXISTS(l_shipdate > o_orderdate)``
    ⟺ ``max(l_shipdate) > o_orderdate``, so the semi join's big side
    shrinks from every lineitem row to one row per orderkey BEFORE the
    shuffle — and lineitem files are orderkey-clustered, so the
    map-side partial max combines ~4:1 ahead of the exchange. The
    derived scan filter ``l_shipdate > 1996-01-01`` (no earlier
    shipment can beat an in-window order date) prunes at the parquet
    scan. Same EXISTS semantics, ~4x less shuffle at sf30."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li_max = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp"))
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_shipdate"))
    )
    semi = orders.join(
        li_max,
        (orders.o_orderkey == li_max.l_orderkey)
        & (li_max.max_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# --------------------------------------------------------------------------
# Q5-style local supplier volume: 6-way join, broadcast dims.
# --------------------------------------------------------------------------
@query(
    "q05_local_supplier_volume",
    oracle=f"""
SELECT n_name, CAST(CAST(SUM({SQL_DISC_PRICE}) AS VARCHAR) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q6-style revenue forecast: pushed-down filter + global agg.
# --------------------------------------------------------------------------
@query(
    "q06_forecast_revenue",
    oracle=f"""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS {SQL_DEC})
                 * CAST(l_discount AS {SQL_DEC})) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q10-style returned items: join + top-k customers by lost revenue.
# --------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name,
  CAST(CAST(SUM({SQL_DISC_PRICE}) AS VARCHAR) AS DOUBLE) AS revenue,
  n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Global statistics: count / count_distinct / min / max / variance family.
# Variance & stddev computed from exact decimal power sums => deterministic.
# --------------------------------------------------------------------------
@query(
    "q_global_stats",
    oracle="""
WITH s AS (
  SELECT COUNT(*) AS n_rows,
    COUNT(DISTINCT l_orderkey) AS n_orders,
    COUNT(DISTINCT l_partkey) AS n_parts,
    CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price,
    CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price,
    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_sq
  FROM lineitem)
SELECT n_rows, n_orders, n_parts, min_price, max_price,
  sum_price / n_rows AS avg_price,
  round(sqrt((sum_sq - sum_price * sum_price / n_rows) / (n_rows - 1)), 4)
    AS std_price,
  round((sum_sq - sum_price * sum_price / n_rows) / (n_rows - 1), 4)
    AS var_price
FROM s
""",
)
def q_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = dec("l_extendedprice")
    # Round-14 (guide §2.3): TWO countDistincts on different columns in
    # one aggregate force Catalyst's Expand rewrite — every input row is
    # tripled and the decimal moment sums run over the expanded stream.
    # Split into three single-purpose aggregations (each a plain
    # codegen'd 2-phase agg over one scan) cross-joined on their 1-row
    # results: 2.21 s -> 0.47 s at sf0.1, identical output.
    m = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(p).cast("double").alias("min_price"),
        F.max(p).cast("double").alias("max_price"),
        F.sum(p).cast("double").alias("sum_price"),
        F.sum(p * p).cast("double").alias("sum_sq"),
    )
    d1 = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    d2 = li.agg(F.countDistinct("l_partkey").alias("n_parts"))
    s = m.crossJoin(d1).crossJoin(d2)
    var = (F.col("sum_sq") - F.col("sum_price") * F.col("sum_price") / F.col("n_rows")) / (
        F.col("n_rows") - 1
    )
    return s.select(
        "n_rows",
        "n_orders",
        "n_parts",
        "min_price",
        "max_price",
        (F.col("sum_price") / F.col("n_rows")).alias("avg_price"),
        F.round(F.sqrt(var), 4).alias("std_price"),
        F.round(var, 4).alias("var_price"),
    )


# --------------------------------------------------------------------------
# Correlation via exact cross-moments (deterministic corr).
# --------------------------------------------------------------------------
@query(
    "q_correlation",
    oracle="""
WITH s AS (
  SELECT COUNT(*) AS n,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sy,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxx,
    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS syy,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxy
  FROM lineitem)
SELECT n,
  round((sxy - sx * sy / n) / (n - 1), 6) AS covar_qty_price,
  round((sxy - sx * sy / n)
    / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 10)
    AS corr_qty_price
FROM s
""",
)
def q_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity"), dec("l_extendedprice")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        "n",
        F.round((sxy - sx * sy / n) / (n - 1), 6).alias("covar_qty_price"),
        F.round(
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)),
            10,
        ).alias("corr_qty_price"),
    )


# --------------------------------------------------------------------------
# Exact median / interpolated percentiles on 2-decimal data.
# --------------------------------------------------------------------------
@query(
    "q_percentiles",
    oracle="""
SELECT l_returnflag,
  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
  CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
  CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-14 (guide §2.3, §4.5-adjacent): the exact-percentile partial
    # aggregate builds a per-partition value-count map (ObjectHash, no
    # codegen) — CPU-heavy per row — and lineitem.parquet at bench SF
    # plans only 3 scan tasks (row-group bound), so the partials ran on
    # 3 of 32 cores. Project to the four needed columns and fan the
    # scan out (no-op at real scale, where the scan already yields
    # >= defaultParallelism tasks). 1.78 s -> 1.37 s at sf0.1; exact
    # percentile is partitioning-independent, results identical. The
    # remaining cost is the per-group map MERGE on the final aggregate,
    # which is inherently single-task per group (3 groups).
    # Array-form percentile (round 14, same as q_approx_aggregates #10):
    # ONE value-count map per group serves both percentiles instead of
    # two identical maps. Identical doubles; 2.07 s -> 1.68 s at sf0.1.
    # Round-15 (guide §2.3/§5): percentiles now run as the two-level
    # histogram plan (_helpers.exact_percentiles_two_level) — the
    # per-group value-count map MERGE this comment block documented as
    # the inherent single-task floor is gone (sf10 on the same measure:
    # 52.1 s -> 24.6 s, and the map form OOMs an 8g driver under
    # repetition there). min/max ride a separate cheap codegen
    # aggregate joined on the 3-row key. Doubles bit-identical
    # (repr-compare + oracle hash at 3 SFs).
    li = load_table(spark, sf_dir, "lineitem")
    # min/max are cheap codegen partials — no fan-out needed; only the
    # histogram branch (CPU-bound partials at bench scan-task counts)
    # keeps the fan_out_small_scan (no-op at real scale).
    mm = li.groupBy("l_returnflag").agg(
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
    )
    pct = exact_percentiles_two_level(
        fan_out_small_scan(li.select("l_returnflag", "l_extendedprice")),
        ["l_returnflag"],
        "l_extendedprice",
        [0.5, 0.9],
        "_p",
    )
    return mm.join(pct, "l_returnflag").select(
        "l_returnflag",
        F.round(F.col("_p")[0], 4).alias("median_price"),
        F.round(F.col("_p")[1], 4).alias("p90_price"),
        "min_qty",
        "max_qty",
    )


# --------------------------------------------------------------------------
# ROLLUP over region -> nation (hierarchical subtotals).
# --------------------------------------------------------------------------
@query(
    "q_rollup_region_nation",
    oracle="""
SELECT COALESCE(r_name, 'ALL') AS region_name,
       COALESCE(n_name, 'ALL') AS nation_name,
       COUNT(c_custkey) AS n_customers,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def q_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    # Round-14 (guide §2.3, same as q_cube_flag_status #11): fold to
    # the 25-row (region, nation) leaf groups BEFORE the ROLLUP Expand,
    # then re-sum exact partials — the Expand's 3x row multiplication
    # applies to 25 rows instead of the customer table. Bench-neutral
    # (~0.25 s either way at sf0.1); the win is the design point.
    # Collect-compare identical; oracle green.
    base = joined.groupBy("r_name", "n_name").agg(
        F.count("c_custkey").alias("_n"),
        F.sum(dec("c_acctbal")).alias("_q"),
    )
    return (
        base.rollup("r_name", "n_name")
        .agg(
            F.sum("_n").alias("n_customers"),
            F.sum("_q").cast("double").alias("total_balance"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_balance",
        )
    )


# --------------------------------------------------------------------------
# CUBE over returnflag x linestatus (all grouping combinations).
# --------------------------------------------------------------------------
@query(
    "q_cube_flag_status",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n_items,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Round-14 (guide §2.3, aggregate before you expand): CUBE's Expand
    # quadruples every input row before the partial aggregate — at any
    # scale that is 4x the rows and 4x the decimal-sum updates for a
    # result whose leaf groups are tiny (|flag| x |status| ~ 6). Fold
    # the stream to the leaf groups FIRST (plain two-column groupBy,
    # exact decimal partials), then CUBE the 6-row relation by summing
    # partials. Count = sum of counts, decimal sums re-sum exactly
    # (associative), so the final doubles are bit-identical — proven by
    # collect-compare and the oracle hash at sf0.001/0.01/0.1.
    # Measured 1.0 s -> 0.39 s at sf0.1; the Expand now sees 6 rows.
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec("l_quantity")).alias("_q"),
    )
    return (
        base.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_n").alias("n_items"),
            F.sum("_q").cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
    )


# --------------------------------------------------------------------------
# GROUPING SETS via the SQL entry point (Catalyst parses + plans).
# --------------------------------------------------------------------------
_GROUPING_SETS_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS STRING)
            AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
"""

# Spark-side form (round 14, guide §2.3): fold orders to the ~15
# (status, priority) leaf groups BEFORE the GROUPING SETS Expand, then
# re-sum the exact decimal partials — the Expand's 3x multiplication
# applies to 15 rows instead of the orders table. Same GROUPING SETS
# surface through the same spark.sql entry; COUNT(*) == SUM of leaf
# counts and the decimal sum re-sums exactly, so the output (schema
# incl.) is identical — proven by collect-compare and the oracle hash,
# which still runs the direct form above. 0.39 s -> 0.25 s at sf0.1.
_GROUPING_SETS_SPARK_SQL = """
WITH base AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS _n,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS _t
  FROM orders GROUP BY o_orderstatus, o_orderpriority)
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       SUM(_n) AS n_orders,
       CAST(CAST(SUM(_t) AS STRING) AS DOUBLE) AS total
FROM base
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
"""


@query("q_grouping_sets", oracle=_GROUPING_SETS_SQL)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUPING_SETS_SPARK_SQL)


# --------------------------------------------------------------------------
# PIVOT: market segment x order status matrix.
# --------------------------------------------------------------------------
@query(
    "q_pivot_segment_status",
    oracle="""
SELECT c_mktsegment,
  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_F,
  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_O,
  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_P,
  CAST(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
       FILTER (WHERE o_orderstatus = 'F'), 0) AS VARCHAR) AS DOUBLE) AS total_F,
  CAST(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
       FILTER (WHERE o_orderstatus = 'O'), 0) AS VARCHAR) AS DOUBLE) AS total_O,
  CAST(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
       FILTER (WHERE o_orderstatus = 'P'), 0) AS VARCHAR) AS DOUBLE) AS total_P
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
""",
)
def q_pivot_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey)
    pv = (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("o_totalprice")).alias("total"),
        )
    )
    return pv.select(
        "c_mktsegment",
        F.coalesce("F_n", F.lit(0)).alias("n_F"),
        F.coalesce("O_n", F.lit(0)).alias("n_O"),
        F.coalesce("P_n", F.lit(0)).alias("n_P"),
        F.coalesce(F.col("F_total").cast("double"), F.lit(0.0)).alias("total_F"),
        F.coalesce(F.col("O_total").cast("double"), F.lit(0.0)).alias("total_O"),
        F.coalesce(F.col("P_total").cast("double"), F.lit(0.0)).alias("total_P"),
    )


# --------------------------------------------------------------------------
# Full outer join between two aggregates (null-completing both sides).
# --------------------------------------------------------------------------
@query(
    "q_full_outer_nation_activity",
    oracle="""
WITH co AS (
  SELECT c_nationkey AS nk, COUNT(*) AS n_customers
  FROM customer GROUP BY c_nationkey),
so AS (
  SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
  FROM supplier GROUP BY s_nationkey)
SELECT COALESCE(co.nk, so.nk) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers
FROM co FULL OUTER JOIN so ON co.nk = so.nk
""",
)
def q_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    co = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    so = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return co.join(so, co.nk == so.nk, "full_outer").select(
        F.coalesce(co.nk, so.nk).alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


# --------------------------------------------------------------------------
# Anti join: customers with no finalized ('F') orders. (Plain "no orders"
# matches zero rows in this data — the status filter keeps the anti-join
# non-trivially selective at every scale factor.)
# --------------------------------------------------------------------------
@query(
    "q_anti_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
""",
)
def q_anti_customers_without_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


# --------------------------------------------------------------------------
# Non-equi band join (broadcast nested loop): parts into price bands.
# --------------------------------------------------------------------------
@query(
    "q_band_join_price",
    oracle="""
WITH bands(band, lo, hi) AS (
  VALUES ('low', 0.0, 905.0), ('mid', 905.0, 912.0), ('high', 912.0, 1000.0))
SELECT band, COUNT(*) AS n_parts,
  CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
""",
)
def q_band_join_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("low", 0.0, 905.0), ("mid", 905.0, 912.0), ("high", 912.0, 1000.0)],
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice", "total_price"),
        )
    )


# --------------------------------------------------------------------------
# Cross join (small x small) — cartesian product surface.
# --------------------------------------------------------------------------
@query(
    "q_cross_region_status",
    oracle="""
SELECT r_name, s.o_orderstatus AS orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
""",
)
def q_cross_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    status = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderstatus").alias("orderstatus"))
        .distinct()
    )
    return region.select("r_name").crossJoin(status)


# --------------------------------------------------------------------------
# Right outer join: all parts vs. lineitem usage (nulls preserved on right).
# --------------------------------------------------------------------------
@query(
    "q_right_join_part_usage",
    oracle="""
SELECT p_partkey, p_name,
  COUNT(l_orderkey) AS n_uses,
  CAST(CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(12,2))), 0)
       AS VARCHAR) AS DOUBLE) AS qty
FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
GROUP BY p_partkey, p_name
""",
)
def q_right_join_part_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # Round-14 (guide §2.3 aggregate-before-shuffle, §3.1): for this
    # outer-join orientation the only BHJ-buildable side is LINEITEM,
    # and the planner took it — `BroadcastHashJoin RightOuter
    # BuildLeft` broadcasting the pruned FACT table (fine at sf0.1's
    # estimates, catastrophic at scale where lineitem >> 8 GB).
    # Pre-aggregate lineitem by partkey first (map-side partials), then
    # left-join part to the |part|-bounded aggregate — the broadcast is
    # now the dimension-sized side at any SF. count(l_orderkey) over
    # null-extended rows == coalesce(per-key count, 0) and the decimal
    # sum re-sums exactly; collect-compare identical (20000 rows),
    # oracle green 3 SFs. Measured 1.12 s -> 0.59 s.
    agg = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec("l_quantity")).alias("_q"),
    )
    return part.join(
        agg, part.p_partkey == agg.l_partkey, "left"
    ).select(
        "p_partkey",
        "p_name",
        F.coalesce("_n", F.lit(0)).alias("n_uses"),
        F.coalesce(F.col("_q"), F.lit(0).cast(DEC))
        .cast("double")
        .alias("qty"),
    )
