"""Fifth batch: ordered string aggregation, boolean aggregates, exact
linear-regression statistics, and two deterministic training-data
pipeline staples (hash-based train/test split, stratified per-group
sampling).

Determinism notes:

- ``listagg ... within group (order by ...)`` carries a total order, so
  the concatenated string is reproducible on both engines.
- Regression stats are computed from *integer* sums (quantity is
  integral; discount has exactly 2 decimals, so ``dec*100`` is integral)
  — every intermediate is an exact BIGINT, and the final slope /
  intercept / r² are doubles derived by the identical operation sequence
  on identical inputs, hence bit-equal across engines.
- The train/test split keys on one hex nibble of ``md5(text)`` — a
  portable deterministic hash both engines compute identically (same
  trick as ``q_simhash``). At 100 TB this is the right shape: the split
  is a map-only projection (no shuffle), and the per-split stats are a
  low-cardinality partial aggregate.
- The stratified sample is a per-group top-k by hash order: deterministic
  "random" sampling without ``rand()``. Spark executes it as a window
  over a shuffle by ``lang``; at scale the rank filter collapses each
  group to k rows before anything downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ._helpers import dec
from .registry import query


# --------------------------------------------------------------------------
# Ordered string aggregation (listagg / string_agg): nations per region.
# --------------------------------------------------------------------------
@query(
    "q_listagg_nations_per_region",
    oracle="""
SELECT r_name,
  string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
  COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def q_listagg_nations_per_region(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy("r_name")
        .agg(
            F.expr(
                "listagg(n_name, ',') within group (order by n_name)"
            ).alias("nations_csv"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


# --------------------------------------------------------------------------
# Boolean aggregates (bool_and / bool_or) per order priority.
# --------------------------------------------------------------------------
@query(
    "q_bool_aggregates",
    oracle="""
SELECT o_orderpriority,
  bool_and(o_totalprice > 1000.0) AS all_over_1k,
  bool_or(o_totalprice > 400000.0) AS any_over_400k,
  bool_and(o_custkey IS NOT NULL) AS custkey_complete,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
)
def q_bool_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000.0).alias("any_over_400k"),
        F.bool_and(F.col("o_custkey").isNotNull()).alias("custkey_complete"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------------
# Linear regression of discount (in percent) on quantity, per return
# flag, from exact integer sums: slope / intercept / r² computed by the
# identical double operation sequence on both engines. The single
# partial-aggregate pass over the fact table is the at-scale shape
# (one shuffle of 6 numbers per group).
# --------------------------------------------------------------------------
_REGR_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
    CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) AS x,
    CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
  FROM lineitem),
a AS (
  SELECT l_returnflag, COUNT(*) AS n,
    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
    CAST(SUM(x * y) AS BIGINT) AS sxy,
    CAST(SUM(x * x) AS BIGINT) AS sxx,
    CAST(SUM(y * y) AS BIGINT) AS syy
  FROM s GROUP BY l_returnflag),
d AS (
  -- products in DOUBLE, not BIGINT: n * sxx would overflow int64 around
  -- sf30 (Spark wraps, DuckDB errors); the identical IEEE multiply /
  -- subtract sequence on both engines stays bit-deterministic unbounded.
  SELECT l_returnflag, n, sx, sy,
    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny
  FROM a)
SELECT l_returnflag, n AS n_rows,
  num / denx AS slope,
  (CAST(sy AS DOUBLE) - (num / denx) * CAST(sx AS DOUBLE)) / n
    AS intercept,
  (num / sqrt(denx * deny)) * (num / sqrt(denx * deny)) AS r2
FROM d
"""


@query("q_regression_stats", oracle=_REGR_ORACLE)
def q_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        "l_returnflag",
        dec("l_quantity").cast("bigint").alias("x"),
        (dec("l_discount") * 100).cast("bigint").alias("y"),
    )
    a = s.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    # Mirror the oracle: products in DOUBLE (int64 n * sxx overflows ~sf30);
    # same IEEE op sequence on both engines -> bit-identical at any scale.
    nd, sxd, syd = (c.cast("double") for c in (n, sx, sy))
    num = nd * F.col("sxy").cast("double") - sxd * syd
    denx = nd * F.col("sxx").cast("double") - sxd * sxd
    deny = nd * F.col("syy").cast("double") - syd * syd
    slope = num / denx
    r = num / F.sqrt(denx * deny)
    return a.select(
        "l_returnflag",
        n.alias("n_rows"),
        slope.alias("slope"),
        ((sy.cast("double") - slope * sx.cast("double")) / n).alias(
            "intercept"
        ),
        (r * r).alias("r2"),
    )


# --------------------------------------------------------------------------
# Deterministic ~80/20 train/test split by one md5 hex nibble of the
# document text (hex '0'..'c' = 13/16 = 81.25% train). Map-only split;
# per-(split, lang) corpus stats.
# --------------------------------------------------------------------------
@query(
    "q_train_test_split",
    oracle="""
SELECT
  CASE WHEN substr(md5(text), 1, 1) <= 'c' THEN 'train' ELSE 'test' END
    AS split,
  lang,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents
GROUP BY 1, 2
""",
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    split = (
        F.when(F.substring(F.md5("text"), 1, 1) <= F.lit("c"), "train")
        .otherwise("test")
        .alias("split")
    )
    return (
        docs.select(split, "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
                "avg_chars"
            ),
        )
    )


# --------------------------------------------------------------------------
# Stratified sample: k=5 documents per language, chosen by md5 hash
# order (deterministic pseudo-random, unlike rand()); doc_id breaks
# ties between identical texts.
# --------------------------------------------------------------------------
@query(
    "q_stratified_sample",
    oracle="""
SELECT lang, doc_id, rk FROM (
  SELECT lang, doc_id,
    row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id)
      AS rk
  FROM documents) t
WHERE rk <= 5
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5("text"), "doc_id")
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 5)
    )
