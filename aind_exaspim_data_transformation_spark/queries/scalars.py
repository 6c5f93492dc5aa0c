"""Scalar-function surface: string / date / math / conditional / array /
JSON / hash functions (SURVEY §2B).

Everything here is a narrow projection over one table — at scale these are
pure map-side pipelines (no shuffle) that stay inside WholeStageCodegen.
Expressions are restricted to the dialect intersection where Spark and
DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ._helpers import fmt_date, fmt_ts
from .registry import query


# --------------------------------------------------------------------------
# String functions over part names.
# --------------------------------------------------------------------------
@query(
    "q_string_funcs",
    oracle="""
SELECT p_partkey,
  upper(p_name) AS upper_name,
  lower(p_brand) AS lower_brand,
  length(p_name) AS name_len,
  substr(p_name, 1, 4) AS name_prefix,
  concat(p_brand, ':', p_type) AS brand_type,
  replace(p_type, ' ', '_') AS type_underscored,
  reverse(p_brand) AS brand_rev,
  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
  trim(concat('  ', p_name, '  ')) AS trimmed,
  regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
  regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
  CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS has_a,
  position('#' IN p_brand) AS hash_pos,
  levenshtein(p_brand, p_type) AS lev_dist,
  repeat(substr(p_brand, 1, 2), 2) AS rep2,
  left(p_type, 3) AS type3
FROM part
""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("upper_name"),
        F.lower("p_brand").alias("lower_brand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias(
            "type_underscored"
        ),
        F.reverse("p_brand").alias("brand_rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.concat(F.lit("  "), "p_name", F.lit("  "))).alias("trimmed"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.when(F.col("p_name").like("%a%"), 1).otherwise(0).alias("has_a"),
        F.instr("p_brand", "#").alias("hash_pos"),
        F.levenshtein("p_brand", "p_type").alias("lev_dist"),
        F.repeat(F.substring("p_brand", 1, 2), 2).alias("rep2"),
        F.substring("p_type", 1, 3).alias("type3"),
    )


# --------------------------------------------------------------------------
# Date/time functions over orders.
# --------------------------------------------------------------------------
@query(
    "q_date_funcs",
    oracle="""
SELECT o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  year(o_orderdate) AS yr,
  month(o_orderdate) AS mon,
  day(o_orderdate) AS dom,
  quarter(o_orderdate) AS qtr,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S')
    AS month_start,
  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
  datediff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
  isodow(o_orderdate) AS iso_dow
FROM orders
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        fmt_date("o_orderdate", "orderdate"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        fmt_ts(F.date_trunc("month", F.col("o_orderdate")), "month_start"),
        fmt_date(F.add_months(F.col("o_orderdate"), 3), "plus3m"),
        fmt_date(F.last_day("o_orderdate"), "month_end"),
        F.datediff(
            F.lit("2000-01-01").cast("timestamp").cast("date"),
            F.col("o_orderdate").cast("date"),
        )
        .cast("long")
        .alias("days_to_y2k"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        (F.weekday("o_orderdate") + 1).alias("iso_dow"),
    )


# --------------------------------------------------------------------------
# Math functions over lineitem measures.
# --------------------------------------------------------------------------
@query(
    "q_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
  round(l_extendedprice, 0) AS price_rounded,
  CAST(floor(l_extendedprice / 100) AS BIGINT) AS price_floor_h,
  CAST(ceil(l_extendedprice / 100) AS BIGINT) AS price_ceil_h,
  abs(l_discount - 0.05) AS disc_dev,
  power(l_quantity, 2) AS qty_sq,
  sqrt(l_quantity) AS qty_sqrt,
  round(ln(l_extendedprice), 8) AS price_ln,
  round(log10(l_extendedprice), 8) AS price_log10,
  round(exp(l_discount), 8) AS disc_exp,
  CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
  ((CAST(l_quantity AS BIGINT) - 30) % 7 + 7) % 7 AS qty_pmod7,
  CAST(greatest(l_quantity, 25.0) AS DOUBLE) AS qty_hi,
  CAST(least(l_quantity, 25.0) AS DOUBLE) AS qty_lo,
  CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
FROM lineitem
""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty_l = F.col("l_quantity").cast("long")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 0).alias("price_rounded"),
        F.floor(F.col("l_extendedprice") / 100).alias("price_floor_h"),
        F.ceil(F.col("l_extendedprice") / 100).alias("price_ceil_h"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 8).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 8).alias("price_log10"),
        F.round(F.exp("l_discount"), 8).alias("disc_exp"),
        (qty_l % 7).alias("qty_mod7"),
        (((qty_l - 30) % 7 + 7) % 7).alias("qty_pmod7"),
        F.greatest(F.col("l_quantity"), F.lit(25.0))
        .cast("double")
        .alias("qty_hi"),
        F.least(F.col("l_quantity"), F.lit(25.0))
        .cast("double")
        .alias("qty_lo"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


# --------------------------------------------------------------------------
# Conditional functions (CASE / coalesce / nullif).
# --------------------------------------------------------------------------
@query(
    "q_conditional_funcs",
    oracle="""
SELECT c_custkey,
  CASE WHEN c_acctbal < 0 THEN 'debt'
       WHEN c_acctbal < 5000 THEN 'low'
       ELSE 'high' END AS bal_class,
  coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_or_default,
  CASE WHEN c_nationkey % 2 = 0 THEN c_acctbal ELSE -c_acctbal END
    AS signed_bal,
  CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END AS bal_is_null
FROM customer
""",
)
def q_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_class"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
            F.lit("DEFAULT"),
        ).alias("seg_or_default"),
        F.when(F.col("c_nationkey") % 2 == 0, F.col("c_acctbal"))
        .otherwise(-F.col("c_acctbal"))
        .alias("signed_bal"),
        F.when(F.col("c_acctbal").isNull(), 1).otherwise(0).alias(
            "bal_is_null"
        ),
    )


# --------------------------------------------------------------------------
# Array / higher-order functions over document word lists.
# --------------------------------------------------------------------------
@query(
    "q_array_funcs",
    oracle="""
SELECT doc_id,
  len(string_split(text, ' ')) AS n_words,
  CAST(list_contains(string_split(text, ' '), 'spark') AS INT) AS has_spark,
  array_to_string(list_slice(string_split(text, ' '), 2, 4), '|') AS words_2_4,
  array_to_string(list_sort(list_distinct(string_split(text, ' '))), '|')
    AS sorted_uniq,
  CAST(list_sum(list_transform(string_split(text, ' '),
                               w -> length(w))) AS BIGINT) AS total_chars,
  len(list_filter(string_split(text, ' '), w -> length(w) > 4))
    AS n_long_words,
  string_split(text, ' ')[1] AS first_word,
  string_split(text, ' ')[-1] AS last_word
FROM documents
""",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_contains(words, "spark").cast("int").alias("has_spark"),
        F.array_join(F.slice(words, 2, 3), "|").alias("words_2_4"),
        F.array_join(F.array_sort(F.array_distinct(words)), "|").alias(
            "sorted_uniq"
        ),
        F.aggregate(
            F.transform(words, lambda w: F.length(w)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.size(F.filter(words, lambda w: F.length(w) > 4)).alias(
            "n_long_words"
        ),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
    )


# --------------------------------------------------------------------------
# JSON extraction from the events props column.
# --------------------------------------------------------------------------
@query(
    "q_json_extract",
    oracle="""
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
  CASE WHEN json_extract_string(props, '$.missing') IS NULL THEN 1 ELSE 0 END
    AS missing_is_null
FROM events
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        F.when(F.get_json_object("props", "$.missing").isNull(), 1)
        .otherwise(0)
        .alias("missing_is_null"),
    )


# --------------------------------------------------------------------------
# from_json: parse into a typed struct, navigate fields (schema-on-read).
# --------------------------------------------------------------------------
@query(
    "q_from_json_struct",
    oracle="""
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
  CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k_doubled
FROM events WHERE event_id < 500
""",
)
def q_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").where(
        F.col("event_id") < 500
    )
    parsed = events.withColumn(
        "j", F.from_json("props", "k BIGINT")
    )
    return parsed.select(
        "event_id",
        F.col("j.k").alias("k_typed"),
        (F.col("j.k") * 2).alias("k_doubled"),
    )


# --------------------------------------------------------------------------
# Hash functions (md5 / sha256) — shared ground truth with DuckDB.
# --------------------------------------------------------------------------
@query(
    "q_hash_funcs",
    oracle="""
SELECT p_partkey,
  md5(p_name) AS name_md5,
  sha256(p_brand) AS brand_sha256,
  md5(concat(p_name, '|', p_type)) AS compound_md5
FROM part
""",
)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2("p_brand", 256).alias("brand_sha256"),
        F.md5(F.concat(F.col("p_name"), F.lit("|"), F.col("p_type"))).alias(
            "compound_md5"
        ),
    )


# --------------------------------------------------------------------------
# try_* error-safe functions: NULL instead of failure under ANSI
# semantics. The oracle reproduces the NULL contract with CASE (same
# values, engine-specific spelling).
# --------------------------------------------------------------------------
@query(
    "q_try_functions",
    oracle="""
SELECT o_orderkey,
  CASE WHEN o_orderkey % 7 = 0 THEN NULL
       ELSE CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
            / (o_orderkey % 7)
  END AS safe_ratio,
  TRY_CAST(o_orderpriority AS INT) AS priority_as_int,
  TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS priority_number
FROM orders WHERE o_orderkey < 400
""",
)
def q_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._helpers import dec

    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") < 400
    )
    return orders.select(
        "o_orderkey",
        F.try_divide(
            dec("o_totalprice").cast("double"),
            F.pmod(F.col("o_orderkey"), F.lit(7)),
        ).alias("safe_ratio"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("priority_as_int"),
        F.expr("try_cast(substr(o_orderpriority, 1, 1) AS INT)").alias(
            "priority_number"
        ),
    )


# --------------------------------------------------------------------------
# EXACT percentiles (percentile_cont semantics) of an integer-valued
# measure: for q in {.25, .5, .75} the interpolation weight g has at most
# two fractional bits and the data are integers, so every intermediate of
# either engine's interpolation formula is exactly representable and the
# doubles match bit-for-bit (unlike arbitrary-double percentiles).
# --------------------------------------------------------------------------
@query(
    "q_exact_percentiles",
    oracle="""
SELECT l_returnflag,
  quantile_cont(CAST(l_quantity AS DOUBLE), 0.25) AS q25,
  quantile_cont(CAST(l_quantity AS DOUBLE), 0.5)  AS q50,
  quantile_cont(CAST(l_quantity AS DOUBLE), 0.75) AS q75,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Array-form percentile (round 14): one value-count map per group
    # serves all three quartiles. Identical doubles.
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile(
                q, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
            ).alias("_p"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag",
            F.col("_p")[0].alias("q25"),
            F.col("_p")[1].alias("q50"),
            F.col("_p")[2].alias("q75"),
            "n_rows",
        )
    )


# --------------------------------------------------------------------------
# Interval arithmetic: calendar (month) and fixed-duration (hour/day)
# intervals over dates and timestamps.
# --------------------------------------------------------------------------
@query(
    "q_interval_arithmetic",
    oracle="""
SELECT o_orderkey,
  strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d')
    AS plus_3_months,
  strftime(CAST(o_orderdate AS DATE) - INTERVAL 90 DAY, '%Y-%m-%d')
    AS minus_90_days,
  strftime(o_orderdate + INTERVAL 36 HOUR, '%Y-%m-%d %H:%M:%S')
    AS plus_36_hours
FROM orders WHERE o_orderkey < 300
""",
)
def q_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") < 300
    )
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        fmt_date(F.expr("CAST(o_orderdate AS DATE) + INTERVAL '3' MONTH"),
                 "plus_3_months"),
        fmt_date(F.date_sub(d, 90), "minus_90_days"),
        fmt_ts(F.expr("o_orderdate + INTERVAL '36' HOUR"), "plus_36_hours"),
    )
