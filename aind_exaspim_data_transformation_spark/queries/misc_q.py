"""Remaining §2B scalar surface: map functions, null-safe equality,
LIKE/RLIKE, and approximate aggregates (rows-only: approx results are
engine-specific by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


# --------------------------------------------------------------------------
# Map functions: construct from arrays, lookup, keys/values, size.
# (DuckDB map extraction yields a single-element list -> unwrap with [1].)
# --------------------------------------------------------------------------
@query(
    "q_map_funcs",
    oracle="""
WITH m AS (
  SELECT doc_id,
    map(['lang', 'source'], [lang, source]) AS meta
  FROM documents WHERE doc_id < 50)
SELECT doc_id,
  meta['lang'][1] AS lang_val,
  array_to_string(map_keys(meta), ',') AS keys_csv,
  array_to_string(map_values(meta), ',') AS vals_csv,
  cardinality(meta) AS n_entries
FROM m
""",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    meta = F.map_from_arrays(
        F.array(F.lit("lang"), F.lit("source")),
        F.array(F.col("lang"), F.col("source")),
    )
    return docs.select(
        "doc_id",
        F.element_at(meta, "lang").alias("lang_val"),
        F.array_join(F.map_keys(meta), ",").alias("keys_csv"),
        F.array_join(F.map_values(meta), ",").alias("vals_csv"),
        F.size(meta).alias("n_entries"),
    )


# --------------------------------------------------------------------------
# Null-safe equality (<=> / IS NOT DISTINCT FROM) through a join on a
# nullable derived key.
# --------------------------------------------------------------------------
@query(
    "q_nullsafe_equality",
    oracle="""
WITH e AS (
  SELECT event_id,
    CASE WHEN event_type = 'error' THEN NULL ELSE user_id END AS uid
  FROM events WHERE event_id < 200)
SELECT a.event_id AS id_a, b.event_id AS id_b
FROM e a JOIN e b
  ON a.uid IS NOT DISTINCT FROM b.uid AND a.event_id < b.event_id
WHERE a.uid IS NULL
""",
)
def q_nullsafe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_id") < 200)
        .select(
            "event_id",
            F.when(F.col("event_type") == "error", None)
            .otherwise(F.col("user_id"))
            .alias("uid"),
        )
    )
    a, b = ev.alias("a"), ev.alias("b")
    return (
        a.join(
            b,
            F.col("a.uid").eqNullSafe(F.col("b.uid"))
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
        .where(F.col("a.uid").isNull())
        .select(
            F.col("a.event_id").alias("id_a"),
            F.col("b.event_id").alias("id_b"),
        )
    )


# --------------------------------------------------------------------------
# LIKE / RLIKE pattern surface.
# --------------------------------------------------------------------------
@query(
    "q_like_rlike",
    oracle="""
SELECT p_partkey,
  CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS is_promo,
  CASE WHEN p_name LIKE '%_5%' THEN 1 ELSE 0 END AS has_x5,
  CASE WHEN regexp_matches(p_brand, '^Brand#[0-9]$') THEN 1 ELSE 0 END
    AS single_digit_brand,
  CASE WHEN regexp_matches(p_type, '(SMALL|LARGE)') THEN 1 ELSE 0 END
    AS sized
FROM part
""",
)
def q_like_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.when(F.col("p_type").like("PROMO%"), 1).otherwise(0).alias(
            "is_promo"
        ),
        F.when(F.col("p_name").like("%_5%"), 1).otherwise(0).alias("has_x5"),
        F.when(F.col("p_brand").rlike("^Brand#[0-9]$"), 1)
        .otherwise(0)
        .alias("single_digit_brand"),
        F.when(F.col("p_type").rlike("(SMALL|LARGE)"), 1)
        .otherwise(0)
        .alias("sized"),
    )


# --------------------------------------------------------------------------
# Engine-native hashes (xxhash64 / crc32 / murmur3) — rows-only: these
# families are Spark-specific (no DuckDB twin); md5/sha256 carry the
# cross-engine contract in q_hash_funcs. Used by the salting helpers and
# shard-content fingerprints.
# --------------------------------------------------------------------------
@query("q_hash_engine_native")
def q_hash_engine_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.xxhash64("p_name").alias("name_xxh64"),
        F.crc32("p_brand").alias("brand_crc32"),
        F.hash("p_name", "p_type").alias("compound_murmur3"),
    )


# --------------------------------------------------------------------------
# Engine-native string functions (soundex / initcap / translate /
# format_number) — rows-only: DuckDB lacks soundex and renders
# initcap/format_number differently.
# --------------------------------------------------------------------------
@query("q_string_engine_native")
def q_string_engine_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.soundex("c_name").alias("name_soundex"),
        F.initcap(F.lower("c_mktsegment")).alias("segment_title"),
        F.translate("c_name", "_", "-").alias("name_dashed"),
        F.format_number(F.col("c_acctbal"), 2).alias("bal_formatted"),
    )


# --------------------------------------------------------------------------
# Unpivot / melt: wide per-status counts back to long form.
# Oracle uses the portable UNION ALL formulation.
# --------------------------------------------------------------------------
@query(
    "q_unpivot_segment_counts",
    oracle="""
WITH wide AS (
  SELECT c_mktsegment,
    COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_F,
    COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_O,
    COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_P
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_mktsegment)
SELECT c_mktsegment, 'n_F' AS status_col, n_F AS n FROM wide
UNION ALL
SELECT c_mktsegment, 'n_O' AS status_col, n_O AS n FROM wide
UNION ALL
SELECT c_mktsegment, 'n_P' AS status_col, n_P AS n FROM wide
""",
)
def q_unpivot_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "c_mktsegment",
            F.coalesce("F", F.lit(0)).alias("n_F"),
            F.coalesce("O", F.lit(0)).alias("n_O"),
            F.coalesce("P", F.lit(0)).alias("n_P"),
        )
    )
    return wide.unpivot(
        ["c_mktsegment"], ["n_F", "n_O", "n_P"], "status_col", "n"
    )


# --------------------------------------------------------------------------
# Approximate aggregates — rows-only (sketches are engine-specific); the
# test suite checks error bounds against exact counts instead.
# --------------------------------------------------------------------------
@query("q_approx_aggregates")
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias(
            "approx_median_price"
        ),
    )
