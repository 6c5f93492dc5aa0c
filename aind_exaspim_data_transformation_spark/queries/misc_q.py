"""Remaining §2B scalar surface: map functions, null-safe equality,
LIKE/RLIKE, engine-native hashes/strings (golden-checksum oracles), and
approximate aggregates (error-bound-boolean oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ._helpers import exact_percentiles_two_level
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
# Engine-native hashes (xxhash64 / crc32 / murmur3). DuckDB has no twin
# for these families, so the oracle pins GOLDEN CHECKSUMS instead: one row
# of whole-table aggregates (bit_xor / sum of the hashes), with the
# expected value selected by a CASE on COUNT(*) so the same oracle is
# exact at sf0.001 / sf0.01 / sf0.1 plus the locally generated sf1
# (tools/gen_testdata.py, seed 7). The crc32 goldens are independently
# verified against zlib.crc32 in tests/test_engine_functions.py; the
# xxhash64/murmur3 goldens pin Spark's seed-42 implementations against
# regression. Used by the salting helpers and shard-content fingerprints.
# --------------------------------------------------------------------------
@query(
    "q_hash_engine_native",
    oracle="""
WITH n AS (SELECT COUNT(*) AS n_rows FROM part)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
  CAST(CASE n_rows WHEN 200 THEN -5717840153824412150
                   WHEN 2000 THEN 7205360855703747144
                   WHEN 20000 THEN 2661647849670910908
                   WHEN 200000 THEN 1430004874851381006 END AS BIGINT)
    AS xxh64_name_xor,
  CAST(CASE n_rows WHEN 200 THEN 475215289216
                   WHEN 2000 THEN 4702511336529
                   WHEN 20000 THEN 47549258395965
                   WHEN 200000 THEN 474489035036569 END AS BIGINT)
    AS crc32_brand_sum,
  CAST(CASE n_rows WHEN 200 THEN -1252465049
                   WHEN 2000 THEN 1373160254
                   WHEN 20000 THEN -1115820817
                   WHEN 200000 THEN 316269552 END AS BIGINT)
    AS murmur3_compound_xor
FROM n
""",
)
def q_hash_engine_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.expr("bit_xor(xxhash64(p_name))").alias("xxh64_name_xor"),
        F.sum(F.crc32(F.col("p_brand").cast("binary")))
        .cast("long")
        .alias("crc32_brand_sum"),
        F.expr("cast(bit_xor(hash(p_name, p_type)) as bigint)").alias(
            "murmur3_compound_xor"
        ),
    )


# --------------------------------------------------------------------------
# Engine-native string functions (soundex / initcap / translate /
# format_number), now fully oracled:
#  * soundex has no DuckDB twin, but every c_name is 'Customer#<digits>'
#    (digits don't contribute), so the output is the constant 'C235' the
#    oracle emits directly;
#  * initcap over the single-word c_mktsegment = upper first + lower rest;
#  * translate has identical Postgres semantics in both engines;
#  * format_number(x, 2) = printf('%.2f') + one comma for x >= 1000
#    (acctbal is generated in (-1000, 10000) with exactly 2 decimals, so
#    no rounding ambiguity and at most one separator).
# --------------------------------------------------------------------------
@query(
    "q_string_engine_native",
    oracle="""
SELECT c_custkey,
  'C235' AS name_soundex,
  upper(substr(lower(c_mktsegment), 1, 1))
    || substr(lower(c_mktsegment), 2) AS segment_title,
  translate(c_name, 'C#0', 'K-O') AS name_dashed,
  CASE WHEN c_acctbal >= 1000
    THEN substr(printf('%.2f', c_acctbal), 1, 1) || ','
         || substr(printf('%.2f', c_acctbal), 2)
    ELSE printf('%.2f', c_acctbal) END AS bal_formatted
FROM customer
""",
)
def q_string_engine_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.soundex("c_name").alias("name_soundex"),
        F.initcap(F.lower("c_mktsegment")).alias("segment_title"),
        F.translate("c_name", "C#0", "K-O").alias("name_dashed"),
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
# Approximate aggregates. The sketch outputs (HLL, t-digest-ish quantile)
# are engine-specific, so the query emits ERROR-BOUND BOOLEANS the oracle
# can assert exactly: approx_count_distinct(rsd=0.01) within 5% (a 5-sigma
# bound — the default rsd 0.05 is 1-sigma and does exceed 5% on this
# data) of the exact distinct count, and percentile_approx(accuracy=1000)
# landing inside the exact [p45, p55] band (rank error <= n/1000 per the
# Greenwald-Khanna bound, far tighter than that band). The exact distinct
# count itself is hash-checked against DuckDB.
# --------------------------------------------------------------------------
@query(
    "q_approx_aggregates",
    oracle="""
SELECT l_returnflag,
  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
  1 AS approx_cd_within_5pct,
  1 AS approx_median_in_p45_p55
FROM lineitem GROUP BY l_returnflag
""",
)
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # SPLIT the exact-distinct aggregate from the sketch aggregates
    # (round 14, guide §2.3/§5). Mixed in one agg, Catalyst's distinct
    # rewrite keys the PARTIAL aggregate on (l_returnflag, l_orderkey) —
    # so every sketch buffer (16 KB HLL at rsd=0.01 + three percentile
    # maps) is built once per ORDERKEY (~150k groups at sf0.1, GBs of
    # buffers through the exchange): measured 133 s at sf0.1. Split into
    # two aggregations (3 groups each) joined on l_returnflag: 3.6 s,
    # identical results. The join is a 3-row broadcast.
    # Round-14 refinements (guide §2.3), both proven result-identical:
    # (a) the HLL sketch rides the SAME deduped (flag, orderkey)
    # relation as the exact count — HLL register maxima are invariant
    # under duplicate insertion, so approx_count_distinct over the
    # distinct pairs is bit-identical to over the raw stream, and the
    # raw 600k-row pass that existed only to feed the HLL disappears;
    # (b) the two exact percentiles use the array form — ONE value-count
    # map per group instead of two identical ones (the dominant cost of
    # the sketch aggregation: 1.83 s -> 1.08 s measured in isolation).
    pairs = li.select("l_returnflag", "l_orderkey").distinct()
    d = pairs.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("_approx_cd"),
    )
    # Round-15 (guide §2.3/§5): the exact percentile pair now runs as
    # the two-level histogram plan (_helpers.exact_percentiles_two_level
    # — bit-identical doubles, proven by repr-compare at sf0.1/sf10):
    # the single-task per-group value-count map MERGE was the residual
    # floor r14 documented (52.1 s at sf10, and it OOMs an 8g driver
    # under repetition there); the histogram form runs in 24.6 s. Costs
    # one extra column-pruned (flag, price) scan next to the
    # percentile_approx aggregate — measured cheaper than the map merge
    # from sf0.1 up.
    s = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("_amed"),
    )
    pexact = exact_percentiles_two_level(
        li, ["l_returnflag"], "l_extendedprice", [0.45, 0.55], "_p"
    )
    g = d.join(s, "l_returnflag").join(pexact, "l_returnflag")
    return g.select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("_approx_cd") - F.col("exact_orders"))
            / F.col("exact_orders")
            <= 0.05
        )
        .cast("int")
        .alias("approx_cd_within_5pct"),
        F.col("_amed")
        .between(F.col("_p")[0], F.col("_p")[1])
        .cast("int")
        .alias("approx_median_in_p45_p55"),
    )
