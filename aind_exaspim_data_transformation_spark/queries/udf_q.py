"""UDF surface (SURVEY §2B): scalar Python UDF, Arrow-vectorized pandas
UDF, grouped applyInPandas, pandas GROUPED_AGG UDAF, mapInArrow, and a
table-function-style exploding UDF.

Every UDF here is deterministic and therefore oracle-checkable. Numeric
UDFs use the cents-integer trick (2-decimal money -> int64 cents) so
Python/pandas float summation matches DuckDB's decimal arithmetic
bit-for-bit.

Scale note: these are the SLOW path (JVM<->Python Arrow transfer); the
engine keeps them off hot paths — they exist because users bring custom
logic. pandas UDFs batch via Arrow (~10-100x over row-at-a-time); scalar
Python UDFs are included for surface completeness only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
)

from ..sources.tables import load_table
from ._helpers import fan_out_grouped
from .registry import query


# --------------------------------------------------------------------------
# Scalar (row-at-a-time) Python UDF.
# --------------------------------------------------------------------------
@query(
    "q_udf_scalar_python",
    oracle="""
SELECT p_partkey,
  concat(reverse(p_brand), ':', CAST(length(p_name) AS VARCHAR)) AS tag
FROM part
""",
)
def q_udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")

    @F.udf(returnType=StringType())
    def tag(brand: str, name: str) -> str:
        return f"{brand[::-1]}:{len(name)}"

    return part.select("p_partkey", tag("p_brand", "p_name").alias("tag"))


# --------------------------------------------------------------------------
# Arrow-vectorized pandas UDF (Series -> Series).
# --------------------------------------------------------------------------
@query(
    "q_udf_pandas_vectorized",
    oracle="""
SELECT l_orderkey, l_linenumber,
  CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       * CAST(l_quantity AS BIGINT) AS DOUBLE) / 100.0 AS gross
FROM lineitem
""",
)
def q_udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    @F.pandas_udf(DoubleType())
    def gross(price: pd.Series, qty: pd.Series) -> pd.Series:
        cents = np.floor(price * 100 + 0.5).astype("int64")
        return (cents * qty.astype("int64")).astype("float64") / 100.0

    return li.select(
        "l_orderkey",
        "l_linenumber",
        gross("l_extendedprice", "l_quantity").alias("gross"),
    )


# --------------------------------------------------------------------------
# Grouped map: applyInPandas — per-customer spend share per order.
# --------------------------------------------------------------------------
@query(
    "q_udf_apply_in_pandas",
    oracle="""
SELECT o_custkey, o_orderkey,
  CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS DOUBLE)
    / CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           OVER (PARTITION BY o_custkey) AS DOUBLE) AS spend_share
FROM orders
""",
)
def q_udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    # Round-14 optimization (guide §4.1/§2.3): project to the three
    # needed columns BEFORE the grouped-UDF exchange (applyInPandas is
    # opaque to column pruning — unprojected, all 9 order columns cross
    # the shuffle and the Arrow boundary), move the cents conversion
    # into the JVM (codegen'd floor once per row instead of a numpy
    # pass per group), and fan the grouped stage out explicitly
    # (fan_out_grouped: AQE byte-based coalescing serialized ~100k
    # per-group Python calls onto 2 tasks). Measured 17.2s -> 4.0s at
    # sf0.1; results bit-identical (cents are exact int64 either way).
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    proj = orders.select("o_custkey", "o_orderkey", cents.alias("_cents"))

    def share(pdf: pd.DataFrame) -> pd.DataFrame:
        c = pdf["_cents"].to_numpy()
        pdf["spend_share"] = c.astype("float64") / float(c.sum())
        return pdf[["o_custkey", "o_orderkey", "spend_share"]]

    return fan_out_grouped(proj, "o_custkey").groupBy("o_custkey").applyInPandas(
        share, "o_custkey long, o_orderkey long, spend_share double"
    )


# --------------------------------------------------------------------------
# pandas GROUPED_AGG UDAF — quantity-weighted mean discount per flag.
# --------------------------------------------------------------------------
@query(
    "q_udf_grouped_agg",
    oracle="""
SELECT l_returnflag,
  CAST(SUM(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
           * CAST(l_quantity AS BIGINT)) AS DOUBLE)
    / (100.0 * CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE))
    AS weighted_disc
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    @F.pandas_udf(DoubleType())
    def weighted_disc(disc: pd.Series, qty: pd.Series) -> float:
        cents = np.floor(disc * 100 + 0.5).astype("int64")
        q = qty.astype("int64")
        return float(int((cents * q).sum())) / (100.0 * float(int(q.sum())))

    return li.groupBy("l_returnflag").agg(
        weighted_disc("l_discount", "l_quantity").alias("weighted_disc")
    )


# --------------------------------------------------------------------------
# pandas UDAF as a WINDOW function (bounded frame) — the vectorized
# aggregate applied per sliding frame.
# --------------------------------------------------------------------------
@query(
    "q_udf_pandas_window",
    oracle="""
SELECT o_orderkey, o_custkey,
  CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER
    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
    AS moving_total
FROM orders
""",
)
def q_udf_pandas_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")

    # Round-14 optimization (guide §4.2/§2.3): the bounded-frame pandas
    # UDAF is evaluated once per ROW (the Python worker slices each
    # 3-row frame), so the body's cost multiplies by the row count —
    # move the floor/astype cents conversion into the JVM (once per
    # row, codegen) and leave the UDAF body a bare int64 Series sum.
    # fan_out_grouped keeps the per-frame Python work on every core
    # (AQE byte-coalescing had squeezed it to 3 tasks). Measured
    # 28.0s -> 1.6s at sf0.1; bit-identical (exact int64 cents, same
    # /100.0 double division in Python).
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")

    @F.pandas_udf(DoubleType())
    def cents_sum(c: pd.Series) -> float:
        return float(int(c.sum())) / 100.0

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return fan_out_grouped(
        orders.select(
            "o_orderkey", "o_custkey", "o_orderdate", cents.alias("_cents")
        ),
        "o_custkey",
    ).select(
        "o_orderkey",
        "o_custkey",
        cents_sum("_cents").over(w).alias("moving_total"),
    )


# --------------------------------------------------------------------------
# mapInArrow: batch-level pass-through transform on Arrow record batches.
# --------------------------------------------------------------------------
@query(
    "q_udf_map_in_arrow",
    oracle="""
SELECT c_custkey, length(c_name) AS name_len, c_nationkey * 2 AS nk2
FROM customer
""",
)
def q_udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )

    def batch_fn(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("c_custkey"),
                    pc.cast(
                        pc.utf8_length(batch.column("c_name")), pa.int32()
                    ),
                    pc.cast(
                        pc.multiply(batch.column("c_nationkey"), 2),
                        pa.int32(),
                    ),
                ],
                names=["c_custkey", "name_len", "nk2"],
            )

    return cust.mapInArrow(
        batch_fn, "c_custkey long, name_len int, nk2 int"
    )


# --------------------------------------------------------------------------
# Table-function style: array-returning UDF exploded into rows.
# --------------------------------------------------------------------------
@query(
    "q_udf_explode_table_function",
    oracle="""
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents
WHERE doc_id < 10
""",
)
def q_udf_explode_table_function(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 10)

    @F.udf(returnType=ArrayType(StringType()))
    def tokenize(text: str) -> list[str]:
        return text.split(" ")

    return docs.select(
        "doc_id", F.explode(tokenize("text")).alias("token")
    )


# --------------------------------------------------------------------------
# mapInPandas: batch projection with per-batch python logic.
# --------------------------------------------------------------------------
@query(
    "q_udf_map_in_pandas",
    oracle="""
SELECT s_suppkey, upper(s_name) AS uname,
  CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
FROM supplier
""",
)
def q_udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")

    def project(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "s_suppkey": pdf["s_suppkey"],
                    "uname": pdf["s_name"].str.upper(),
                    "bal_cents": np.floor(
                        pdf["s_acctbal"] * 100 + 0.5
                    ).astype("int64"),
                }
            )

    return supp.mapInPandas(
        project, "s_suppkey long, uname string, bal_cents long"
    )
