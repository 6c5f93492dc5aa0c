"""Physical-layout operators for 100 TB scale: bucketing and skew salting.

These are the two knobs that kill the big shuffles:

- **Bucketing** pre-partitions a table by join key at write time; two
  tables bucketed the same way join with ZERO shuffle (SortMergeJoin
  directly over bucket files). At 100 TB, re-shuffling a fact table for
  every join is the dominant cost — bucket once, join forever.
- **Salting** splits a skewed hot key across N synthetic sub-keys so one
  reducer doesn't absorb an entire key's rows. AQE's skew-join handles
  moderate skew automatically; salting is the explicit fix for extreme
  single-key skew (and works for aggregations too, via two-phase
  salted partial -> unsalted final).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name, format="parquet")


def bucketed_join_plan_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> tuple[DataFrame, bool]:
    """Join two bucketed tables; report whether the physical plan contains
    a shuffle exchange (it must not when bucket specs line up)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    joined = left.join(right, on)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    has_shuffle = "Exchange hashpartitioning" in plan
    return joined, not has_shuffle


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the (large, skewed) left side gets a
    random-free deterministic salt derived from a secondary column hash;
    the (smaller) right side is exploded across all salt values. Result
    equals ``left.join(right, key, how)`` exactly for inner/left/semi
    joins; right/full-outer would multiply unmatched right rows by
    n_salts, so those are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left/semi joins, not {how!r}: "
            "the exploded right side would duplicate unmatched right rows"
        )
    # pmod, not abs%: abs(Long.MIN_VALUE) is negative, which would yield
    # a salt outside [0, n_salts) and silently drop that row.
    h = F.xxhash64(*left.columns)
    salt = ((h % n_salts + n_salts) % n_salts).alias("__salt")
    salted_left = left.withColumn("__salt", salt)
    salted_right = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )
    out = salted_left.join(salted_right, [key, "__salt"], how)
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    key: str,
    n_salts: int,
    partial_aggs: list,
    final_aggs: list,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: salt -> partial agg on
    (key, salt) -> final agg on key. ``partial_aggs``/``final_aggs`` are
    lists of Column aggregates; the final phase sees the partial columns.
    """
    salted = df.withColumn(
        "__salt", F.abs(F.xxhash64(*df.columns)) % n_salts
    )
    partial = salted.groupBy(key, "__salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)
