"""Parquet table loaders for the synthetic star schema (TESTDATA.md).

The scan path is the foundation of the 100 TB story: ``spark.read.parquet``
gives vectorized columnar scans with predicate pushdown and column pruning
for free, and ``spark.sql.files.maxPartitionBytes`` splits large files into
~128 MB tasks. Nothing here ever collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Parquet scan => pushdown + pruning via Catalyst.

    ``events.parquet``'s ``ts`` column has shipped in two physical forms:
    TIMESTAMP(NANOS), which the Spark parquet reader rejects (read nanos
    as long via the ``nanosAsLong`` conf and truncate to micros —
    identical to DuckDB's TIMESTAMP_NS -> TIMESTAMP cast semantics), and
    TIMESTAMP(MICROS) with isAdjustedToUTC=false. The micros form is
    normalized AT THE SCAN: ``spark.sql.parquet.inferTimestampNTZ.enabled
    =false`` makes the vectorized reader surface it as TIMESTAMP directly
    (value-preserving because the session timezone is forced to UTC), so
    no per-row cast projection sits between the scan and the query. Both
    confs are session-level state, set in ``session.get_spark`` and
    re-asserted here and by the registry wrapper so bare sessions work.
    """
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # Integer division: double division loses precision at 1.7e18 ns.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            # Fallback for sessions where the conf couldn't apply (e.g.
            # a cached self-describing scan) — projection-level cast.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the spark.sql() entry point."""
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
