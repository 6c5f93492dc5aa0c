"""Physical-layout operators for 100 TB scale: bucketing, skew salting,
and Z-order (Morton-curve) clustering.

Bucketing and salting are the two knobs that kill the big shuffles:

- **Bucketing** pre-partitions a table by join key at write time; two
  tables bucketed the same way join with ZERO shuffle (SortMergeJoin
  directly over bucket files). At 100 TB, re-shuffling a fact table for
  every join is the dominant cost — bucket once, join forever.
- **Salting** splits a skewed hot key across N synthetic sub-keys so one
  reducer doesn't absorb an entire key's rows. AQE's skew-join handles
  moderate skew automatically; salting is the explicit fix for extreme
  single-key skew (and works for aggregations too, via two-phase
  salted partial -> unsalted final).

**Z-ordering** is the data-skipping knob: sorting a fact table by one
column makes parquet min/max file stats selective for that column only;
interleaving the bits of several columns' quantile-bucket ranks (the
Morton curve) keeps every participating column locally clustered, so
point/range predicates on ANY of them prune most files. This is what
Delta/Iceberg ``OPTIMIZE ZORDER BY`` does; here it is a pure DataFrame
recipe: quantile-bucket each column (driver-side approxQuantile
boundaries, broadcast into the expression), interleave bits JVM-side,
``repartitionByRange`` + ``sortWithinPartitions`` on the key.
"""

from __future__ import annotations

import shutil
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..zarrio.kvstore import is_s3, kv_delete_prefix


def _managed_table_location(spark: SparkSession, table_name: str) -> str | None:
    """Store URL where the managed table ``table_name`` lives (or would
    live), or ``None`` when it cannot be determined.

    Resolution order:

    1. The catalog's own record — ``DESCRIBE TABLE EXTENDED`` when the
       table exists. Always right, including custom-LOCATION databases.
    2. The owning database's ``locationUri`` + ``/<table>`` — Spark's
       managed layout. Right whenever the database exists (covers
       custom-LOCATION databases the reconstruction below would miss).
    3. Reconstruction from ``spark.sql.warehouse.dir``:
       ``<warehouse>/<table>`` for the default database,
       ``<warehouse>/<db>.db/<table>`` otherwise (identifiers lowercased,
       as the session catalog stores them). This heuristic is only valid
       for default-location databases — but it is also only *reached*
       when neither the table nor its database exists in the catalog, in
       which case the database cannot have a custom location.
    """
    parts = [p.strip("`") for p in table_name.split(".")]
    tbl = parts[-1].lower()
    db = parts[-2].lower() if len(parts) > 1 else None
    try:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect()
        for r in rows:
            if r["col_name"] == "Location":
                return r["data_type"]
    except Exception:
        pass  # table not in catalog: fall through to the database layout
    try:
        db_loc = spark.catalog.getDatabase(db or "default").locationUri
        return db_loc.rstrip("/") + "/" + tbl
    except Exception:
        pass  # database not in catalog either
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    base = warehouse.rstrip("/")
    if db is None or db == "default":
        return f"{base}/{tbl}"
    return f"{base}/{db}.db/{tbl}"


def _remove_location(spark: SparkSession, location: str) -> None:
    """Delete a table location, dispatched by scheme: ``s3://`` and the
    ``s3+local://`` test fake go through the kvstore layer's idempotent
    prefix delete; local paths (``file:`` or bare) through ``rmtree``;
    any other Hadoop-supported scheme (hdfs, s3a, abfs, ...) through the
    JVM FileSystem API — the same connector Spark's own managed-table
    drops use, so whatever warehouse Spark can write, this can clean."""
    if is_s3(location):
        kv_delete_prefix(location)
        return
    parsed = urlparse(location)
    if parsed.scheme in ("", "file"):
        # urlparse keeps percent-encoding; a warehouse dir containing
        # spaces (file:/tmp/my%20wh) must be decoded or the cleanup
        # silently misses the real orphan.
        path = unquote(parsed.path) if parsed.scheme == "file" else location
        shutil.rmtree(path, ignore_errors=True)
        return
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(location)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        fs.delete(jpath, True)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Crash-retry-safe: a prior run that died between ``saveAsTable`` and
    its cleanup leaves a warehouse directory with NO catalog entry (a new
    JVM starts with an empty in-memory catalog). ``mode("overwrite")``
    only overwrites tables the catalog knows about, so Spark would refuse
    the orphaned location with LOCATION_ALREADY_EXISTS. Drop any stale
    catalog entry AND remove the orphaned location before writing —
    the same idempotency contract the Zarr shard writer keeps
    (reference analog: idempotent store create,
    ``compress/imaris_to_zarr.py:1781-1790``). The location is resolved
    from the catalog when it can be (so custom-LOCATION databases clean
    the right directory) and the delete is scheme-dispatched, so remote
    warehouses (S3/HDFS) get the same retry guarantee as local ones.
    """
    spark = df.sparkSession
    loc = _managed_table_location(spark, table_name)
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    if loc is not None:
        _remove_location(spark, loc)
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


def morton_key(cols: list, bits: int = 8) -> "F.Column":
    """Interleave the low ``bits`` bits of each (already bucketed,
    non-negative integer) column into one Morton-curve key.

    Bit i of column j lands at position ``i * len(cols) + j``. The whole
    expression is plain shift/and/multiply arithmetic, so it stays inside
    whole-stage codegen — no UDF.
    """
    ncols = len(cols)
    # Interleaved key must fit a signed BIGINT: auto-reduce bits so
    # bits * ncols <= 63 (1 << 63 would overflow and silently degrade
    # the literal to a non-bigint type).
    bits = min(bits, 63 // ncols)
    cols = [
        (F.col(c) if isinstance(c, str) else c).cast("bigint") for c in cols
    ]
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z + bit * F.lit(1 << (i * ncols + j))
    return z


def quantile_bucket(
    df: DataFrame, col: str, n_buckets: int, rel_err: float = 0.01
) -> "F.Column":
    """Map ``col`` to its quantile-bucket rank in [0, n_buckets).

    Boundaries come from one driver-side ``approxQuantile`` (a sampled
    sketch — cheap even on a huge table) and are folded into the
    expression as literals, so the per-row cost is a codegen'd
    comparison fold, not a join. Quantile (not equi-width) bucketing
    keeps the buckets balanced under skewed value distributions.
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(df.approxQuantile(col, qs, rel_err)))
    # Ties collapse under skew / low cardinality, leaving k < n_buckets-1
    # distinct boundaries. Scale the rank back onto [0, n_buckets) so the
    # HIGH bits of the bucket stay informative — otherwise a low-cardinality
    # column contributes only low interleave bits and the Morton curve
    # degenerates to the other columns' order.
    expr = F.lit(0)
    for b in bounds:
        expr = expr + F.when(F.col(col) > F.lit(b), 1).otherwise(0)
    scale = max(1, n_buckets // (len(bounds) + 1))
    return (expr * F.lit(scale)).cast("bigint")


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int = 64,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of
    ``zorder_cols``.

    ``repartitionByRange`` on the key gives contiguous curve segments per
    file (range partitioning samples the key distribution, so files get
    balanced row counts); the within-partition sort tightens per-file
    min/max stats for every z-ordered column simultaneously.
    """
    buckets = [quantile_bucket(df, c, 1 << bits) for c in zorder_cols]
    keyed = df.withColumn("__zkey", morton_key(buckets, bits=bits))
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_covering_value(
    spark: SparkSession, path: str, col: str, value
) -> int:
    """How many parquet files of ``path`` could contain ``col = value``,
    judged by per-file min/max — the same stats a reader's file-skipping
    uses. Layout quality metric for the z-order tests."""
    df = spark.read.parquet(path)
    per_file = (
        df.select(F.input_file_name().alias("f"), F.col(col).alias("v"))
        .groupBy("f")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    )
    return per_file.where(
        (F.col("lo") <= F.lit(value)) & (F.col("hi") >= F.lit(value))
    ).count()
