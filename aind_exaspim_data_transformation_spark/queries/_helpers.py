"""Shared expression helpers for oracle-exact aggregates.

All money/measure columns in the star schema carry at most 2 decimals
(verified against the generated data), so casting DOUBLE -> DECIMAL(12,2)
is lossless, decimal aggregation is exact, and the final DECIMAL -> DOUBLE
cast is deterministic — Spark and DuckDB produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(12,2)"


def dec(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dsum(c: str | Column, alias: str) -> Column:
    """Exact decimal sum emitted as double."""
    return F.sum(dec(c)).cast("double").alias(alias)


def davg(c: str | Column, alias: str) -> Column:
    """Exact-sum / count in double; bit-deterministic."""
    return (F.sum(dec(c)).cast("double") / F.count(F.lit(1))).alias(alias)


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal, scale 4."""
    one = F.lit(1).cast(DEC)
    return (dec("l_extendedprice") * (one - dec("l_discount"))).cast(
        "decimal(18,4)"
    )


def charge() -> Column:
    """disc_price * (1 + l_tax), exact decimal, scale 6."""
    one = F.lit(1).cast(DEC)
    return disc_price() * (one + dec("l_tax"))


def fmt_ts(c: str | Column, alias: str) -> Column:
    """Engine-neutral timestamp rendering (second granularity)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss").alias(alias)


def fmt_date(c: str | Column, alias: str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.date_format(col, "yyyy-MM-dd").alias(alias)


# DuckDB-side fragments mirroring the helpers above.
#
# Decimal -> DOUBLE in the oracles always hops through VARCHAR
# (CAST(CAST(x AS VARCHAR) AS DOUBLE)): DuckDB's native decimal->double
# converts the scaled int128 and divides by 10^scale — two rounding steps
# that drift one ulp from the correctly-rounded double once the scaled
# integer exceeds 2^53 (first hit in practice: scale-6 charge sums at sf1).
# The VARCHAR hop forces strtod's single correct rounding, which is what
# Spark's Decimal.toDouble (BigDecimal.doubleValue) produces at any scale.
SQL_DEC = "DECIMAL(12,2)"


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS {SQL_DEC})) AS VARCHAR) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS {SQL_DEC})) AS VARCHAR) AS DOUBLE) / COUNT(*) AS {alias}"
    )


SQL_DISC_PRICE = (
    f"CAST(CAST(l_extendedprice AS {SQL_DEC})"
    f" * (CAST(1 AS {SQL_DEC}) - CAST(l_discount AS {SQL_DEC}))"
    " AS DECIMAL(18,4))"
)
SQL_CHARGE = (
    f"({SQL_DISC_PRICE} * (CAST(1 AS {SQL_DEC}) + CAST(l_tax AS {SQL_DEC})))"
)


# --------------------------------------------------------------------------
# Scan fan-out for CPU-bound per-row work (shared by the dedup and
# similarity families).
# --------------------------------------------------------------------------
_BYTE_UNITS = {
    "": 1,
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
    "t": 1 << 40,
    "tb": 1 << 40,
}


def parse_bytes(value) -> int:
    """Spark byte-size conf values arrive either as a plain number or
    in human form ('128MB', '64m'); int(str(v).rstrip('b')) crashed on
    the human spellings a user session can legitimately set."""
    s = str(value).strip().lower()
    num = s.rstrip("kmgtb")
    unit = s[len(num):]
    return int(float(num) * _BYTE_UNITS[unit])


def fan_out_small_scan(df):
    """Repartition a scan whose downstream work is CPU-bound when the
    file layout cannot yield enough tasks. A small single-row-group
    parquet file scans as ONE task no matter the split config, so at
    bench scale we pay a (tiny) shuffle to use every core. At 100 TB
    the scan has >> defaultParallelism partitions and this branch never
    triggers — no shuffle on the real path. The check is driver-side
    file metadata only (no RDD conversion, no job): few files AND total
    bytes below target * maxPartitionBytes means Spark cannot plan
    enough scan tasks on its own."""
    import os

    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files and len(files) < target:
        # Size check is local-filesystem only. For remote schemes
        # (s3a://, hdfs://) a stat round-trip per file isn't free and
        # "assume small" inverts the helper's purpose — a handful of
        # multi-GB objects would eat a full-scan shuffle on exactly the
        # large-data path. There Spark's own split planning (row groups
        # x maxPartitionBytes) already yields parallelism, so skip.
        if not all(
            f.startswith("file:") or "://" not in f for f in files
        ):
            return df
        max_pb = parse_bytes(
            spark.conf.get(
                "spark.sql.files.maxPartitionBytes", "134217728"
            )
        )
        try:
            total = sum(
                os.path.getsize(f.removeprefix("file:")) for f in files
            )
        except OSError:  # vanished file etc.: leave the scan alone
            return df
        if total < target * max_pb:
            df = df.repartition(target)
    return df


def fan_out_grouped(df, *keys: str):
    """Explicit keyed repartition before a grouped PYTHON stage
    (applyInPandas / pandas-UDAF window), round 14 guide §2/§4.

    AQE's partition coalescing sizes post-shuffle partitions by BYTES
    (parallelismFirst still floors at minPartitionSize=1MB), which is
    right for JVM aggregation but wrong for a stage whose cost is
    per-GROUP Python work: at bench scale the grouped-UDF shuffle
    coalesced to 2 tasks and serialized ~100k Python group calls onto
    two cores (measured: applyInPandas 17.2s -> 4.0s, pandas-window
    28.0s -> 1.6s at sf0.1 after this repartition). An explicit
    repartition(N, key) is REPARTITION_BY_NUM, which AQE never
    coalesces, and it hash-partitions on the same key the downstream
    groupBy/window needs, so it REPLACES that exchange rather than
    adding one (plan keeps a single Exchange). N comes from
    spark.sql.shuffle.partitions — the deployment's scale dial (local
    default = core count; clusters set 2-3x total cores), so the
    partitioning stays scale-adaptive rather than a local constant."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *[F.col(k) for k in keys])


def adjacent_grams(words: Column, k: int) -> Column:
    """Adjacent word k-grams ('w1 w2 .. wk') in document order,
    LINEAR time per row (round 14, guide §1.2/§4.1).

    The previous idiom — ``transform(slice(words, ...), (w, i) ->
    concat_ws(' ', w, element_at(words, i + 2), ...))`` — re-evaluates
    the ``words`` expression INSIDE the lambda once per element when
    ``words`` is an inline expression (``split(text, ' ')``): Spark
    neither hoists loop-invariant subexpressions out of higher-order-
    function lambdas nor CSEs across the lambda boundary, so each
    element pays a full re-split of the text — O(words^2) string
    allocations per document (measured on q_text_decontaminate: 1.6 s
    -> 0.31 s at sf0.1 from this change alone). Here every slice is a
    TOP-LEVEL expression (codegen CSEs the repeated ``words``), and the
    k slices are zipped pairwise — zip_with's lambda touches only its
    two element arguments.

    All k slices have exactly ``greatest(n-k+1, 0)`` elements (slice j
    covers positions j+1 .. j+n-k+1 <= n), so zip_with never null-pads,
    and ``concat_ws`` composes associatively — the output strings are
    byte-identical to the transform form's.
    """
    n = F.size(words)
    ln = F.greatest(n - (k - 1), F.lit(0))
    out = F.slice(words, 1, ln)
    for j in range(1, k):
        out = F.zip_with(
            out,
            F.slice(words, j + 1, ln),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return out


def exact_percentiles_two_level(df, keys, value, ps, alias: str):
    """Exact interpolated percentiles (Spark ``percentile()`` semantics,
    bit-identical doubles) computed as a TWO-LEVEL plan instead of one
    value-count map per group (round 15, guide §2.3/§5).

    ``percentile(col, array(...))`` builds an ObjectHashAggregate whose
    per-group value-count map is merged and sorted on a SINGLE task per
    group; for a high-cardinality measure the merge dominates (measured
    sf10, l_extendedprice by l_returnflag: 52.1 s) and the maps OOM an
    8g driver heap under repetition. This form aggregates a
    (keys, value) histogram with map-side partials (bounded by the
    value DOMAIN, not the row count), running-sums it in a window
    partitioned by ``keys``, and picks each percentile's bracketing
    rows with conditional MIN aggregates. The interpolation replicates
    Percentile.getPercentile exactly — position = (n-1)*p as a double
    product, value-at-k = first histogram row whose cumulative count
    exceeds k, lower==higher and equal-bracket short-circuits, then
    (hi-pos)*v_lo + (pos-lo)*v_hi — proven bit-equal (repr compare) on
    sf0.1/sf10 and hash-gated by the oracles. 24.6 s at sf10 (2.1x).

    ``value`` must be non-null, non-NaN (TPC-H measures are); callers
    with nullable measures must pre-filter to match percentile()'s
    null-skipping. Returns one row per key combination:
    keys + ``alias`` = array<double> of len(ps).
    """
    from pyspark.sql import Window

    keys = list(keys)
    v = F.col(value) if isinstance(value, str) else value
    hist = df.groupBy(*keys, v.alias("_v")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(w))
    tot = hist.groupBy(*keys).agg(F.sum("_c").alias("_n"))
    j = cum.join(F.broadcast(tot), keys)

    def pos_of(p):
        return (F.col("_n") - 1).cast("double") * F.lit(p)

    brackets = []
    for i, p in enumerate(ps):
        lo = F.floor(pos_of(p)).cast("long")
        hi = F.ceil(pos_of(p)).cast("long")
        at = F.col("_cum") - F.col("_c")  # rows before this value
        brackets += [
            F.min(
                F.when((at <= lo) & (lo < F.col("_cum")), F.col("_v"))
            ).alias(f"_vlo{i}"),
            F.min(
                F.when((at <= hi) & (hi < F.col("_cum")), F.col("_v"))
            ).alias(f"_vhi{i}"),
        ]
    agg = j.groupBy(*keys).agg(F.min("_n").alias("_n"), *brackets)

    def interp(i, p):
        pos = pos_of(p)
        lo, hi = F.floor(pos), F.ceil(pos)
        vlo, vhi = F.col(f"_vlo{i}"), F.col(f"_vhi{i}")
        return (
            F.when(hi == lo, vlo)
            .when(vhi == vlo, vlo)
            .otherwise((hi - pos) * vlo + (pos - lo) * vhi)
        )

    return agg.select(
        *keys,
        F.array(*[interp(i, p) for i, p in enumerate(ps)]).alias(alias),
    )


def top_element_count(arr: Column) -> Column:
    """Count of the most frequent element of a string array, computed as
    the longest run of a SORTED copy (array_sort + single aggregate
    pass): O(n log n) per row. Replaces the O(distinct x n)
    transform/array_distinct/filter form — identical integer results,
    measured 3x faster on the sf10 corpus (36.1 s -> 11.6 s for the
    500k-doc Gopher top-unigram stage), found by the round-7 scale
    sweep. Row-local and codegen'd; no shuffle, no Python."""
    state = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, w: Column) -> Column:
        run = (
            F.when(
                acc.prev.isNotNull() & (w == acc.prev),
                acc.run + F.lit(1).cast("long"),
            )
            .otherwise(F.lit(1).cast("long"))
        )
        return F.struct(
            w.alias("prev"),
            run.alias("run"),
            F.greatest(acc.best, run).alias("best"),
        )

    return F.aggregate(
        F.array_sort(arr), state, step, lambda acc: acc.best
    )
