"""Z-order (Morton-curve) layout: key math, and the data-skipping win
over single-column sorting that justifies it at 100 TB."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from aind_exaspim_data_transformation_spark.operators.layout import (
    files_covering_value,
    morton_key,
    quantile_bucket,
    write_zordered,
)

from conftest import SF_SMALL


def _morton_ref(vals: tuple[int, ...], bits: int) -> int:
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_morton_key_matches_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 127, 255) for y in (0, 3, 200, 255)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", morton_key(["x", "y"], bits=8).alias("z")
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton_ref((x, y), 8)


def test_morton_key_three_columns(spark):
    df = spark.createDataFrame([(5, 3, 6)], "a int, b int, c int")
    z = df.select(morton_key(["a", "b", "c"], bits=4).alias("z")).first().z
    assert z == _morton_ref((5, 3, 6), 4)


def test_quantile_bucket_balances_skew(spark):
    # Heavily skewed values: quantile buckets must still split the mass.
    df = spark.range(0, 10_000).select(
        (F.col("id") * F.col("id")).alias("v")
    )
    b = df.select(quantile_bucket(df, "v", 8).alias("b"))
    counts = {r.b: r.c for r in b.groupBy("b").agg(F.count("*").alias("c")).collect()}
    assert len(counts) >= 6  # approx boundaries: allow slight collapse
    assert max(counts.values()) < 10_000 * 0.3


def test_zorder_skips_files_on_both_columns(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    n_files = 16
    with tempfile.TemporaryDirectory() as tmp:
        zpath, spath = f"{tmp}/z", f"{tmp}/s"
        write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=n_files)
        # Strawman: single-column sort layout (great for partkey only).
        (
            li.repartitionByRange(n_files, "l_partkey")
            .sortWithinPartitions("l_partkey")
            .write.mode("overwrite")
            .parquet(spath)
        )
        # Deterministic probe: the row with the smallest (partkey, suppkey)
        # so the assertion doesn't depend on parquet read order.
        probe = li.orderBy("l_partkey", "l_suppkey").first()
        z_part = files_covering_value(spark, zpath, "l_partkey", probe.l_partkey)
        z_supp = files_covering_value(spark, zpath, "l_suppkey", probe.l_suppkey)
        s_supp = files_covering_value(spark, spath, "l_suppkey", probe.l_suppkey)
        # The partkey-sorted layout cannot skip anything for a suppkey
        # probe; z-order must skip a meaningful fraction for BOTH columns.
        assert s_supp == n_files
        assert z_supp <= n_files // 2
        assert z_part <= n_files // 2


def test_zorder_result_set_unchanged(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_zordered(li, f"{tmp}/z", ["l_partkey", "l_suppkey"], n_files=8)
        back = spark.read.parquet(f"{tmp}/z")
        assert back.count() == li.count()
        assert back.columns == li.columns
        assert (
            back.exceptAll(li).count() == 0 and li.exceptAll(back).count() == 0
        )
