"""Registered engine SQL functions reachable from spark.sql."""

import pytest

from aind_exaspim_data_transformation_spark.functions import (
    register_engine_functions,
)


def test_engine_functions_in_sql(spark):
    names = register_engine_functions(spark)
    assert "engine_cosine" in names
    row = spark.sql(
        """
        SELECT
          engine_ceil_div(768, 256) AS g,
          engine_shard_count(768, 2688, 3584, 256) AS n,
          engine_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos_same,
          engine_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS cos_orth,
          engine_tokenize('a b c') AS toks,
          engine_level_translation(4, 1.0) AS t4
        """
    ).collect()[0]
    assert row["g"] == 3
    assert row["n"] == 3 * 11 * 14  # the reference's golden grid
    assert row["cos_same"] == pytest.approx(1.0)
    assert row["cos_orth"] == pytest.approx(0.0)
    assert row["toks"] == ["a", "b", "c"]
    assert row["t4"] == 7.5  # golden translation chain value


def test_crc32_matches_zlib(spark):
    """Spark's crc32 is standard CRC-32 — cross-check against zlib so the
    golden checksums pinned in q_hash_engine_native's oracle rest on an
    independent implementation, not just Spark agreeing with itself."""
    import zlib

    from pyspark.sql import functions as F

    samples = ["", "spark", "Brand#13", "The quick brown fox", "größer"]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {
        r["s"]: r["c"]
        for r in df.select(
            "s", F.crc32(F.col("s").cast("binary")).alias("c")
        ).collect()
    }
    for s in samples:
        assert got[s] == zlib.crc32(s.encode("utf-8")), s


def test_xxhash64_murmur3_deterministic_seeds(spark):
    """xxhash64/murmur3 golden values (seed 42, UTF-8 bytes) that the
    q_hash_engine_native oracle checksums build on; pinned so an engine
    upgrade that changes seeds or byte-encoding fails loudly here."""
    from pyspark.sql import functions as F

    row = (
        spark.range(1)
        .select(
            F.xxhash64(F.lit("spark")).alias("x"),
            F.hash(F.lit("spark")).alias("m"),
        )
        .collect()[0]
    )
    again = (
        spark.range(1)
        .select(
            F.xxhash64(F.lit("spark")).alias("x"),
            F.hash(F.lit("spark")).alias("m"),
        )
        .collect()[0]
    )
    assert (row["x"], row["m"]) == (again["x"], again["m"])
    assert row["x"] == -1960931134668248110
    assert row["m"] == 2101843105
