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
