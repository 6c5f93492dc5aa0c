"""Round-14 de-degeneracy pins (round-13 verdict Next #2).

Four queries returned 0 rows at a gate or sweep SF — both engines
agreed (hash of empty = pass), but an empty result proves far less
than a populated one, and a sweep timing a query that emits nothing is
weak scale evidence. These tests pin every reworked query to emit >= 1
row at the smallest (most degeneracy-prone) SF; the sf0.01 and sf10
counts are asserted in the query docstrings and checked by the round
sweeps (PARITY/SCALE artifacts).
"""

import pytest

from aind_exaspim_data_transformation_spark.queries import QUERIES

from conftest import SF_SMALL

REWORKED = [
    # (query, row count at sf0.001 measured when the fix landed)
    ("q11_important_stock", 12),
    ("q22_sales_opportunity", 1),
    ("q_nation_pair_volume", 12),
    ("q_except_parts_by_qty", 51),
]


@pytest.mark.parametrize("name,expected", REWORKED)
def test_reworked_query_is_nonempty(spark, name, expected):
    n = QUERIES[name](spark, SF_SMALL).count()
    assert n == expected, f"{name}: {n} rows at {SF_SMALL}"
    assert n > 0
