"""Connected-components operator: known graphs + convergence."""

from aind_exaspim_data_transformation_spark.operators.components import (
    connected_components,
)


def test_two_components_and_chain(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple iterations) + pair 10-11
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_self_loop_and_duplicate_edges(spark):
    edges = spark.createDataFrame(
        [(5, 5), (6, 7), (7, 6), (6, 7)], "src long, dst long"
    )
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {5: 5, 6: 6, 7: 6}
