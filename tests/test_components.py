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


def test_distributed_path_matches_union_find(spark):
    # random-ish graph: chains, a star, an isolated pair; both execution
    # strategies must produce the identical (vertex, component) map
    raw = (
        [(i, i + 1) for i in range(1, 20)]  # long chain (pointer jumping)
        + [(100, x) for x in range(101, 110)]  # star
        + [(200, 201)]
        + [(7, 3)]  # chord inside the chain
    )
    edges = spark.createDataFrame(raw, "src long, dst long")
    fast = {
        r["vertex"]: r["component"]
        for r in connected_components(edges).collect()
    }
    dist = {
        r["vertex"]: r["component"]
        for r in connected_components(edges, collect_threshold=0).collect()
    }
    assert fast == dist
    assert dist[19] == 1 and dist[109] == 100 and dist[201] == 200
