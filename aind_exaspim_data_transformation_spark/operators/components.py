"""Connected components over candidate-pair edges (dedup clustering).

After LSH produces near-duplicate PAIRS, dedup needs CLUSTERS (keep one
representative per component). This is iterative min-label propagation —
each iteration one join + one aggregation; converges in O(diameter)
rounds, which for near-dup graphs is tiny (duplicate groups are dense).

Scale notes: this is the standard Pregel-style large-graph CC formulated
in DataFrame ops — state is (vertex, label), the join is key-partitioned,
and the driver only checks a convergence count per round. For graphs with
huge diameter, switch to the alternating small/large-star algorithm; for
dedup clusters the plain propagation is optimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """(vertex, component) with component = min vertex id reachable.

    ``edges`` is an undirected edge list; isolated vertices simply don't
    appear (callers union them back if needed).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    converged = False
    for _ in range(max_iterations):
        # candidate label per vertex: min over own label and neighbors'
        neighbor_labels = (
            sym.join(
                labels.withColumnRenamed("vertex", "b2"),
                sym.b == F.col("b2"),
            )
            .select(F.col("a").alias("vertex"), "component")
        )
        # checkpoint BEFORE the convergence count so the count and the
        # next iteration share one materialization (counting the
        # un-checkpointed frame would compute the iteration twice)
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("vertex")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(
                labels.alias("o"),
                F.col("n.vertex") == F.col("o.vertex"),
            )
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (graph diameter too large) — raise max_iterations"
        )
    return labels
