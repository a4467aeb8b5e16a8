"""Distributed connected components over a pair list.

Large-star / small-star style label propagation: iterate
"label = min(label of self, labels of neighbors)" until fixpoint.
Each iteration is two shuffles (edge join + min-agg); converges in
O(log n) iterations for near-dup graphs, which are tiny diameter.
Iteration count is bounded and checked via a cheap count() on the
changed-set only (no data-scale collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, col_a: str = "id_a", col_b: str = "id_b", max_iter: int = 20
) -> DataFrame:
    """Input: undirected edges (col_a, col_b). Output: (id, component)
    where component = min id reachable."""
    edges = (
        pairs.select(F.col(col_a).alias("src"), F.col(col_b).alias("dst"))
        .union(pairs.select(F.col(col_b).alias("src"), F.col(col_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iter):
        # candidate label for each node: min over neighbors' labels
        neighbor_labels = (
            edges.join(labels.withColumnRenamed("id", "dst"), on="dst")
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("src", "id")
        )
        new_labels = (
            labels.join(neighbor_labels, on="id", how="left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True)
        if changed == 0:
            break
    return labels
