"""Connected components over an edge DataFrame.

Canonicalization stage (north_star): cluster entity/mention nodes
connected by similarity or shared-alias edges, assigning every node
the minimum node id of its component.

Algorithm: alternating *large-star / small-star* (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14) — each
iteration is a pair of joins + aggregations, converging in
O(log^2 n) rounds on any graph and ~2-4 rounds on the short, fat
components typical of alias graphs. All DataFrame ops:

  large-star: attach each neighbor > v to min(neighborhood ∪ {v})
  small-star: attach each neighbor <= v to that min

Iterative lineage is cut with localCheckpoint each round (the classic
iterative-join plan-blowup fix); convergence is detected by comparing
the count of changed labels (an aggregate, not a collect of data).

Skew: the hub node of a big component concentrates its edges; AQE
skew-join splitting handles the join; the groupBy uses partial
aggregation so hot keys combine map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """edges(src, dst) -> (node, component) with component = min node
    id reachable. Undirected; self-loops and duplicates tolerated."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    # symmetrize once; labels start as each node's own id
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # neighborhood min of current labels (one join + one agg)
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("a", "node")
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
        # propagate: a node's label may itself have been relabelled —
        # pointer-jump by joining labels on labels (min-label hashing)
        jumped = (
            labels.alias("l1")
            .join(
                labels.select(
                    F.col("node").alias("component"),
                    F.col("component").alias("parent"),
                ),
                "component",
                "left",
            )
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("parent", "component")).alias(
                    "component"
                ),
            )
            .localCheckpoint(eager=True)
        )
        labels = jumped
    return labels
