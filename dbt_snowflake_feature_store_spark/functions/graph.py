"""Distributed graph primitives for dedup clustering.

The LLM-pipeline use: near-dup PAIRS (MinHash/LSH candidates) →
CLUSTERS (connected components) → one kept representative per cluster.
The reference has no analog (its engine is a SQL warehouse); this is
the piece a 100 TB dedup actually needs after the pair stage.

Two algorithms, identical fixed point (component = min node id):

``propagation`` (default)
    Iterative min-label propagation: every node starts labeled with its
    own id; each round takes the min of its label and its neighbors'
    labels. Rounds needed = graph diameter — near-dup clusters are
    shallow, so a handful of rounds. One shuffle per round; the
    convergence check is folded into the label pass as a ``_chg`` flag
    aggregated over the checkpointed result (ONE real job per round,
    not a second join-shaped job). The unique fixed point makes the
    result deterministic regardless of schedule — which is what makes
    an oracle comparison (DuckDB recursive CTE) possible.

``star``
    Alternating large-star/small-star edge contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): each
    round rewires edges toward per-neighborhood minima, converging in
    O(log n) rounds on adversarial chains where propagation needs
    O(diameter). Two shuffles per round (one per half-step), so for
    shallow dedup graphs propagation is cheaper; ``star`` is the escape
    hatch for deep/chain-shaped graphs. Property-tested equivalent to
    propagation on random graphs (tests/test_graph.py).

Scale notes: every round is a bounded number of shuffles; lineage is
cut with ``localCheckpoint`` so plans don't grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "propagation",
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with its
    component's minimum node id. Returns (node, label).

    Raises if the chosen algorithm hasn't converged after ``max_iter``
    rounds (would mean a silently wrong fixed point)."""
    if algorithm == "propagation":
        return _cc_propagation(edges, src, dst, max_iter)
    if algorithm == "star":
        return _cc_star(edges, src, dst, max_iter)
    raise ValueError(f"connected_components: unknown algorithm {algorithm!r}")


def _cc_propagation(
    edges: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
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
        # the improved label AND a did-it-change flag in the same pass:
        # the convergence check is then a cheap max() scan over the
        # checkpointed partitions, not a second join-shaped job.
        new = F.least(
            F.col("label"), F.coalesce(F.col("_nbr_min"), F.col("label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                new.alias("label"),
                (new < F.col("label")).cast("int").alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.agg(F.max("_chg").alias("c")).first()["c"]
        labels = new_labels.drop("_chg")
        if not changed:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def _sig(e: DataFrame) -> tuple[int, int]:
    """Cheap set signature for convergence: (count, sum of bounded edge
    hashes). pmod bounds each term < 2³¹ so the BIGINT sum cannot
    overflow (ANSI mode throws on overflow) below ~2³² edges."""
    row = e.agg(
        F.count("*").alias("n"),
        F.sum(F.pmod(F.xxhash64("a", "b"), F.lit(2147483647))).alias("h"),
    ).first()
    return (row["n"], row["h"] or 0)


def _cc_star(edges: DataFrame, src: str, dst: str, max_iter: int) -> DataFrame:
    # canonical undirected edge set: (a < b), self-loops dropped
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    orig_nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sig = _sig(e)
    if sig[0] == 0:
        return orig_nodes.withColumn("label", F.col("node"))
    for _ in range(max_iter):
        # large-star: every node u attaches its LARGER neighbors to
        # m(u) = min(Γ(u) ∪ {u}); since m ≤ u < v the emitted edge
        # (m, v) is already canonical and never a self-loop.
        nbrs = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = nbrs.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .distinct()
        )
        # small-star on the large-star output: orient each edge from its
        # larger endpoint u to v < u, attach v AND u to m(u) = min of
        # u's smaller neighborhood (all < u, so least(u, ·) is moot).
        oriented = large.select(F.col("b").alias("u"), F.col("a").alias("v"))
        mins2 = oriented.groupBy("u").agg(F.min("v").alias("m"))
        joined = oriented.join(mins2, "u")
        small = (
            joined.filter(F.col("v") != F.col("m"))
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .union(joined.select(F.col("m").alias("a"), F.col("u").alias("b")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_sig = _sig(small)
        e = small
        if new_sig == sig:
            # fixed point: e is a star forest rooted at component minima
            labels = e.select(
                F.col("b").alias("node"), F.col("a").alias("label")
            ).union(
                e.select(F.col("a").alias("node"), F.col("a").alias("label"))
            ).distinct()
            return (
                orig_nodes.join(labels, "node", "left")
                .select(
                    "node",
                    F.coalesce(F.col("label"), F.col("node")).alias("label"),
                )
            )
        sig = new_sig
    raise RuntimeError(
        f"connected_components(star) did not converge in {max_iter} rounds"
    )
