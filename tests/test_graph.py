"""Connected components (functions/graph.py) — min-label propagation and
the large-star/small-star contraction, which must agree everywhere."""

from __future__ import annotations

import random

import pytest

from dbt_snowflake_feature_store_spark.functions.graph import (
    connected_components,
)


def _cc(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    rows = connected_components(edges, "id_a", "id_b", **kw).collect()
    return {r.node: r.label for r in rows}


def test_chain_converges_to_min(spark):
    # a 6-node path: propagation needs several rounds (diameter 5)
    labels = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    assert labels == {i: 1 for i in range(1, 7)}


def test_disjoint_components(spark):
    labels = _cc(spark, [(10, 11), (11, 12), (20, 21), (30, 31), (31, 30)])
    assert labels == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_nonconvergence_raises(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(1, 9)],
                                  "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, "id_a", "id_b", max_iter=2)


def test_star_matches_propagation_on_shapes(spark):
    """Both algorithms share one fixed point: component = min id. Chain,
    disjoint stars, a cycle, duplicate/reversed edges, self-loop."""
    cases = [
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)],
        [(10, 11), (11, 12), (20, 21), (30, 31), (31, 30)],
        [(1, 2), (2, 3), (3, 1)],  # cycle
        [(5, 5), (5, 6)],  # self-loop
        [(7, 3), (3, 7), (3, 9)],  # reversed duplicates
    ]
    for pairs in cases:
        prop = _cc(spark, pairs, algorithm="propagation")
        star = _cc(spark, pairs, algorithm="star")
        assert star == prop, pairs


def test_star_matches_propagation_random(spark):
    """Property: on random graphs the two algorithms agree exactly."""
    rng = random.Random(42)
    for _ in range(3):
        n = 40
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(35)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        prop = _cc(spark, pairs, algorithm="propagation", max_iter=50)
        star = _cc(spark, pairs, algorithm="star", max_iter=50)
        assert star == prop


def test_star_fewer_rounds_on_chain(spark, monkeypatch):
    """The contraction's point: a 33-node chain converges within a round
    budget that propagation (rounds = diameter) blows."""
    pairs = [(i, i + 1) for i in range(1, 33)]
    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, "id_a", "id_b", max_iter=8)
    labels = {
        r.node: r.label
        for r in connected_components(
            edges, "id_a", "id_b", max_iter=8, algorithm="star"
        ).collect()
    }
    assert labels == {i: 1 for i in range(1, 34)}


def test_unknown_algorithm_raises(spark):
    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="unknown algorithm"):
        connected_components(edges, algorithm="nope")
