"""Connected components (functions/graph.py) — min-label propagation."""

from __future__ import annotations

import pytest

from dbt_snowflake_feature_store_spark.functions.graph import (
    connected_components,
)


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    rows = connected_components(edges, "id_a", "id_b").collect()
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
