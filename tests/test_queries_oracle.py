"""Run every declared query key against the DuckDB oracle at sf0.001 —
the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from tests.oracle_utils import compare_query


def _pairs():
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    return qs, oracles


QUERIES, ORACLES = _pairs()


@pytest.mark.parametrize("key", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, sf_dir, key):
    assert key in QUERIES, f"oracle declared for missing query {key}"
    df = QUERIES[key](spark, sf_dir)
    compare_query(spark, sf_dir, df, ORACLES[key])


def test_every_query_runs(spark, sf_dir):
    """Keys without an oracle (approx ops) still must run and be stable."""
    for key, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        n1 = df.count()
        assert n1 >= 0, key
        if key not in ORACLES:
            n2 = fn(spark, sf_dir).count()
            assert n1 == n2, f"{key} row count not stable: {n1} != {n2}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
