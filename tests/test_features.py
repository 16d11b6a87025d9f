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
