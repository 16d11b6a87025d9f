"""Mergeable HLL sketches (functions/sketches.py): estimate accuracy,
merge algebra (union == sketch of union, idempotent, layout-invariant),
and the incremental per-day recipe matching the whole-table answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_snowflake_feature_store_spark.functions import sketches as SK
from dbt_snowflake_feature_store_spark.sources import read_table

SF = "/root/testdata/sf0.01"


def _events(spark):
    return read_table(spark, SF, "events")


def test_estimate_within_bound(spark):
    """Per-event-type distinct users: the lg_k=12 estimate must land
    within 5% of the exact count (standard error ≈ 0.8%)."""
    ev = _events(spark)
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in SK.hll_rollup(
            SK.hll_sketch_by_key(ev, ["event_type"], "user_id"),
            ["event_type"],
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) <= max(0.05 * exact[k], 2), (
            k, est[k], exact[k],
        )


def test_union_equals_sketch_of_union(spark):
    """Merging per-slice sketches gives the SAME estimate as sketching
    the union directly — the property that makes incremental
    maintenance correct (duplicates across slices collapse)."""
    ev = _events(spark)
    # slice by event_type, then roll ALL types up to one global sketch
    per_type = SK.hll_sketch_by_key(ev, ["event_type"], "user_id")
    rolled = SK.hll_rollup(
        per_type.withColumn("_g", F.lit(1)), ["_g"]
    ).head()["approx_distinct"]
    direct = SK.hll_rollup(
        SK.hll_sketch_by_key(ev.withColumn("_g", F.lit(1)), ["_g"], "user_id"),
        ["_g"],
    ).head()["approx_distinct"]
    assert rolled == direct  # identical, not merely close: same hash set


def test_layout_invariance(spark):
    """Same input set, different partitioning → identical estimate
    (sketches are order/layout-independent)."""
    ev = _events(spark)
    a = SK.hll_rollup(
        SK.hll_sketch_by_key(ev.repartition(1), ["event_type"], "user_id"),
        ["event_type"],
    )
    b = SK.hll_rollup(
        SK.hll_sketch_by_key(
            ev.repartition(16, "value"), ["event_type"], "user_id"
        ),
        ["event_type"],
    )
    got_a = {(r["event_type"], r["approx_distinct"]) for r in a.collect()}
    got_b = {(r["event_type"], r["approx_distinct"]) for r in b.collect()}
    assert got_a == got_b


def test_incremental_by_day_matches_whole_table(spark):
    """The distinct_over_time recipe: per-(type, day) sketches rolled up
    across all days == the one-shot whole-table estimate, and a
    date-range rollup only touches the sketch table."""
    ev = _events(spark)
    daily = SK.distinct_over_time(ev, "event_type", "user_id")
    from_daily = {
        (r["event_type"], r["approx_distinct"])
        for r in SK.hll_rollup(daily, ["event_type"]).collect()
    }
    one_shot = {
        (r["event_type"], r["approx_distinct"])
        for r in SK.hll_rollup(
            SK.hll_sketch_by_key(ev, ["event_type"], "user_id"),
            ["event_type"],
        ).collect()
    }
    assert from_daily == one_shot
    # range query: first 3 distinct days only — estimates bounded by the
    # full-range estimate per type
    days = sorted(r["_fs_day"] for r in daily.select("_fs_day").distinct().collect())[:3]
    ranged = {
        r["event_type"]: r["approx_distinct"]
        for r in SK.hll_rollup(
            daily.filter(F.col("_fs_day").isin(days)), ["event_type"]
        ).collect()
    }
    full = dict(one_shot)
    for k, v in ranged.items():
        assert v <= full[k]


def test_sketch_column_is_compact(spark):
    """The materialized state is kilobytes per key — the reason this
    scales where COUNT(DISTINCT) recompute doesn't."""
    ev = _events(spark)
    row = SK.hll_sketch_by_key(ev, ["event_type"], "user_id").head()
    assert len(bytes(row["hll_sketch"])) < 16384
