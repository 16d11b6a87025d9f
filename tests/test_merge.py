"""MERGE-upsert emulation + SCD2 tests."""

from __future__ import annotations

import datetime as dt
import os

from dbt_snowflake_feature_store_spark.functions.merge import merge_upsert, scd2_apply


def test_merge_upsert_lifecycle(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t0 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, name string, v double"
    )
    assert merge_upsert(spark, path, t0, ["id"]) == 2

    # update one key, insert one key
    upd = spark.createDataFrame(
        [(2, "b2", 25.0), (3, "c", 30.0)], "id long, name string, v double"
    )
    assert merge_upsert(spark, path, upd, ["id"]) == 3
    rows = {r["id"]: (r["name"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert rows == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0)}

    # no stray snapshot/old dirs left behind
    leftovers = [d for d in os.listdir(tmp_path) if "__" in d]
    assert leftovers == []


def test_scd2_apply(spark):
    base = dt.datetime(2024, 1, 1)
    cur = spark.createDataFrame(
        [
            (1, "gold", base, None),
            (2, "silver", base, None),
        ],
        "id long, tier string, valid_from timestamp, valid_to timestamp",
    )
    upd = spark.createDataFrame(
        [(1, "platinum", base + dt.timedelta(days=30))],
        "id long, tier string, changed_at timestamp",
    )
    out = scd2_apply(cur, upd, ["id"], "changed_at")
    rows = sorted(
        (r["id"], r["tier"], r["valid_to"] is None) for r in out.collect()
    )
    # id 1: old row closed + new open row; id 2 untouched open
    assert rows == [(1, "gold", False), (1, "platinum", True), (2, "silver", True)]
    closed = [r for r in out.collect() if r["id"] == 1 and r["tier"] == "gold"][0]
    assert closed["valid_to"] == base + dt.timedelta(days=30)


def test_scd2_apply_multiple_updates_per_key_chain(spark):
    """A batch with several updates for one key must produce a CHAINED
    history: exactly one open version (the latest), each intermediate
    version closed at the next one's timestamp, and the prior open row
    closed at the FIRST update's timestamp."""
    base = dt.datetime(2024, 1, 1)
    cur = spark.createDataFrame(
        [(1, "bronze", base, None)],
        "id long, tier string, valid_from timestamp, valid_to timestamp",
    )
    upd = spark.createDataFrame(
        [
            (1, "silver", base + dt.timedelta(days=10)),
            (1, "gold", base + dt.timedelta(days=20)),
            (1, "platinum", base + dt.timedelta(days=30)),
        ],
        "id long, tier string, changed_at timestamp",
    )
    out = scd2_apply(cur, upd, ["id"], "changed_at").collect()
    by_tier = {r["tier"]: r for r in out}
    assert len(out) == 4
    open_rows = [r for r in out if r["valid_to"] is None]
    assert [r["tier"] for r in open_rows] == ["platinum"]
    assert by_tier["bronze"]["valid_to"] == base + dt.timedelta(days=10)
    assert by_tier["silver"]["valid_from"] == base + dt.timedelta(days=10)
    assert by_tier["silver"]["valid_to"] == base + dt.timedelta(days=20)
    assert by_tier["gold"]["valid_to"] == base + dt.timedelta(days=30)
    # validity intervals tile the timeline with no gaps or overlaps
    versions = sorted(
        (r["valid_from"], r["valid_to"]) for r in out
    )
    for (_, prev_to), (next_from, _) in zip(versions, versions[1:]):
        assert prev_to == next_from
