"""MERGE-upsert emulation + SCD2 tests."""

from __future__ import annotations

import datetime as dt
import os

from hypothesis import given, settings
from hypothesis import strategies as st

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


@settings(max_examples=15, deadline=None)
@given(
    upds=st.dictionaries(
        keys=st.integers(min_value=0, max_value=5),
        values=st.lists(
            st.integers(min_value=1, max_value=60), unique=True,
            min_size=0, max_size=4,
        ),
        min_size=1, max_size=6,
    )
)
def test_scd2_apply_chain_invariants_property(spark, upds):
    """For ANY batch shape (several keys, 0..4 distinct-ts updates each):
    exactly one open version per key, row count = 1 + n_updates, and the
    validity intervals tile each key's timeline with no gaps."""
    base = dt.datetime(2024, 1, 1)
    cur = spark.createDataFrame(
        [(k, f"v0_{k}", base, None) for k in upds],
        "id long, val string, valid_from timestamp, valid_to timestamp",
    )
    upd_rows = [
        (k, f"v{i}_{k}", base + dt.timedelta(days=off))
        for k, offs in upds.items()
        for i, off in enumerate(sorted(offs), start=1)
    ]
    if not upd_rows:
        upd_rows = [(99, "x", base)]  # scd2_apply needs a non-empty frame
        upds = {**upds, 99: [0]}
        cur = cur.unionByName(
            spark.createDataFrame(
                [(99, "v0_99", base, None)],
                "id long, val string, valid_from timestamp, valid_to timestamp",
            )
        )
    upd = spark.createDataFrame(
        upd_rows, "id long, val string, changed_at timestamp"
    )
    out = scd2_apply(cur, upd, ["id"], "changed_at").collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r["id"], []).append(r)
    for k, offs in upds.items():
        rows = by_key[k]
        assert len(rows) == 1 + len(offs)
        opens = [r for r in rows if r["valid_to"] is None]
        assert len(opens) == 1
        ivals = sorted(
            ((r["valid_from"], r["valid_to"]) for r in rows),
            key=lambda p: (p[0], p[1] or dt.datetime.max),
        )
        for (_, prev_to), (next_from, _) in zip(ivals, ivals[1:]):
            assert prev_to == next_from
        assert ivals[-1][1] is None  # the chain's last version is the open one
