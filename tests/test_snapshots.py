"""dbt snapshot materialization (snapshots.py): SCD2 capture of source
state with the timestamp and check strategies, spec-change detection,
and crash-safe storage through the store's TableFormat."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbt_snowflake_feature_store_spark import ValidationError
from dbt_snowflake_feature_store_spark.snapshots import (
    read_snapshot,
    run_snapshots,
)

TS_SNAPSHOT = """\
{% snapshot customer_snapshot %}
{{
  config(
    strategy='timestamp',
    unique_key='cid',
    updated_at='updated_at'
  )
}}
SELECT cid, tier, updated_at FROM {{ ref('cust_src') }}
{% endsnapshot %}
"""

CHECK_SNAPSHOT = """\
{% snapshot tier_snapshot %}
{{
  config(
    strategy='check',
    unique_key='cid',
    check_cols=['tier']
  )
}}
SELECT cid, tier, region FROM {{ ref('cust_src') }}
{% endsnapshot %}
"""


def _write(tmp_path, content, fname="snap.sql"):
    d = tmp_path / "proj" / "snapshots"
    d.mkdir(parents=True, exist_ok=True)
    (d / fname).write_text(content)
    return str(tmp_path / "proj")


def _src(spark, tmp_path, rows, name="cust_src"):
    path = str(tmp_path / f"{name}.parquet")
    df = spark.createDataFrame(
        rows, "cid INT, tier STRING, region STRING, updated_at STRING"
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    df.write.mode("overwrite").parquet(path)
    return path


def test_timestamp_strategy_full_lifecycle(fs, spark, tmp_path):
    proj = _write(tmp_path, TS_SNAPSHOT)
    p = _src(
        spark,
        tmp_path,
        [
            (1, "gold", "us", "2024-01-01 00:00:00"),
            (2, "silver", "eu", "2024-01-01 00:00:00"),
        ],
    )
    fs.register_source("cust_src", p)
    rep = run_snapshots(fs, proj)
    assert rep["CUSTOMER_SNAPSHOT"] == {
        "strategy": "timestamp", "rows": 2, "open": 2,
    }

    # run 2: cid=1 changes (later updated_at), cid=3 appears, cid=2 gone
    _src(
        spark,
        tmp_path,
        [
            (1, "platinum", "us", "2024-02-01 00:00:00"),
            (3, "bronze", "ap", "2024-02-01 00:00:00"),
        ],
    )
    rep = run_snapshots(fs, proj)
    # 2 original + 1 new version of cid=1 + 1 new key = 4 rows, 3 open
    assert rep["CUSTOMER_SNAPSHOT"] == {
        "strategy": "timestamp", "rows": 4, "open": 3,
    }
    snap = read_snapshot(fs, "customer_snapshot")
    rows = {
        (r["cid"], r["tier"]): r for r in snap.collect()
    }
    closed = rows[(1, "gold")]
    assert closed["dbt_valid_to"] is not None
    assert str(closed["dbt_valid_to"]).startswith("2024-02-01")
    assert rows[(1, "platinum")]["dbt_valid_to"] is None
    # cid=2 deleted from source → stays open (dbt soft-delete default)
    assert rows[(2, "silver")]["dbt_valid_to"] is None
    assert rows[(3, "bronze")]["dbt_valid_to"] is None
    # scd ids unique
    assert snap.select("dbt_scd_id").distinct().count() == 4


def test_timestamp_rerun_is_idempotent(fs, spark, tmp_path):
    proj = _write(tmp_path, TS_SNAPSHOT)
    p = _src(spark, tmp_path, [(1, "gold", "us", "2024-01-01 00:00:00")])
    fs.register_source("cust_src", p)
    r1 = run_snapshots(fs, proj)
    r2 = run_snapshots(fs, proj)  # same data, same updated_at → no change
    assert r1 == r2 == {
        "CUSTOMER_SNAPSHOT": {"strategy": "timestamp", "rows": 1, "open": 1}
    }


def test_check_strategy_stamps_at(fs, spark, tmp_path):
    proj = _write(tmp_path, CHECK_SNAPSHOT)
    p = _src(spark, tmp_path, [(1, "gold", "us", "2024-01-01 00:00:00")])
    fs.register_source("cust_src", p)
    run_snapshots(fs, proj, at="2024-03-01 00:00:00")
    # tier changes → close + reopen; region-only change would NOT
    _src(spark, tmp_path, [(1, "silver", "eu", "2024-01-01 00:00:00")])
    rep = run_snapshots(fs, proj, at="2024-04-01 00:00:00")
    assert rep["TIER_SNAPSHOT"] == {"strategy": "check", "rows": 2, "open": 1}
    snap = read_snapshot(fs, "tier_snapshot")
    old = snap.filter(F.col("tier") == "gold").head()
    new = snap.filter(F.col("tier") == "silver").head()
    assert str(old["dbt_valid_to"]).startswith("2024-04-01")
    assert str(new["dbt_valid_from"]).startswith("2024-04-01")
    # region-only change is invisible to check_cols=['tier']
    _src(spark, tmp_path, [(1, "silver", "ap", "2024-01-01 00:00:00")])
    rep = run_snapshots(fs, proj, at="2024-05-01 00:00:00")
    assert rep["TIER_SNAPSHOT"] == {"strategy": "check", "rows": 2, "open": 1}


def test_duplicate_key_fails_loudly(fs, spark, tmp_path):
    proj = _write(tmp_path, TS_SNAPSHOT)
    p = _src(
        spark,
        tmp_path,
        [
            (1, "gold", "us", "2024-01-01 00:00:00"),
            (1, "silver", "eu", "2024-01-01 00:00:00"),
        ],
    )
    fs.register_source("cust_src", p)
    with pytest.raises(ValidationError, match="duplicate unique_key"):
        run_snapshots(fs, proj)


def test_spec_change_fails_loudly(fs, spark, tmp_path):
    proj = _write(tmp_path, TS_SNAPSHOT)
    p = _src(spark, tmp_path, [(1, "gold", "us", "2024-01-01 00:00:00")])
    fs.register_source("cust_src", p)
    run_snapshots(fs, proj)
    changed = TS_SNAPSHOT.replace("strategy='timestamp'", "strategy='check'")
    changed = changed.replace(
        "updated_at='updated_at'", "check_cols=['tier']"
    )
    _write(tmp_path, changed)
    with pytest.raises(ValidationError, match="spec changed"):
        run_snapshots(fs, proj)


def test_unknown_ref_fails_loudly(fs, spark, tmp_path):
    proj = _write(
        tmp_path, TS_SNAPSHOT.replace("cust_src", "nonexistent_model")
    )
    with pytest.raises(ValidationError, match="does not name a registered"):
        run_snapshots(fs, proj)


def test_bad_strategy_fails_loudly(fs, spark, tmp_path):
    proj = _write(
        tmp_path, TS_SNAPSHOT.replace("strategy='timestamp'", "strategy='merge'")
    )
    with pytest.raises(ValidationError, match="strategy must be"):
        run_snapshots(fs, proj)


HD_SNAPSHOT = """\
{% snapshot hd_snapshot %}
{{
  config(
    strategy='timestamp',
    unique_key='cid',
    updated_at='updated_at',
    invalidate_hard_deletes=True
  )
}}
SELECT cid, tier, updated_at FROM {{ ref('cust_src') }}
{% endsnapshot %}
"""

META_SNAPSHOT = """\
{% snapshot meta_snapshot %}
{{
  config(
    strategy='check',
    unique_key='cid',
    check_cols=['tier'],
    snapshot_meta_column_names={'dbt_valid_from': 'valid_from',
                                'dbt_valid_to': 'valid_to'}
  )
}}
SELECT cid, tier, region FROM {{ ref('cust_src') }}
{% endsnapshot %}
"""


def test_invalidate_hard_deletes_closes_vanished_keys(fs, spark, tmp_path):
    proj = _write(tmp_path, HD_SNAPSHOT)
    p = _src(
        spark,
        tmp_path,
        [
            (1, "gold", "us", "2024-01-01 00:00:00"),
            (2, "silver", "eu", "2024-01-01 00:00:00"),
        ],
    )
    fs.register_source("cust_src", p)
    run_snapshots(fs, proj, at="2024-01-15 00:00:00")
    # cid=2 vanishes → its open version must CLOSE at the run stamp
    _src(spark, tmp_path, [(1, "gold", "us", "2024-01-01 00:00:00")])
    rep = run_snapshots(fs, proj, at="2024-02-15 00:00:00")
    assert rep["HD_SNAPSHOT"] == {
        "strategy": "timestamp", "rows": 2, "open": 1,
    }
    snap = read_snapshot(fs, "hd_snapshot")
    gone = snap.filter(F.col("cid") == 2).head()
    assert str(gone["dbt_valid_to"]).startswith("2024-02-15")
    assert snap.filter(F.col("cid") == 1).head()["dbt_valid_to"] is None
    # the key REAPPEARING (later updated_at) opens a fresh version
    _src(spark, tmp_path, [
        (1, "gold", "us", "2024-01-01 00:00:00"),
        (2, "bronze", "eu", "2024-03-01 00:00:00"),
    ])
    rep = run_snapshots(fs, proj, at="2024-03-15 00:00:00")
    assert rep["HD_SNAPSHOT"] == {
        "strategy": "timestamp", "rows": 3, "open": 2,
    }


def test_meta_column_names_rename_round_trip(fs, spark, tmp_path):
    proj = _write(tmp_path, META_SNAPSHOT)
    p = _src(spark, tmp_path, [(1, "gold", "us", "2024-01-01 00:00:00")])
    fs.register_source("cust_src", p)
    run_snapshots(fs, proj, at="2024-03-01 00:00:00")
    snap = read_snapshot(fs, "meta_snapshot")
    assert "valid_from" in snap.columns and "valid_to" in snap.columns
    assert "dbt_valid_from" not in snap.columns
    assert "dbt_scd_id" in snap.columns  # unrenamed metas keep defaults
    # a change-run merges correctly through the rename boundary
    _src(spark, tmp_path, [(1, "silver", "us", "2024-01-01 00:00:00")])
    rep = run_snapshots(fs, proj, at="2024-04-01 00:00:00")
    assert rep["META_SNAPSHOT"] == {"strategy": "check", "rows": 2, "open": 1}
    snap = read_snapshot(fs, "meta_snapshot")
    old = snap.filter(F.col("tier") == "gold").head()
    assert str(old["valid_to"]).startswith("2024-04-01")


def test_unknown_config_key_fails_loudly(fs, spark, tmp_path):
    proj = _write(
        tmp_path,
        TS_SNAPSHOT.replace(
            "updated_at='updated_at'",
            "updated_at='updated_at',\n    target_schema='snapshots'",
        ),
    )
    with pytest.raises(ValidationError, match="unknown config key"):
        run_snapshots(fs, proj)


def test_meta_rename_collision_fails_loudly(fs, spark, tmp_path):
    bad = META_SNAPSHOT.replace("'valid_from'", "'tier'").replace(
        "'valid_to'", "'valid_to'"
    )
    proj = _write(tmp_path, bad)
    p = _src(spark, tmp_path, [(1, "gold", "us", "2024-01-01 00:00:00")])
    fs.register_source("cust_src", p)
    with pytest.raises(ValidationError, match="collide with select columns"):
        run_snapshots(fs, proj, at="2024-03-01 00:00:00")


def test_crash_safe_storage_recovers(fs, spark, tmp_path):
    """An interrupted swap (staged dir left behind) is repaired on the
    next run via storage.recover — same contract as managed FVs."""
    proj = _write(tmp_path, TS_SNAPSHOT)
    p = _src(spark, tmp_path, [(1, "gold", "us", "2024-01-01 00:00:00")])
    fs.register_source("cust_src", p)
    run_snapshots(fs, proj)
    snap_dir = os.path.join(fs.root, "_snapshots", "CUSTOMER_SNAPSHOT")
    assert os.path.isdir(snap_dir)
    # second run after a simulated partial state still reads cleanly
    _src(spark, tmp_path, [(1, "platinum", "us", "2024-02-01 00:00:00")])
    run_snapshots(fs, proj)
    assert read_snapshot(fs, "customer_snapshot").count() == 2


def test_hard_deletes_config_aliases(fs, spark, tmp_path):
    """dbt-1.9 `hard_deletes` successor config: 'invalidate' behaves as
    invalidate_hard_deletes=True, 'new_record' is refused loudly, a
    conflicting legacy+new combination is refused."""
    snap = HD_SNAPSHOT.replace(
        "invalidate_hard_deletes=True", "hard_deletes='invalidate'"
    ).replace("hd_snapshot", "hd2_snapshot")
    proj = _write(tmp_path, snap)
    p = _src(
        spark, tmp_path,
        [(1, "gold", "us", "2024-01-01 00:00:00"),
         (2, "silver", "eu", "2024-01-01 00:00:00")],
    )
    fs.register_source("cust_src", p)
    run_snapshots(fs, proj, at="2024-01-15 00:00:00")
    _src(spark, tmp_path, [(1, "gold", "us", "2024-01-01 00:00:00")])
    rep = run_snapshots(fs, proj, at="2024-02-15 00:00:00")
    assert rep["HD2_SNAPSHOT"]["open"] == 1  # cid=2 closed

    def _proj(sub, content):
        d = tmp_path / sub / "snapshots"
        d.mkdir(parents=True)
        (d / "snap.sql").write_text(content)
        return str(tmp_path / sub)

    bad = snap.replace("hard_deletes='invalidate'", "hard_deletes='new_record'")
    with pytest.raises(ValidationError, match="new_record"):
        run_snapshots(fs, _proj("p_bad", bad))

    conflict = HD_SNAPSHOT.replace(
        "invalidate_hard_deletes=True",
        "invalidate_hard_deletes=True,\n    hard_deletes='ignore'",
    )
    with pytest.raises(ValidationError, match="conflicts"):
        run_snapshots(fs, _proj("p_conf", conflict))


def test_snapshot_body_with_source_call(fs, spark, tmp_path):
    """ADVICE r10 (medium): a snapshot body using {{ source('s','t') }}
    raised TypeError (models._resolve_source takes a Model; snapshots
    passed one arg short). Pin the documented source() surface end to
    end, including the source_map indirection."""
    snap = """\
{% snapshot src_snapshot %}
{{
  config(
    strategy='timestamp',
    unique_key='cid',
    updated_at='updated_at'
  )
}}
SELECT cid, tier, updated_at FROM {{ source('crm', 'customers') }}
{% endsnapshot %}
"""
    proj = _write(tmp_path, snap)
    p = _src(spark, tmp_path, [(1, "gold", "us", "2024-01-01 00:00:00")])
    fs.register_source("cust_src", p)
    rep = run_snapshots(
        fs, proj, source_map={("crm", "customers"): "cust_src"}
    )
    assert rep["SRC_SNAPSHOT"]["rows"] == 1

    # an unregistered source still fails loudly WITH the snapshot name
    proj2 = _write(tmp_path, snap.replace("'crm'", "'nope'"), "snap2.sql")
    with pytest.raises(ValidationError, match="snapshot:src_snapshot"):
        run_snapshots(fs, proj2)
