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


NEWREC_SNAPSHOT = """\
{% snapshot nr_snapshot %}
{{
  config(
    strategy='timestamp',
    unique_key='cid',
    updated_at='updated_at',
    hard_deletes='new_record'
  )
}}
SELECT cid, tier, updated_at FROM {{ ref('cust_src') }}
{% endsnapshot %}
"""


def test_new_record_timestamp_lifecycle(fs, spark, tmp_path):
    """dbt-1.9 hard_deletes='new_record' across 3 runs: insert, delete
    (close + open 'True' marker), steady state (marker stays open, does
    NOT re-close), resurrect (marker closes, fresh 'False' row opens)."""
    from dbt_snowflake_feature_store_spark.snapshots import DELETED_COL

    proj = _write(tmp_path, NEWREC_SNAPSHOT)
    _src(spark, tmp_path, [
        (1, "gold", "us", "2024-01-01 00:00:00"),
        (2, "silver", "eu", "2024-01-01 00:00:00"),
    ])
    fs.register_source("cust_src", str(tmp_path / "cust_src.parquet"))
    rep = run_snapshots(fs, proj, at="2024-01-02 00:00:00")
    assert rep["NR_SNAPSHOT"] == {
        "strategy": "timestamp", "rows": 2, "open": 2,
    }

    # run 2: cid=2 vanishes -> its row closes AND an open marker appears
    _src(spark, tmp_path, [(1, "gold", "us", "2024-01-01 00:00:00")])
    rep = run_snapshots(fs, proj, at="2024-02-01 00:00:00")
    hist = read_snapshot(fs, "nr_snapshot")
    rows = hist.orderBy("cid", "dbt_valid_from").collect()
    assert rep["NR_SNAPSHOT"]["rows"] == 3
    assert rep["NR_SNAPSHOT"]["open"] == 2  # cid=1 + the marker
    marker = [r for r in rows if r[DELETED_COL] == "True"]
    assert len(marker) == 1
    assert marker[0]["cid"] == 2 and marker[0]["dbt_valid_to"] is None
    closed2 = [
        r for r in rows
        if r["cid"] == 2 and r[DELETED_COL] == "False"
    ]
    assert closed2[0]["dbt_valid_to"] is not None

    # run 3 (steady state): key still absent -> marker must NOT re-close
    rep = run_snapshots(fs, proj, at="2024-03-01 00:00:00")
    assert rep["NR_SNAPSHOT"] == {
        "strategy": "timestamp", "rows": 3, "open": 2,
    }

    # run 4 (resurrect): cid=2 returns with an updated_at OLDER than the
    # delete stamp — the marker still closes and a fresh row opens
    _src(spark, tmp_path, [
        (1, "gold", "us", "2024-01-01 00:00:00"),
        (2, "plat", "eu", "2024-02-15 00:00:00"),
    ])
    rep = run_snapshots(fs, proj, at="2024-04-01 00:00:00")
    hist = read_snapshot(fs, "nr_snapshot")
    assert rep["NR_SNAPSHOT"]["rows"] == 4
    assert rep["NR_SNAPSHOT"]["open"] == 2
    open2 = [
        r for r in hist.filter(F.col("dbt_valid_to").isNull()).collect()
        if r["cid"] == 2
    ]
    assert len(open2) == 1
    assert open2[0]["tier"] == "plat" and open2[0][DELETED_COL] == "False"
    closed_marker = [
        r for r in hist.collect()
        if r[DELETED_COL] == "True" and r["dbt_valid_to"] is not None
    ]
    assert len(closed_marker) == 1


def test_new_record_check_resurrect_same_values(fs, spark, tmp_path):
    """Check strategy + new_record: a key returning with IDENTICAL
    checked values must still close the marker and re-open (the check
    hash matches, the marker flag forces the change)."""
    from dbt_snowflake_feature_store_spark.snapshots import DELETED_COL

    snap = NEWREC_SNAPSHOT.replace("nr_snapshot", "nrc_snapshot").replace(
        "strategy='timestamp',\n    unique_key='cid',\n    updated_at='updated_at',",
        "strategy='check',\n    unique_key='cid',\n    check_cols=['tier'],",
    )
    assert "check_cols" in snap  # the replace actually fired
    proj = _write(tmp_path, snap)
    _src(spark, tmp_path, [(1, "gold", "us", "2024-01-01 00:00:00")])
    fs.register_source("cust_src", str(tmp_path / "cust_src.parquet"))
    run_snapshots(fs, proj, at="2024-01-02 00:00:00")
    _src(spark, tmp_path, [])
    # empty source: write an empty frame with the same schema
    spark.createDataFrame(
        [], "cid INT, tier STRING, region STRING, updated_at STRING"
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "cust_src.parquet"))
    rep = run_snapshots(fs, proj, at="2024-02-01 00:00:00")
    assert rep["NRC_SNAPSHOT"]["rows"] == 2  # closed + marker
    _src(spark, tmp_path, [(1, "gold", "us", "2024-01-01 00:00:00")])
    rep = run_snapshots(fs, proj, at="2024-03-01 00:00:00")
    hist = read_snapshot(fs, "nrc_snapshot").collect()
    assert rep["NRC_SNAPSHOT"]["rows"] == 3
    assert rep["NRC_SNAPSHOT"]["open"] == 1
    opens = [r for r in hist if r["dbt_valid_to"] is None]
    assert opens[0][DELETED_COL] == "False" and opens[0]["tier"] == "gold"


def test_new_record_meta_rename_interaction(fs, spark, tmp_path):
    """snapshot_meta_column_names may rename dbt_is_deleted too; the
    merge still runs on the default name and the storage table carries
    the custom one."""
    snap = NEWREC_SNAPSHOT.replace("nr_snapshot", "nrm_snapshot").replace(
        "hard_deletes='new_record'",
        "hard_deletes='new_record',\n    "
        "snapshot_meta_column_names={'dbt_is_deleted': 'is_gone'}",
    )
    proj = _write(tmp_path, snap)
    _src(spark, tmp_path, [(1, "gold", "us", "2024-01-01 00:00:00")])
    fs.register_source("cust_src", str(tmp_path / "cust_src.parquet"))
    run_snapshots(fs, proj, at="2024-01-02 00:00:00")
    spark.createDataFrame(
        [], "cid INT, tier STRING, region STRING, updated_at STRING"
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "cust_src.parquet"))
    run_snapshots(fs, proj, at="2024-02-01 00:00:00")
    hist = read_snapshot(fs, "nrm_snapshot")
    assert "is_gone" in hist.columns
    assert "dbt_is_deleted" not in hist.columns
    assert hist.filter(F.col("is_gone") == "True").count() == 1


def test_new_record_migration_story(fs, spark, tmp_path):
    """Adopting new_record on an EXISTING snapshot: the spec-change
    error names the migration helper; after migrate_snapshot_hard_deletes
    the run proceeds and markers appear on the next delete."""
    from dbt_snowflake_feature_store_spark.snapshots import (
        migrate_snapshot_hard_deletes,
    )

    base = NEWREC_SNAPSHOT.replace("nr_snapshot", "mig_snapshot").replace(
        ",\n    hard_deletes='new_record'", ""
    )
    assert "hard_deletes" not in base
    proj = _write(tmp_path, base)
    _src(spark, tmp_path, [(1, "gold", "us", "2024-01-01 00:00:00")])
    fs.register_source("cust_src", str(tmp_path / "cust_src.parquet"))
    run_snapshots(fs, proj, at="2024-01-02 00:00:00")

    upgraded = NEWREC_SNAPSHOT.replace("nr_snapshot", "mig_snapshot")
    proj = _write(tmp_path, upgraded)
    with pytest.raises(ValidationError, match="migrate_snapshot_hard_deletes"):
        run_snapshots(fs, proj, at="2024-02-01 00:00:00")

    migrate_snapshot_hard_deletes(fs, "mig_snapshot")
    hist = read_snapshot(fs, "mig_snapshot")
    assert hist.filter(F.col("dbt_is_deleted") == "False").count() == 1

    spark.createDataFrame(
        [], "cid INT, tier STRING, region STRING, updated_at STRING"
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "cust_src.parquet"))
    rep = run_snapshots(fs, proj, at="2024-03-01 00:00:00")
    assert rep["MIG_SNAPSHOT"]["rows"] == 2  # closed original + open marker
    assert rep["MIG_SNAPSHOT"]["open"] == 1
    hist = read_snapshot(fs, "mig_snapshot")
    assert hist.filter(F.col("dbt_is_deleted") == "True").count() == 1


def test_new_record_resurrect_same_updated_at_unique_scd_ids(
    fs, spark, tmp_path
):
    """Review r11: a key restored with the SAME updated_at it carried
    before deletion (restore-from-backup) must not re-mint the old
    dbt_scd_id — every row keeps a unique SCD2 surrogate."""
    proj = _write(tmp_path, NEWREC_SNAPSHOT.replace("nr_snapshot", "rs_snap"))
    _src(spark, tmp_path, [(1, "gold", "us", "2024-01-01 00:00:00")])
    fs.register_source("cust_src", str(tmp_path / "cust_src.parquet"))
    run_snapshots(fs, proj, at="2024-01-02 00:00:00")
    spark.createDataFrame(
        [], "cid INT, tier STRING, region STRING, updated_at STRING"
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "cust_src.parquet"))
    run_snapshots(fs, proj, at="2024-02-01 00:00:00")  # delete + marker
    _src(spark, tmp_path, [(1, "gold", "us", "2024-01-01 00:00:00")])
    rep = run_snapshots(fs, proj, at="2024-03-01 00:00:00")  # resurrect
    hist = read_snapshot(fs, "rs_snap").collect()
    assert rep["RS_SNAP"]["rows"] == 3  # closed original, closed marker, new open
    ids = [r["dbt_scd_id"] for r in hist]
    assert len(ids) == len(set(ids)), ids  # every surrogate unique
    opens = [r for r in hist if r["dbt_valid_to"] is None]
    assert len(opens) == 1 and opens[0]["dbt_is_deleted"] == "False"
