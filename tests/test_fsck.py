"""fsck — store-wide registry/disk integrity audit."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dbt_snowflake_feature_store_spark import Entity, FeatureView, RefreshSpec
from dbt_snowflake_feature_store_spark.sources import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def store_with_objects(fs, spark):
    read_table(spark, SF, "events").createOrReplaceTempView("fsck_events")
    fs.register_entity(Entity("user", ["user_id"]))
    fs.register_feature_view(
        FeatureView(
            "managed_ok",
            ["user"],
            sql="SELECT user_id, ts, value AS f_v FROM fsck_events",
            timestamp_col="ts",
            refresh=RefreshSpec("1 hour", "FULL", "ON_CREATE"),
        ),
        version="1.0",
    )
    fs.register_feature_view(
        FeatureView(
            "static_ok",
            ["user"],
            sql="SELECT user_id, COUNT(*) AS f_n FROM fsck_events GROUP BY user_id",
        ),
        version="1.0",
    )
    spine = spark.sql("SELECT DISTINCT user_id FROM fsck_events LIMIT 5")
    fs.generate_dataset(
        "fsck_ds", spine, [fs.get_feature_view("managed_ok", "1.0")],
        spine_timestamp_col=None,
    )
    return fs


def test_clean_store_has_no_findings(store_with_objects):
    assert store_with_objects.fsck() == []


def test_missing_data_and_dataset(store_with_objects):
    fs = store_with_objects
    shutil.rmtree(fs._fv_data_path("managed_ok", "1.0"))
    shutil.rmtree(os.path.join(fs.root, "datasets", "FSCK_DS"))
    issues = {(f["kind"], f["issue"]) for f in fs.fsck()}
    assert ("feature_view", "missing_data") in issues
    assert ("dataset", "missing_data") in issues


def test_orphan_detection_and_repair(store_with_objects, spark):
    fs = store_with_objects
    stray = os.path.join(fs.root, "feature_views", "GHOST__V9_9")
    os.makedirs(stray)
    found = [f for f in fs.fsck() if f["issue"] == "orphan_data"]
    assert found and found[0]["object"] == "GHOST__V9_9"
    assert os.path.isdir(stray)  # read-only by default
    fs.fsck(repair_orphans=True)
    assert not os.path.isdir(stray)
    assert fs.fsck() == []


def test_schema_drift_detected(store_with_objects, spark):
    fs = store_with_objects
    path = fs._fv_data_path("managed_ok", "1.0")
    shutil.rmtree(path)
    spark.range(3).selectExpr(
        "id AS user_id", "CAST(id AS double) AS f_other"
    ).write.parquet(path)
    drift = [f for f in fs.fsck() if f["issue"] == "schema_drift"]
    assert drift
    assert "f_v" in drift[0]["missing"]
    assert "f_other" in drift[0]["unexpected"]


def test_history_and_snapshot_dirs_are_not_orphans(spark, tmp_path):
    """Time-travel/__history and swap sibling dirs of a REGISTERED FV
    must never be reported (or deleted) as orphans."""
    from dbt_snowflake_feature_store_spark import FeatureStore

    fs = FeatureStore(
        spark, str(tmp_path / "fs_hist"), name="HIST_FS", snapshot_history=1
    )
    read_table(spark, SF, "events").createOrReplaceTempView("fsck_h_events")
    fs.register_entity(Entity("huser", ["user_id"]))
    fs.register_feature_view(
        FeatureView(
            "hist_fv",
            ["huser"],
            sql="SELECT user_id, ts, value AS f_v FROM fsck_h_events",
            timestamp_col="ts",
            refresh=RefreshSpec("1 hour", "FULL", "ON_CREATE"),
        ),
        version="1.0",
    )
    fs.refresh("hist_fv", "1.0")  # second materialization -> history kept
    hist = fs._fv_data_path("hist_fv", "1.0") + "__history"
    assert os.path.isdir(hist), "fixture must produce a history dir"
    assert fs.fsck() == []
    fs.fsck(repair_orphans=True)
    assert os.path.isdir(hist)  # repair must not touch it
    assert fs.list_feature_view_snapshots("hist_fv", "1.0")


def test_dataset_orphan_detection_and_repair(store_with_objects):
    """A datasets/<name>/<version> directory with no registry row is an
    orphan: reported read-only by default, deleted only under
    repair_orphans — while the REGISTERED dataset sibling is untouched
    (VERDICT r6 item 8; cleanup_old_metadata.py:28-105 analog)."""
    fs = store_with_objects
    stray = os.path.join(fs.root, "datasets", "GHOST_DS", "3")
    os.makedirs(stray)
    found = [
        f for f in fs.fsck()
        if f["kind"] == "dataset" and f["issue"] == "orphan_data"
    ]
    assert [f["object"] for f in found] == ["GHOST_DS.v3"]
    assert os.path.isdir(stray)  # read-only by default

    fs.fsck(repair_orphans=True)
    assert not os.path.isdir(stray)
    # the empty GHOST_DS name dir is swept too; the registered dataset
    # survives repair
    assert not os.path.isdir(os.path.join(fs.root, "datasets", "GHOST_DS"))
    assert os.path.isdir(os.path.join(fs.root, "datasets", "FSCK_DS", "1"))
    assert fs.fsck() == []


def test_dataset_vanished_then_orphan_version(store_with_objects):
    """Mixed fixture: the registered dataset's dir vanishes AND an
    unregistered version appears under the same name — fsck reports
    both, with the orphan repair leaving the missing_data finding."""
    fs = store_with_objects
    ds_dir = os.path.join(fs.root, "datasets", "FSCK_DS")
    shutil.rmtree(os.path.join(ds_dir, "1"))
    os.makedirs(os.path.join(ds_dir, "9"))
    issues = {(f["issue"], f["object"]) for f in fs.fsck()}
    assert ("missing_data", "FSCK_DS.v1") in issues
    assert ("orphan_data", "FSCK_DS.v9") in issues
    fs.fsck(repair_orphans=True)
    assert not os.path.isdir(os.path.join(ds_dir, "9"))
    remaining = {(f["issue"], f["object"]) for f in fs.fsck()}
    assert remaining == {("missing_data", "FSCK_DS.v1")}


def test_online_and_snapshot_surfaces_audited(store_with_objects, spark):
    """r10 surfaces: a registered online export whose dir vanishes is
    missing_data; stray dirs under _online / _snapshots with no
    registry row are repairable orphans; a clean store stays clean."""
    fs = store_with_objects
    path = fs.export_online_store("managed_ok", "1.0")
    assert fs.fsck() == []  # export registered + on disk → clean
    shutil.rmtree(path)
    issues = {(f["issue"], f["kind"]) for f in fs.fsck()}
    assert ("missing_data", "online_store") in issues
    # restore, then plant orphans on both surfaces
    fs.export_online_store("managed_ok", "1.0")
    stray_on = os.path.join(fs.root, "_online", "GHOST$9")
    stray_sn = os.path.join(fs.root, "_snapshots", "GHOST_SNAP")
    os.makedirs(stray_on)
    os.makedirs(stray_sn)
    issues = {(f["issue"], f["object"]) for f in fs.fsck()}
    assert ("orphan_data", "GHOST$9") in issues
    assert ("orphan_data", "GHOST_SNAP") in issues
    fs.fsck(repair_orphans=True)
    assert not os.path.isdir(stray_on) and not os.path.isdir(stray_sn)
    assert fs.fsck() == []
