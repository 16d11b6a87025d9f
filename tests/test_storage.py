"""Storage-layer tests: snapshot-swap MERGE emulation, the crash-recovery
protocol at every interruption point, and the Delta fallback."""

from __future__ import annotations

import os
import shutil

import pytest

from dbt_snowflake_feature_store_spark.storage import (
    ParquetSnapshotFormat,
    get_format,
)


@pytest.fixture()
def fmt():
    return ParquetSnapshotFormat()


def _write(spark, path, rows):
    spark.createDataFrame(rows, "id long, v string").write.mode(
        "overwrite"
    ).parquet(path)


class TestOverwritePartitions:
    def _part_write(self, spark, fmt, path, rows):
        fmt.overwrite_partitions(
            spark,
            spark.createDataFrame(rows, "id long, v string, dt string"),
            path,
            "dt",
        )

    def test_replaces_only_matching_partitions(self, spark, tmp_path, fmt):
        path = str(tmp_path / "t")
        self._part_write(
            spark, fmt, path, [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")]
        )
        # re-run d1 with different contents: d1 replaced, d2 untouched
        self._part_write(spark, fmt, path, [(9, "z", "d1")])
        rows = sorted(
            (r.id, r.v, r.dt) for r in fmt.read(spark, path).collect()
        )
        assert rows == [(3, "c", "d2"), (9, "z", "d1")]

    def test_session_conf_restored(self, spark, tmp_path, fmt):
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
        self._part_write(spark, fmt, str(tmp_path / "t"), [(1, "a", "d1")])
        assert (
            spark.conf.get("spark.sql.sources.partitionOverwriteMode")
            == "static"
        )


class TestMerge:
    def test_merge_upserts_and_inserts(self, spark, tmp_path, fmt):
        path = str(tmp_path / "t")
        _write(spark, path, [(1, "a"), (2, "b")])
        n = fmt.merge(
            spark,
            path,
            spark.createDataFrame([(2, "b2"), (3, "c")], "id long, v string"),
            ["id"],
        )
        assert n == 3
        rows = {r["id"]: r["v"] for r in fmt.read(spark, path).collect()}
        assert rows == {1: "a", 2: "b2", 3: "c"}
        # no stray snapshot/old dirs
        assert [d for d in os.listdir(tmp_path) if "__" in d] == []

    def test_merge_creates_missing_table(self, spark, tmp_path, fmt):
        path = str(tmp_path / "new")
        n = fmt.merge(
            spark, path, spark.createDataFrame([(1, "a")], "id long, v string"), ["id"]
        )
        assert n == 1


class TestRecovery:
    """Simulate a crash at each point of the swap protocol and assert
    recover() restores a readable, correct table."""

    def _committed_snapshot(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _write(spark, path, [(1, "old")])
        snap = f"{path}__snapshot_dead"
        _write(spark, snap, [(1, "new")])
        open(os.path.join(snap, "_FS_COMMIT"), "w").write("dead")
        return path, snap

    def test_uncommitted_snapshot_dropped(self, spark, tmp_path, fmt):
        path = str(tmp_path / "t")
        _write(spark, path, [(1, "old")])
        snap = f"{path}__snapshot_dead"
        _write(spark, snap, [(1, "half")])  # no commit marker: aborted write
        fmt.recover(path)
        assert not os.path.isdir(snap)
        assert [r["v"] for r in fmt.read(spark, path).collect()] == ["old"]

    def test_committed_snapshot_target_present_dropped(self, spark, tmp_path, fmt):
        # crash after marker but before the first rename: target intact,
        # the merge never reported success → snapshot is garbage
        path, snap = self._committed_snapshot(spark, tmp_path)
        fmt.recover(path)
        assert not os.path.isdir(snap)
        assert [r["v"] for r in fmt.read(spark, path).collect()] == ["old"]

    def test_crash_between_renames_rolls_forward(self, spark, tmp_path, fmt):
        # crash between rename(target, old) and rename(snap, target):
        # no target dir; the committed snapshot must be installed
        path, snap = self._committed_snapshot(spark, tmp_path)
        os.rename(path, f"{path}__old_dead")
        fmt.recover(path)
        assert os.path.isdir(path)
        assert [r["v"] for r in fmt.read(spark, path).collect()] == ["new"]
        assert [d for d in os.listdir(tmp_path) if "__" in d] == []

    def test_crash_before_snapshot_complete_rolls_back(self, spark, tmp_path, fmt):
        # pathological: target renamed away but snapshot has NO marker
        # (should not happen in protocol order, but recover must still
        # restore a readable table from the old dir)
        path = str(tmp_path / "t")
        _write(spark, f"{path}__old_dead", [(1, "old")])
        snap = f"{path}__snapshot_dead"
        _write(spark, snap, [(1, "half")])
        shutil.rmtree(snap)  # simulate partial write
        os.makedirs(snap)
        fmt.recover(path)
        assert [r["v"] for r in fmt.read(spark, path).collect()] == ["old"]

    def test_orphaned_old_dir_removed(self, spark, tmp_path, fmt):
        # crash after the swap completed but before cleanup
        path = str(tmp_path / "t")
        _write(spark, path, [(1, "new")])
        _write(spark, f"{path}__old_dead", [(1, "old")])
        fmt.recover(path)
        assert [d for d in os.listdir(tmp_path) if "__" in d] == []
        assert [r["v"] for r in fmt.read(spark, path).collect()] == ["new"]


class TestFormatResolution:
    def test_delta_falls_back_to_parquet_here(self):
        # this container has no delta-spark: requesting delta must give a
        # working parquet backend, not an ImportError
        f = get_format("delta")
        assert f.name in ("delta", "parquet")
        try:
            import delta  # noqa: F401

            assert f.name == "delta"
        except ImportError:
            assert f.name == "parquet"

    def test_unknown_format_rejected(self):
        with pytest.raises(ValueError, match="Unknown table format"):
            get_format("iceberg")


class TestStoreIntegration:
    def test_store_uses_storage_for_managed_reads(self, fs, spark, tables):
        from dbt_snowflake_feature_store_spark import (
            Entity,
            FeatureView,
            RefreshSpec,
        )

        fs.register_entity(Entity("customer", ["c_custkey"]))
        tables["customer"].createOrReplaceTempView("st_customer")
        fs.register_feature_view(
            FeatureView(
                "st_fv", ["customer"],
                sql="SELECT c_custkey, c_acctbal AS f_bal FROM st_customer",
                refresh=RefreshSpec("1 minute", "FULL", "ON_CREATE"),
            ),
            version="1",
        )
        path = fs._fv_data_path("ST_FV", "1")
        # sabotage: simulate an interrupted compaction swap
        os.rename(path, f"{path}__old_dead")
        snap = f"{path}__snapshot_dead"
        shutil.copytree(f"{path}__old_dead", snap)
        open(os.path.join(snap, "_FS_COMMIT"), "w").write("dead")
        # the read path must self-heal and serve the committed snapshot
        assert fs.read_feature_view("ST_FV$1").count() == tables["customer"].count()


class TestTimeTravel:
    def _write(self, spark, fmt, path, vals):
        df = spark.createDataFrame([(i,) for i in vals], "v long")
        fmt.replace(spark, path, df)

    def test_history_retained_and_readable(self, spark, tmp_path):
        from dbt_snowflake_feature_store_spark.storage import (
            ParquetSnapshotFormat,
        )

        fmt = ParquetSnapshotFormat(history=2)
        path = str(tmp_path / "tbl")
        self._write(spark, fmt, path, [1])          # live v-implicit
        self._write(spark, fmt, path, [1, 2])       # v1 = [1] retained
        self._write(spark, fmt, path, [1, 2, 3])    # v2 = [1,2] retained
        assert fmt.snapshots(path) == [1, 2]
        assert sorted(
            r.v for r in fmt.read_version(spark, path, 1).collect()
        ) == [1]
        assert sorted(
            r.v for r in fmt.read_version(spark, path, 2).collect()
        ) == [1, 2]
        assert sorted(r.v for r in fmt.read(spark, path).collect()) == [1, 2, 3]

    def test_history_pruned_to_bound(self, spark, tmp_path):
        from dbt_snowflake_feature_store_spark.storage import (
            ParquetSnapshotFormat,
        )

        fmt = ParquetSnapshotFormat(history=2)
        path = str(tmp_path / "tbl")
        for n in range(1, 6):  # 5 replaces -> 4 candidate history entries
            self._write(spark, fmt, path, list(range(n)))
        assert fmt.snapshots(path) == [3, 4]  # oldest pruned, seq monotonic
        import pytest as _pytest

        with _pytest.raises(FileNotFoundError):
            fmt.read_version(spark, path, 1)

    def test_zero_history_unchanged(self, spark, tmp_path):
        import os

        from dbt_snowflake_feature_store_spark.storage import (
            ParquetSnapshotFormat,
        )

        fmt = ParquetSnapshotFormat()
        path = str(tmp_path / "tbl")
        self._write(spark, fmt, path, [1])
        self._write(spark, fmt, path, [2])
        assert fmt.snapshots(path) == []
        assert not os.path.isdir(f"{path}__history")


class TestFeatureViewTimeTravel:
    def test_managed_fv_snapshot_reads(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from dbt_snowflake_feature_store_spark import FeatureStore
        from dbt_snowflake_feature_store_spark.objects import (
            Entity,
            FeatureView,
            RefreshSpec,
        )

        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0)], "k long, v double"
        ).write.parquet(src)

        fs = FeatureStore(
            spark, str(tmp_path / "fs_root"), name="TT_FS", snapshot_history=2
        )
        fs.register_source("TT_SRC", src)
        fs.register_entity(Entity("k_ent", ["k"]))
        fs.register_feature_view(
            FeatureView(
                "tt_fv", ["k_ent"],
                sql="SELECT k, v FROM TT_SRC",
                refresh=RefreshSpec("1 minute", "FULL", "ON_CREATE"),
            ),
            version="1",
        )
        assert fs.list_feature_view_snapshots("tt_fv", "1") == []

        # source grows; two FULL refreshes -> two retained past states
        spark.createDataFrame([(3, 30.0)], "k long, v double").write.mode(
            "append"
        ).parquet(src)
        fs.refresh("tt_fv", "1", mode="FULL")
        spark.createDataFrame([(4, 40.0)], "k long, v double").write.mode(
            "append"
        ).parquet(src)
        fs.refresh("tt_fv", "1", mode="FULL")

        snaps = fs.list_feature_view_snapshots("tt_fv", "1")
        assert len(snaps) == 2
        v_first = fs.read_feature_view_snapshot("tt_fv", "1", snaps[0])
        assert sorted(r.k for r in v_first.collect()) == [1, 2]
        v_mid = fs.read_feature_view_snapshot("tt_fv", "1", snaps[1])
        assert sorted(r.k for r in v_mid.collect()) == [1, 2, 3]
        live = fs.read_feature_view("TT_FV$1")
        assert sorted(r.k for r in live.collect()) == [1, 2, 3, 4]
