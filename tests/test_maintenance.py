"""Metadata maintenance & introspection: legacy-format migration (the
reference's cleanup-script behavior), refresh history, registry-as-
DataFrame, composite-key PIT joins."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dbt_snowflake_feature_store_spark import Entity, FeatureView, RefreshSpec, asof_join

FV_SQL = "SELECT c_custkey, c_acctbal AS f_bal FROM customer"


class TestMigration:
    def test_migrate_legacy_string_entities(self, fs, tables):
        """String-form entities are OLD/BAD (cleanup_old_metadata.py:70-85);
        migrate_metadata upgrades them to {"name", "joinKeys"} objects."""
        fs.register_entity(Entity("customer", ["c_custkey"]))
        fs.register_feature_view(
            FeatureView("cf", ["customer"], sql=FV_SQL), version="1.0"
        )
        # corrupt the registry into the legacy string form
        doc = fs.registry.get("feature_views", "CF__v1_0")
        doc["metadata"]["entities"] = ["CUSTOMER"]
        fs.registry.put("feature_views", "CF__v1_0", doc)

        report = fs.migrate_metadata(dry_run=True)
        assert report == [
            {
                "feature_view": "CF$1.0",
                "status": "OLD_FORMAT",
                "string_entities": ["CUSTOMER"],
                "action": "would upgrade",
            }
        ]
        # dry run didn't change anything
        assert fs.registry.get("feature_views", "CF__v1_0")["metadata"][
            "entities"
        ] == ["CUSTOMER"]

        fs.migrate_metadata(dry_run=False)
        fixed = fs.registry.get("feature_views", "CF__v1_0")["metadata"]["entities"]
        assert fixed == [{"name": "CUSTOMER", "joinKeys": ["C_CUSTKEY"]}]
        # idempotent: second pass reports nothing
        assert fs.migrate_metadata(dry_run=False) == []


class TestIntrospection:
    def test_metadata_df(self, fs, tables):
        fs.register_entity(Entity("customer", ["c_custkey"]))
        fs.register_feature_view(
            FeatureView("cf", ["customer"], sql=FV_SQL), version="1.0"
        )
        md = fs.metadata_df()
        kinds = {r["KIND"] for r in md.collect()}
        assert {"entities", "feature_views"} <= kinds
        # metadata JSON is parseable with from_json (q_scalar_json pattern)
        parsed = md.filter("KIND = 'feature_views'").select(
            F.get_json_object("METADATA", "$.metadata.timestamp_col").alias("ts")
        ).head()
        assert parsed["ts"] == "NULL"

    def test_refresh_history(self, fs, tables):
        fs.register_entity(Entity("customer", ["c_custkey"]))
        fs.register_feature_view(
            FeatureView(
                "mf", ["customer"], sql=FV_SQL,
                refresh=RefreshSpec("1 hour", "FULL", "ON_CREATE"),
            ),
            version="1.0",
        )
        fs.refresh("mf", "1.0")
        hist = fs.refresh_history("mf", "1.0").collect()
        assert len(hist) == 2  # ON_CREATE + explicit refresh
        assert all(r["MODE"] == "FULL" for r in hist)
        assert all(r["ROWS"] == tables["customer"].count() for r in hist)


class TestCompaction:
    def test_compact_reduces_files(self, fs, spark, tables):
        fs.register_entity(Entity("user", ["user_id"]))
        tables["events"].createOrReplaceTempView("cmp_events")
        fs.register_feature_view(
            FeatureView(
                "cmp_fv", ["user"],
                sql="SELECT user_id, ts, value FROM cmp_events",
                timestamp_col="ts",
                refresh=RefreshSpec("1 hour", "FULL", "ON_CREATE"),
            ),
            version="1",
        )
        path = fs._fv_data_path("CMP_FV", "1")
        before = len(spark.read.parquet(path).inputFiles())
        n_rows_before = fs.read_feature_view("CMP_FV$1").count()
        after = fs.compact("cmp_fv", "1")
        assert after <= before
        # one file per day partition
        days = fs.read_feature_view("CMP_FV$1").select(
            F.to_date("ts")
        ).distinct().count()
        assert after == days
        assert fs.read_feature_view("CMP_FV$1").count() == n_rows_before

    def test_compact_max_records_per_file_bounds_hot_days(
        self, fs, spark, tables
    ):
        """The r8 scale guard: with max_records_per_file set, one task
        per day directory still writes MULTIPLE right-sized files when
        a day exceeds the cap — compaction can never emit one monster
        file for a skewed day."""
        fs.register_entity(Entity("user", ["user_id"]))
        tables["events"].createOrReplaceTempView("cmp_events3")
        fs.register_feature_view(
            FeatureView(
                "cmp_cap", ["user"],
                sql="SELECT user_id, ts, value FROM cmp_events3",
                timestamp_col="ts",
                refresh=RefreshSpec("1 hour", "FULL", "ON_CREATE"),
            ),
            version="1",
        )
        n_rows = fs.read_feature_view("CMP_CAP$1").count()
        after = fs.compact("cmp_cap", "1", max_records_per_file=5)
        days = fs.read_feature_view("CMP_CAP$1").select(
            F.to_date("ts")
        ).distinct().count()
        # more files than days (hot days split), but bounded by rows/cap
        assert after > days
        assert after <= n_rows // 5 + 2 * days
        # every file respects the cap, values intact
        path = fs._fv_data_path("CMP_CAP", "1")
        for f in spark.read.parquet(path).inputFiles():
            assert spark.read.parquet(f.replace("file:", "")).count() <= 5
        assert fs.read_feature_view("CMP_CAP$1").count() == n_rows

    def test_compact_static_fv_rejected(self, fs, tables):
        fs.register_entity(Entity("user", ["user_id"]))
        tables["events"].createOrReplaceTempView("cmp_events2")
        fs.register_feature_view(
            FeatureView(
                "cmp_static", ["user"],
                sql="SELECT user_id, value FROM cmp_events2",
            ),
            version="1",
        )
        import pytest as _pt

        from dbt_snowflake_feature_store_spark import ValidationError

        with _pt.raises(ValidationError, match="static"):
            fs.compact("cmp_static", "1")


class TestLifecycleExtras:
    def test_delete_dataset(self, fs, spark, tables):
        import os

        fs.register_entity(Entity("customer", ["c_custkey"]))
        fs.register_feature_view(
            FeatureView("cf2", ["customer"], sql=FV_SQL), version="1"
        )
        spine = tables["customer"].select("c_custkey").limit(5)
        ds = fs.generate_dataset(
            "doomed", spine, [fs.get_feature_view("cf2", "1")], version="1"
        )
        assert os.path.isdir(ds.path)
        fs.delete_dataset("doomed", "1")
        assert not os.path.isdir(ds.path)
        from dbt_snowflake_feature_store_spark import DatasetNotFoundError

        import pytest as _pt

        with _pt.raises(DatasetNotFoundError):
            fs.get_dataset("doomed", "1")

    def test_due_for_refresh_honors_target_lag(self, fs, tables):
        fs.register_entity(Entity("customer", ["c_custkey"]))
        fs.register_feature_view(
            FeatureView(
                "lagged", ["customer"], sql=FV_SQL,
                refresh=RefreshSpec("1 hour", "FULL", "ON_SCHEDULE"),
            ),
            version="1",
        )
        assert fs.due_for_refresh("lagged", "1")  # never refreshed
        fs.refresh("lagged", "1")
        assert not fs.due_for_refresh("lagged", "1")  # fresh within 1 hour
        # age the last refresh beyond the lag
        doc = fs.registry.get("feature_views", "LAGGED__v1")
        import datetime as dt

        doc["refresh_history"][-1]["completed_at"] = (
            dt.datetime.now(dt.timezone.utc) - dt.timedelta(hours=2)
        ).isoformat()
        fs.registry.put("feature_views", "LAGGED__v1", doc)
        assert fs.due_for_refresh("lagged", "1")

    def test_suspend_resume_lifecycle(self, fs, tables):
        """snowflake-ml suspend/resume surface: SUSPENDED blocks refresh
        and due_for_refresh; data stays readable; resume reactivates.
        Status survives a registry round-trip."""
        from dbt_snowflake_feature_store_spark import ValidationError

        fs.register_entity(Entity("customer", ["c_custkey"]))
        fs.register_feature_view(
            FeatureView(
                "pausable", ["customer"], sql=FV_SQL,
                refresh=RefreshSpec("1 hour", "FULL"),
            ),
            version="1",
        )
        fv = fs.suspend_feature_view("pausable", "1")
        assert fv.status == "SUSPENDED"
        assert fs.get_feature_view("pausable", "1").status == "SUSPENDED"
        assert not fs.due_for_refresh("pausable", "1")
        with pytest.raises(ValidationError, match="SUSPENDED"):
            fs.refresh("pausable", "1")
        # materialized data still readable while suspended
        assert fs.read_feature_view("PAUSABLE$1").count() > 0

        fv = fs.resume_feature_view("pausable", "1")
        assert fv.status == "ACTIVE"
        assert fs.refresh("pausable", "1") == "FULL"

        # static FVs reject suspend
        fs.register_feature_view(
            FeatureView("static_fv", ["customer"], sql=FV_SQL), version="1"
        )
        with pytest.raises(ValidationError, match="static"):
            fs.suspend_feature_view("static_fv", "1")

    def test_parse_freq_validation(self):
        import pytest as _pt

        from dbt_snowflake_feature_store_spark import ValidationError
        from dbt_snowflake_feature_store_spark.store import parse_freq

        assert parse_freq("5 minutes").total_seconds() == 300
        assert parse_freq("1 day").total_seconds() == 86400
        with _pt.raises(ValidationError):
            parse_freq("whenever")

    def test_multi_entity_feature_view(self, fs, spark, tables):
        """FV carrying TWO entities (multi-entity config, reference
        README.md:229): join keys concatenate across entities."""
        tables["events"].createOrReplaceTempView("me_events")
        fs.register_entity(Entity("user", ["user_id"]))
        fs.register_entity(Entity("etype", ["event_type"]))
        fs.register_feature_view(
            FeatureView(
                "user_type_stats",
                ["user", "etype"],
                sql="""SELECT user_id, event_type, COUNT(*) AS f_n
                       FROM me_events GROUP BY user_id, event_type""",
            ),
            version="1",
        )
        got = fs.get_feature_view("user_type_stats", "1")
        assert got.entity_docs == [
            {"name": "USER", "joinKeys": ["USER_ID"]},
            {"name": "ETYPE", "joinKeys": ["EVENT_TYPE"]},
        ]
        spine = spark.sql(
            "SELECT DISTINCT user_id, event_type FROM me_events LIMIT 20"
        )
        out = fs.dataset_df(spine, [got])
        rows = out.collect()
        assert len(rows) == spine.count()
        assert all(r["f_n"] >= 1 for r in rows)


class TestCompositeKeys:
    def test_asof_join_composite_keys(self, spark):
        """PIT with a two-column entity key (e.g. (tenant, user))."""
        base = dt.datetime(2024, 1, 1)

        def ts(h):
            return base + dt.timedelta(hours=h)

        feats = spark.createDataFrame(
            [
                (1, 10, ts(0), 100.0),
                (1, 10, ts(5), 105.0),
                (2, 10, ts(0), 200.0),  # same user_id, other tenant
                (1, 20, ts(3), 120.0),
            ],
            "tenant long, uid long, fts timestamp, v double",
        )
        spine = spark.createDataFrame(
            [(1, 10, ts(4)), (2, 10, ts(4)), (1, 20, ts(1)), (3, 30, ts(9))],
            "tenant long, uid long, ts timestamp",
        )
        out = {
            (r["tenant"], r["uid"]): r["v"]
            for r in asof_join(
                spine, feats, on=["tenant", "uid"], spine_ts="ts",
                feature_ts="fts", feature_cols=["v"],
            ).collect()
        }
        assert out == {(1, 10): 100.0, (2, 10): 200.0, (1, 20): None, (3, 30): None}

    def test_generate_dataset_composite_entity(self, fs, spark):
        base = dt.datetime(2024, 1, 1)
        feats = spark.createDataFrame(
            [(1, 10, base, 5.0), (1, 10, base + dt.timedelta(days=2), 7.0)],
            "tenant long, uid long, updated_at timestamp, f_v double",
        )
        feats.createOrReplaceTempView("comp_feats")
        fs.register_entity(Entity("tenant_user", ["tenant", "uid"]))
        fs.register_feature_view(
            FeatureView(
                "comp_fv", ["tenant_user"],
                sql="SELECT tenant, uid, updated_at, f_v FROM comp_feats",
                timestamp_col="updated_at",
            ),
            version="1",
        )
        spine = spark.createDataFrame(
            [(1, 10, base + dt.timedelta(days=1), 1)],
            "tenant long, uid long, event_time timestamp, label int",
        )
        df = fs.dataset_df(
            spine,
            [fs.get_feature_view("comp_fv", "1")],
            spine_timestamp_col="event_time",
        )
        rows = df.collect()
        assert len(rows) == 1 and rows[0]["f_v"] == 5.0


class TestBackfill:
    def test_chunked_backfill_idempotent(self, spark, tmp_path):
        import datetime as dt

        from dbt_snowflake_feature_store_spark import FeatureStore
        from dbt_snowflake_feature_store_spark.objects import (
            Entity,
            FeatureView,
            RefreshSpec,
        )

        # 6 days of events, two rows/day
        base = dt.datetime(2024, 3, 1)
        rows = [
            (i, i % 3, base + dt.timedelta(days=i // 2, hours=i % 2), float(i))
            for i in range(12)
        ]
        src = str(tmp_path / "ev")
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        ).write.parquet(src)

        fs = FeatureStore(spark, str(tmp_path / "root"), name="BF_FS")
        fs.register_source("BF_EV", src)
        fs.register_entity(Entity("user", ["user_id"]))
        fs.register_feature_view(
            FeatureView(
                "bf_fv", ["user"],
                sql="SELECT user_id, ts, value FROM BF_EV",
                timestamp_col="ts",
                refresh=RefreshSpec("1 minute", "FULL", "ON_SCHEDULE"),
            ),
            version="1",
        )

        # backfill the first 4 days in 2-day chunks
        done = fs.backfill("bf_fv", "1", "2024-03-01", "2024-03-05", step_days=2)
        assert done == ["2024-03-01", "2024-03-03"]
        got = fs.read_feature_view("BF_FV$1")
        assert got.count() == 8  # 4 days x 2 rows

        # re-running a chunk is idempotent (dynamic partition overwrite)
        fs.backfill("bf_fv", "1", "2024-03-01", "2024-03-03", step_days=2)
        assert fs.read_feature_view("BF_FV$1").count() == 8

        # extend the range; only the new days add rows
        fs.backfill("bf_fv", "1", "2024-03-05", "2024-03-07", step_days=2)
        assert fs.read_feature_view("BF_FV$1").count() == 12

    def test_backfill_requires_timestamp(self, spark, tmp_path):
        import pytest

        from dbt_snowflake_feature_store_spark import FeatureStore
        from dbt_snowflake_feature_store_spark.errors import ValidationError
        from dbt_snowflake_feature_store_spark.objects import (
            Entity,
            FeatureView,
            RefreshSpec,
        )

        src = str(tmp_path / "s")
        spark.createDataFrame([(1, 1.0)], "user_id long, v double").write.parquet(src)
        fs = FeatureStore(spark, str(tmp_path / "root"), name="BF2_FS")
        fs.register_source("BF2_S", src)
        fs.register_entity(Entity("user", ["user_id"]))
        fs.register_feature_view(
            FeatureView(
                "bf2_fv", ["user"],
                sql="SELECT user_id, v FROM BF2_S",
                refresh=RefreshSpec("1 minute", "FULL", "ON_SCHEDULE"),
            ),
            version="1",
        )
        with pytest.raises(ValidationError, match="timestamp_col"):
            fs.backfill("bf2_fv", "1", "2024-01-01", "2024-01-02")

    def test_backfill_strict_mode(self, spark, tmp_path):
        """strict=True enforces the chunk-boundary contract: a DAY-KEYED
        aggregate passes the inspector (its groups live inside one
        day-aligned chunk), a GLOBAL / entity-only-keyed aggregate
        raises ValidationError instead of committing partial groups."""
        import datetime as dt

        import pytest

        from dbt_snowflake_feature_store_spark import FeatureStore
        from dbt_snowflake_feature_store_spark.errors import ValidationError
        from dbt_snowflake_feature_store_spark.objects import (
            Entity,
            FeatureView,
            RefreshSpec,
        )

        base = dt.datetime(2024, 3, 1)
        rows = [
            (i, i % 3, base + dt.timedelta(days=i // 2, hours=i % 2), float(i))
            for i in range(12)
        ]
        src = str(tmp_path / "ev")
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        ).write.parquet(src)

        fs = FeatureStore(spark, str(tmp_path / "root"), name="BFS_FS")
        fs.register_source("BFS_EV", src)
        fs.register_entity(Entity("user", ["user_id"]))
        mk = lambda nm, sql: fs.register_feature_view(
            FeatureView(
                nm, ["user"], sql=sql, timestamp_col="ts",
                refresh=RefreshSpec("1 minute", "FULL", "ON_SCHEDULE"),
            ),
            version="1",
        )

        # day-keyed agg: groups are within one day -> passes strict
        mk("day_agg", "SELECT user_id, date_trunc('day', ts) AS ts, "
                      "SUM(value) AS f_v FROM BFS_EV "
                      "GROUP BY user_id, date_trunc('day', ts)")
        done = fs.backfill(
            "day_agg", "1", "2024-03-01", "2024-03-03", strict=True
        )
        assert done == ["2024-03-01", "2024-03-02"]
        # strict result == the day-keyed recompute (2 days x 3 users, but
        # only users present that day)
        got = fs.read_feature_view("DAY_AGG$1")
        assert got.count() == got.select("user_id", "ts").distinct().count()

        # entity-only-keyed agg (no ts in grouping): raises under strict
        mk("user_agg", "SELECT user_id, MAX(ts) AS ts, SUM(value) AS f_v "
                       "FROM BFS_EV GROUP BY user_id")
        with pytest.raises(ValidationError, match="chunk boundaries"):
            fs.backfill(
                "user_agg", "1", "2024-03-01", "2024-03-03", strict=True
            )
        # ...but only warns (legacy behavior) without strict
        fs.backfill("user_agg", "1", "2024-03-01", "2024-03-03")

        # per-user window function: partition spec has no ts -> raises
        mk("user_win", "SELECT user_id, ts, SUM(value) OVER "
                       "(PARTITION BY user_id) AS f_tot FROM BFS_EV")
        with pytest.raises(ValidationError, match="chunk boundaries"):
            fs.backfill(
                "user_win", "1", "2024-03-01", "2024-03-03", strict=True
            )

        # plain row-level plan: nothing groups, strict passes
        mk("plain", "SELECT user_id, ts, value AS f_v FROM BFS_EV")
        assert fs.backfill(
            "plain", "1", "2024-03-01", "2024-03-03", strict=True
        ) == ["2024-03-01", "2024-03-02"]

        # a SAME-NAMED timestamp from a joined dimension in the grouping
        # must NOT satisfy the check: the chunk filter on the EVENT ts
        # cannot push through a grouping keyed on the dimension's ts
        # (the name-matching inspector this probe replaced passed it)
        dim = str(tmp_path / "dim")
        spark.createDataFrame(
            [(u, dt.datetime(2024, 3, 1)) for u in range(3)],
            "user_id long, ts timestamp",
        ).write.parquet(dim)
        fs.register_source("BFS_DIM", dim)
        mk("dim_agg", "SELECT e.user_id, MAX(e.ts) AS ts, d.ts AS dim_ts, "
                      "SUM(e.value) AS f_v "
                      "FROM BFS_EV e JOIN BFS_DIM d ON e.user_id = d.user_id "
                      "GROUP BY e.user_id, d.ts")
        with pytest.raises(ValidationError, match="chunk boundaries"):
            fs.backfill(
                "dim_agg", "1", "2024-03-01", "2024-03-03", strict=True
            )


class TestChangeFeed:
    def test_feature_view_changes_cdc(self, spark, tmp_path):
        """feature_view_changes labels the row diff between a retained
        snapshot and the current table with the Delta-CDF vocabulary:
        unchanged rows absent, new keys insert, vanished keys delete,
        changed keys update_preimage/update_postimage."""
        from dbt_snowflake_feature_store_spark import FeatureStore
        from dbt_snowflake_feature_store_spark.objects import (
            Entity,
            FeatureView,
            RefreshSpec,
        )

        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "user_id long, v double"
        ).write.mode("overwrite").parquet(src)
        fs = FeatureStore(
            spark, str(tmp_path / "root"), name="CDC_FS", snapshot_history=2
        )
        fs.register_source("CDC_SRC", src)
        fs.register_entity(Entity("user", ["user_id"]))
        fs.register_feature_view(
            FeatureView(
                "cdc_fv", ["user"],
                sql="SELECT user_id, v AS f_v FROM CDC_SRC",
                refresh=RefreshSpec("1 minute", "FULL", "ON_CREATE"),
            ),
            version="1",
        )
        # new state: user 2 changed, user 3 gone, user 4 new
        spark.createDataFrame(
            [(1, 10.0), (2, 99.0), (4, 40.0)], "user_id long, v double"
        ).write.mode("overwrite").parquet(src)
        fs.refresh("cdc_fv", "1")
        snaps = fs.list_feature_view_snapshots("cdc_fv", "1")
        assert snaps == [1]

        rows = fs.feature_view_changes("cdc_fv", "1", from_snapshot=1).collect()
        got = {(r["user_id"], r["f_v"], r["_change_type"]) for r in rows}
        assert got == {
            (4, 40.0, "insert"),
            (3, 30.0, "delete"),
            (2, 20.0, "update_preimage"),
            (2, 99.0, "update_postimage"),
        }
        # unchanged user 1 appears nowhere
        assert all(r["user_id"] != 1 for r in rows)

    def test_changes_null_key_row_is_update(self, spark, tmp_path):
        """A changed NULL-keyed row is labeled update_pre/postimage, not
        insert+delete: intersect treats NULL keys as equal, and the
        semi/anti labeling joins must match them too (null-safe join —
        ADVICE r7)."""
        from dbt_snowflake_feature_store_spark import FeatureStore
        from dbt_snowflake_feature_store_spark.objects import (
            Entity,
            FeatureView,
            RefreshSpec,
        )

        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(1, 10.0), (None, 7.0)], "user_id long, v double"
        ).write.mode("overwrite").parquet(src)
        fs = FeatureStore(
            spark, str(tmp_path / "root"), name="CDCN_FS", snapshot_history=2
        )
        fs.register_source("CDCN_SRC", src)
        fs.register_entity(Entity("user", ["user_id"]))
        fs.register_feature_view(
            FeatureView(
                "cdcn_fv", ["user"],
                sql="SELECT user_id, v AS f_v FROM CDCN_SRC",
                refresh=RefreshSpec("1 minute", "FULL", "ON_CREATE"),
            ),
            version="1",
        )
        spark.createDataFrame(
            [(1, 10.0), (None, 8.0)], "user_id long, v double"
        ).write.mode("overwrite").parquet(src)
        fs.refresh("cdcn_fv", "1")
        rows = fs.feature_view_changes("cdcn_fv", "1", from_snapshot=1).collect()
        got = {(r["user_id"], r["f_v"], r["_change_type"]) for r in rows}
        assert got == {
            (None, 7.0, "update_preimage"),
            (None, 8.0, "update_postimage"),
        }

    def test_changes_between_two_snapshots_and_errors(self, spark, tmp_path):
        from dbt_snowflake_feature_store_spark import FeatureStore
        from dbt_snowflake_feature_store_spark.errors import ValidationError
        from dbt_snowflake_feature_store_spark.objects import (
            Entity,
            FeatureView,
            RefreshSpec,
        )

        src = str(tmp_path / "src")
        spark.createDataFrame([(1, 1.0)], "user_id long, v double").write.mode(
            "overwrite"
        ).parquet(src)
        fs = FeatureStore(
            spark, str(tmp_path / "root"), name="CDC2_FS", snapshot_history=3
        )
        fs.register_source("CDC2_SRC", src)
        fs.register_entity(Entity("user", ["user_id"]))
        fs.register_feature_view(
            FeatureView(
                "c2_fv", ["user"],
                sql="SELECT user_id, v AS f_v FROM CDC2_SRC",
                refresh=RefreshSpec("1 minute", "FULL", "ON_CREATE"),
            ),
            version="1",
        )
        spark.createDataFrame([(1, 2.0)], "user_id long, v double").write.mode(
            "overwrite"
        ).parquet(src)
        fs.refresh("c2_fv", "1")
        spark.createDataFrame([(1, 3.0)], "user_id long, v double").write.mode(
            "overwrite"
        ).parquet(src)
        fs.refresh("c2_fv", "1")
        # snapshot 1 = v1.0 state, snapshot 2 = v2.0 state, current = 3.0
        rows = fs.feature_view_changes(
            "c2_fv", "1", from_snapshot=1, to_snapshot=2
        ).collect()
        got = {(r["f_v"], r["_change_type"]) for r in rows}
        assert got == {(1.0, "update_preimage"), (2.0, "update_postimage")}
        # identical states -> empty feed
        assert fs.feature_view_changes(
            "c2_fv", "1", from_snapshot=2, to_snapshot=2
        ).count() == 0
        # static FV refuses (no snapshots)
        fs.register_feature_view(
            FeatureView("s_fv", ["user"],
                        sql="SELECT user_id, v AS f_v FROM CDC2_SRC"),
            version="1",
        )
        with pytest.raises(ValidationError, match="static"):
            fs.feature_view_changes("s_fv", "1", from_snapshot=1)


class TestFreshnessReport:
    def test_freshness_report(self, fs, tables):
        from dbt_snowflake_feature_store_spark import (
            Entity,
            FeatureView,
            RefreshSpec,
        )

        fs.register_entity(Entity("customer", ["c_custkey"]))
        # static FV: excluded from the report
        fs.register_feature_view(
            FeatureView("static_f", ["customer"], sql=FV_SQL), version="1"
        )
        # managed, refreshed on create: fresh (not due) under a long lag
        fs.register_feature_view(
            FeatureView(
                "fresh_f", ["customer"], sql=FV_SQL,
                refresh=RefreshSpec("1 hour", "FULL", "ON_CREATE"),
            ),
            version="1",
        )
        # managed, never refreshed (ON_SCHEDULE): due, no last refresh
        fs.register_feature_view(
            FeatureView(
                "stale_f", ["customer"], sql=FV_SQL,
                refresh=RefreshSpec("1 minute", "FULL", "ON_SCHEDULE"),
            ),
            version="1",
        )
        rep = {r["NAME"]: r for r in fs.freshness_report().collect()}
        assert set(rep) == {"FRESH_F", "STALE_F"}  # static excluded
        fresh = rep["FRESH_F"]
        assert fresh["DUE"] is False
        assert fresh["LAG_SECONDS"] is not None and fresh["LAG_SECONDS"] >= 0
        assert fresh["LAST_ROWS"] > 0
        assert fresh["TARGET_LAG"] == "1 hour"
        stale = rep["STALE_F"]
        assert stale["DUE"] is True
        assert stale["LAST_REFRESH_AT"] is None
        assert stale["LAG_SECONDS"] is None
        # suspended FVs are never due
        fs.suspend_feature_view("fresh_f", "1")
        rep2 = {r["NAME"]: r for r in fs.freshness_report().collect()}
        assert rep2["FRESH_F"]["STATUS"] == "SUSPENDED"
        assert rep2["FRESH_F"]["DUE"] is False
