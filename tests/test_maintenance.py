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
