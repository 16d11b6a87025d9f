"""Column-profiling tests: functions.profile computes per-column stats in
ONE aggregation pass; FeatureStore.profile_feature_view exposes it over
any registered FV."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dbt_snowflake_feature_store_spark import Entity, FeatureView
from dbt_snowflake_feature_store_spark.functions.profile import profile
from dbt_snowflake_feature_store_spark.sources import read_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return read_table(spark, sf_dir, "events")


class TestProfileFunction:
    def test_counts_and_ranges_match_direct_queries(self, spark, events):
        rows = {r["column"]: r for r in profile(events).collect()}
        assert set(rows) == set(events.columns)
        n = events.count()
        for r in rows.values():
            assert r["n_rows"] == n
        direct = events.agg(
            F.count("value").alias("nn"),
            F.min("user_id").cast("string").alias("mn"),
            F.max("user_id").cast("string").alias("mx"),
            F.avg("value").alias("mean"),
        ).head()
        v = rows["value"]
        assert v["n_nulls"] == n - direct["nn"]
        assert v["mean"] == pytest.approx(direct["mean"])
        u = rows["user_id"]
        assert u["min"] == direct["mn"] and u["max"] == direct["mx"]
        # timestamps are orderable but not numeric
        ts = rows["ts"]
        assert ts["min"] is not None and ts["mean"] is None

    def test_null_frac_and_distinct(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "b"), (4, None), (5, "a")],
            "id long, s string",
        )
        rows = {r["column"]: r for r in profile(df).collect()}
        s = rows["s"]
        assert s["n_nulls"] == 2
        assert s["null_frac"] == pytest.approx(0.4)
        # HLL++ on 2 distinct values is exact
        assert s["approx_distinct"] == 2
        assert rows["id"]["approx_distinct"] == 5

    def test_column_subset_and_unknown_column(self, spark, events):
        rows = profile(events, columns=["value"]).collect()
        assert [r["column"] for r in rows] == ["value"]
        with pytest.raises(ValueError, match="unknown columns"):
            profile(events, columns=["nope"])

    def test_single_job_one_pass(self, spark, events):
        """All statistics come from ONE agg: the executed plan has
        exactly one Exchange (partial agg -> shuffle 1 row/partition ->
        final agg), not one aggregation per column."""
        from dbt_snowflake_feature_store_spark.functions.profile import (
            _agg_frame,
        )

        frame = _agg_frame(events, events.columns, 0.05)
        frame.collect()
        plan = frame._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]  # AQE prints both
        assert final.count("Exchange") - final.count("ReusedExchange") == 1
        assert profile(events).count() == len(events.columns)


class TestStoreProfile:
    def test_profile_feature_view(self, fs, spark, sf_dir):
        fs.register_source("EV", f"{sf_dir}/events.parquet")
        fs.register_entity(Entity("user", ["user_id"]))
        fv = FeatureView(
            "prof_fv",
            ["user"],
            sql="SELECT user_id, ts, value AS f_value FROM EV",
            timestamp_col="ts",
        )
        fs.register_feature_view(fv, version="1.0")
        rows = {r["column"]: r for r in fs.profile_feature_view("PROF_FV$1.0").collect()}
        assert set(rows) == {"user_id", "ts", "f_value"}
        n = fs.read_feature_view("PROF_FV$1.0").count()
        assert rows["f_value"]["n_rows"] == n
        assert rows["f_value"]["dtype"] == "double"


class TestExplain:
    def test_explain_feature_view(self, fs, spark, sf_dir):
        fs.register_source("EV2", f"{sf_dir}/events.parquet")
        fs.register_entity(Entity("xuser", ["user_id"]))
        fs.register_feature_view(
            FeatureView(
                "explained",
                ["xuser"],
                sql="""SELECT user_id, COUNT(*) AS f_n
                       FROM EV2 GROUP BY user_id""",
            ),
            version="1.0",
        )
        out = fs.explain_feature_view("EXPLAINED$1.0")
        first = out.splitlines()[0]
        assert "shuffles=" in first and "aggs=" in first
        assert "HashAggregate" in out
