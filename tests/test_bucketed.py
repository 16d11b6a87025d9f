"""Bucketed managed-FV materialization (Snowflake CLUSTER BY analog).

The scale contract: a join against a bucketed FV shuffles ONLY the
other side — the FV scan carries the bucket metadata
(SelectedBucketsCount) and needs no Exchange. Asserted on the executed
plan, not just the result.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_snowflake_feature_store_spark import Entity, FeatureView, RefreshSpec
from dbt_snowflake_feature_store_spark.sources import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_fv(fs, spark, tables):
    fs.register_entity(Entity(name="customer", join_keys=["c_custkey"]))
    fv = FeatureView(
        name="cust_bucketed",
        entities=["customer"],
        sql="SELECT c_custkey, c_acctbal AS f_bal, c_mktsegment AS f_seg "
        "FROM customer",
        refresh=RefreshSpec(refresh_freq="1 minute"),
        buckets=8,
    )
    return fs.register_feature_view(fv, version="1.0")


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]


def test_bucketed_fv_join_shuffles_spine_only(fs, spark, bucketed_fv):
    feat = fs.read_feature_view("cust_bucketed", "1.0")
    spine = (
        read_table(spark, SF, "orders")
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spine.join(feat, "c_custkey")
        plan = _final_plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SelectedBucketsCount" in plan, plan
    # exactly one Exchange: the spine side. The FV side reads in bucket
    # layout with no shuffle.
    assert plan.count("Exchange") == 1, plan


def test_bucketed_fv_values_match_plain_read(fs, spark, bucketed_fv, tables):
    feat = fs.read_feature_view("cust_bucketed", "1.0")
    expected = spark.sql(
        "SELECT c_custkey, c_acctbal AS f_bal, c_mktsegment AS f_seg FROM customer"
    )
    got = {r["c_custkey"]: (r["f_bal"], r["f_seg"]) for r in feat.collect()}
    exp = {r["c_custkey"]: (r["f_bal"], r["f_seg"]) for r in expected.collect()}
    assert got == exp


def test_bucketed_fv_survives_reopen_without_catalog(fs, spark, bucketed_fv):
    """A fresh store instance (and, on a real cluster, a fresh session
    without a metastore) falls back to the bare-path read: data intact,
    bucket metadata is a catalog concern."""
    from dbt_snowflake_feature_store_spark import FeatureStore

    fv = fs.get_feature_view("cust_bucketed", "1.0")
    assert fv.buckets == 8  # registry round-trip
    # simulate a new session (catalog gone)
    spark.sql(f"DROP TABLE IF EXISTS {fs._fv_catalog_name(fv.name, fv.version)}")
    fs2 = FeatureStore(spark, fs.root, name="TEST_FS")
    assert fs2.read_feature_view("cust_bucketed", "1.0").count() == 150


def test_bucketed_refresh_rebuilds(fs, spark, bucketed_fv):
    """Refresh of a bucketed FV is always a FULL bucketed rebuild."""
    assert fs.refresh("cust_bucketed", "1.0") == "FULL"
    feat = fs.read_feature_view("cust_bucketed", "1.0")
    assert feat.count() == 150


def test_bucketed_fv_dropped_from_catalog(fs, spark, bucketed_fv):
    fv = fs.get_feature_view("cust_bucketed", "1.0")
    tbl = fs._fv_catalog_name(fv.name, fv.version)
    assert spark.catalog.tableExists(tbl)
    fs.delete_feature_view("cust_bucketed", "1.0")
    assert not spark.catalog.tableExists(tbl)
