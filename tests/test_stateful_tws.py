"""transformWithStateInPandas (Spark 4 typed-state API) operators:
running stats parity with the batch recompute, and cross-batch
first-seen streaming dedup. Both need the RocksDB state store provider."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_snowflake_feature_store_spark.sources import read_table
from dbt_snowflake_feature_store_spark.streaming.stateful import (
    ROCKSDB_PROVIDER,
    running_user_stats_tws,
    streaming_dedup_first_seen,
    tws_available,
)

needs_protobuf = pytest.mark.skipif(
    not tws_available(),
    reason="transformWithStateInPandas needs protobuf (absent in container)",
)

SF = "/root/testdata/sf0.001"


def test_tws_plan_constructs(spark):
    """Even without protobuf the operator must BUILD: groupBy +
    transformWithStateInPandas resolves the output schema at plan time.
    (Runtime execution is covered by the tests below where protobuf
    exists.)"""
    ev = read_table(spark, SF, "events").select("user_id", "ts", "value")
    df = running_user_stats_tws(ev)
    assert [f.name for f in df.schema.fields] == [
        "user_id",
        "f_n",
        "f_total",
        "f_last_ts",
    ]


@pytest.fixture()
def rocksdb(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    yield spark
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def _drain(df_stream, ckpt, out_dir, mode):
    q = (
        df_stream.writeStream.trigger(availableNow=True)
        .outputMode(mode)
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()


@needs_protobuf
def test_tws_running_stats_matches_batch(rocksdb, tmp_path):
    spark = rocksdb
    ev = read_table(spark, SF, "events")
    src = str(tmp_path / "src")
    ev.select("user_id", "ts", "value").coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    out_dir = str(tmp_path / "out")
    epoch = {"n": 0}

    def sink(df, epoch_id):
        epoch["n"] += 1
        df.withColumn("_epoch", F.lit(epoch["n"])).write.mode("append").parquet(
            out_dir
        )

    q = (
        running_user_stats_tws(stream)
        .writeStream.trigger(availableNow=True)
        .outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(out_dir)
    latest = out.groupBy("user_id").agg(F.max("_epoch").alias("_epoch"))
    got = {
        r["user_id"]: (r["f_n"], r["f_total"])
        for r in out.join(latest, ["user_id", "_epoch"]).collect()
    }
    exp = {
        r["user_id"]: (r["n"], r["t"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0], k
        assert abs(got[k][1] - exp[k][1]) < 1e-6, k


@needs_protobuf
def test_tws_dedup_first_seen_across_batches(rocksdb, tmp_path):
    spark = rocksdb
    docs = read_table(spark, SF, "documents")
    keyed = docs.select(
        F.sha2(F.col("text"), 256).alias("dedup_key"), "doc_id"
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    # batch 1: half the corpus
    keyed.filter("doc_id < 250").coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        _drain(streaming_dedup_first_seen(stream), ckpt, out_dir, "append")

    run()
    n1 = spark.read.parquet(out_dir).count()
    exp1 = keyed.filter("doc_id < 250").select("dedup_key").distinct().count()
    assert n1 == exp1

    # batch 2: full corpus re-sent (every batch-1 key is a duplicate now)
    keyed.coalesce(1).write.mode("append").parquet(src)
    run()
    out = spark.read.parquet(out_dir)
    exp_all = keyed.select("dedup_key").distinct().count()
    assert out.count() == exp_all, "each distinct content emitted exactly once"
    assert out.select("dedup_key").distinct().count() == exp_all
    # first-seen = min doc_id per key over everything that arrived
    exp_min = {
        r["dedup_key"]: r["m"]
        for r in keyed.filter("doc_id < 250")
        .groupBy("dedup_key")
        .agg(F.min("doc_id").alias("m"))
        .collect()
    }
    got = {r["dedup_key"]: r["doc_id"] for r in out.collect()}
    for k, m in exp_min.items():
        assert got[k] == m, k
