"""applyInPandasWithState custom stateful operator: state persists across
micro-batches (checkpointed), updates are exact vs a batch recompute."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbt_snowflake_feature_store_spark.sources import read_table
from dbt_snowflake_feature_store_spark.streaming.stateful import running_user_stats

SF = "/root/testdata/sf0.001"


_EPOCH = {"n": 0}


def _run_stream(spark, src, ckpt, out_dir):
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src).select(
        "user_id", "ts", "value"
    )

    def sink(df, epoch_id):
        _EPOCH["n"] += 1
        df.withColumn("_epoch", F.lit(_EPOCH["n"])).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        running_user_stats(stream)
        .writeStream.trigger(availableNow=True)
        .outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    # latest emitted state per user
    out = spark.read.parquet(out_dir)
    w_latest = out.groupBy("user_id").agg(F.max("_epoch").alias("_epoch"))
    return out.join(w_latest, ["user_id", "_epoch"]).drop("_epoch")


def test_running_stats_across_batches(spark, tmp_path):
    ev = read_table(spark, SF, "events")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    half1 = ev.filter("event_id < 500")
    half2 = ev.filter("event_id >= 500")
    half1.coalesce(1).write.parquet(src)
    out_dir = str(tmp_path / "out")

    out1 = _run_stream(spark, src, ckpt, out_dir)
    got1 = {r["user_id"]: (r["f_n"], r["f_total"]) for r in out1.collect()}
    exp1 = {
        r["user_id"]: (r["n"], r["t"])
        for r in half1.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(got1) == set(exp1)
    for k in exp1:
        assert got1[k][0] == exp1[k][0]
        assert abs(got1[k][1] - exp1[k][1]) < 1e-6

    # second half arrives: state carries over, totals reflect ALL data
    half2.coalesce(1).write.mode("append").parquet(src)
    out2 = _run_stream(spark, src, ckpt, out_dir)
    got2 = {r["user_id"]: (r["f_n"], r["f_total"]) for r in out2.collect()}
    exp_all = {
        r["user_id"]: (r["n"], r["t"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    for k, (n, t) in got2.items():
        assert n == exp_all[k][0], k
        assert abs(t - exp_all[k][1]) < 1e-6, k
