"""Salted-join correctness: identical results to the plain join, hot key
spread over N sub-keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_snowflake_feature_store_spark.functions.skew import salted_left_join


def test_salted_join_matches_plain_join(spark):
    # skewed fact: 90% of rows share key 1
    fact = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, 0) for k in range(2, 102)],
        "k long, payload long",
    )
    dim = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(0, 102)], "k long, attr string"
    )
    salted = salted_left_join(fact, dim, on=["k"], num_salts=8)
    plain = fact.join(dim, on=["k"], how="left")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_spreads_hot_key(spark):
    fact = spark.createDataFrame([(1, i) for i in range(1000)], "k long, payload long")
    from dbt_snowflake_feature_store_spark.functions.skew import _SALT  # noqa

    salt = F.pmod(F.xxhash64(F.col("k"), F.col("payload")), F.lit(8))
    n_buckets = (
        fact.withColumn("s", salt).select("s").distinct().count()
    )
    assert n_buckets == 8  # hot key occupies every salt bucket


def test_salted_join_unmatched_keys_null(spark):
    fact = spark.createDataFrame([(99, 1), (1, 2)], "k long, payload long")
    dim = spark.createDataFrame([(1, "a")], "k long, attr string")
    rows = {r["k"]: r["attr"] for r in salted_left_join(fact, dim, ["k"], 4).collect()}
    assert rows == {99: None, 1: "a"}
