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


# ---------------------------------------------------------------------------
# LSH bucket-skew hardening (cosine_pairs_lsh)
# ---------------------------------------------------------------------------

def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_lsh_bucket_cap_prevents_quadratic_blowup(spark):
    """A clustered corpus (300 identical vectors → ONE signature bucket)
    makes the uncapped self-join quadratic in that bucket (~45k pairs);
    with max_bucket_size the over-cap bucket never reaches the join."""
    import numpy as np

    from dbt_snowflake_feature_store_spark.functions.similarity import (
        cosine_pairs_lsh,
    )

    rng = np.random.default_rng(7)
    clustered = np.tile(rng.normal(size=64), (300, 1))
    scattered = rng.normal(size=(20, 64))
    df = _emb_df(spark, list(clustered) + list(scattered))

    uncapped = cosine_pairs_lsh(
        df, threshold=-1.0, num_bits=12, dim=64, multi_probe=True
    ).count()
    assert uncapped >= 300 * 299 // 2  # the quadratic bucket, demonstrated

    capped = cosine_pairs_lsh(
        df, threshold=-1.0, num_bits=12, dim=64,
        multi_probe=True, max_bucket_size=50,
    )
    rows = capped.collect()
    assert len(rows) < 2000
    assert all(r.id_a >= 300 or r.id_b >= 300 for r in rows)
    # the bucket-size filter joins as a broadcast — the candidate join's
    # big side is never shuffled for the cap check
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_lsh_multi_probe_recovers_hamming1_pairs(spark):
    """Hamming-1 neighbors (one disagreeing hyperplane) are missed by
    single-probe but found — exactly once — with multi_probe."""
    import numpy as np

    from dbt_snowflake_feature_store_spark.functions.similarity import (
        _hyperplane_weights,
        _signature_expr,
        cosine_pairs_lsh,
    )
    from pyspark.sql import functions as F  # noqa: F811

    rng = np.random.default_rng(3)
    df = _emb_df(spark, rng.normal(size=(200, 64)))
    weights = _hyperplane_weights(12, 64)
    sigs = {
        r.vec_id: r.s
        for r in df.withColumn("s", _signature_expr("embedding", weights)).collect()
    }
    h1 = {
        (a, b)
        for a in range(200)
        for b in range(a + 1, 200)
        if bin(sigs[a] ^ sigs[b]).count("1") == 1
    }
    assert h1, "seeded fixture must contain Hamming-1 pairs"

    single = {
        (r.id_a, r.id_b)
        for r in cosine_pairs_lsh(
            df, threshold=-1.0, num_bits=12, dim=64
        ).collect()
    }
    multi_rows = cosine_pairs_lsh(
        df, threshold=-1.0, num_bits=12, dim=64, multi_probe=True
    ).collect()
    multi = {(r.id_a, r.id_b) for r in multi_rows}

    assert h1.isdisjoint(single)
    assert h1 <= multi
    assert len(multi_rows) == len(multi)  # each pair surfaces exactly once
