"""Property pins for the r15 de-creep primitives: the fused drawup
scan (ranks.global_drawup_scan) and the pre_distinct=False kmv_kmin
staging — brute-force Python replays independent of the DuckDB oracle
(the r11/r12 discipline): the fused spellings must equal both the
textbook definitions and the unfused two-pass spellings on arbitrary
small inputs, under any partitioning."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# ranks.global_drawup_scan — running sum + running min of that sum,
# ONE range exchange
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.integers(-(10**12), 10**12), min_size=1, max_size=40
    ),
)
def test_global_drawup_scan_matches_sequential(spark, vals):
    from dbt_snowflake_feature_store_spark.functions.ranks import (
        global_drawup_scan,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    out = global_drawup_scan(
        df, ["k"], "v", sum_col="_p", min_col="_pmin", num_partitions=3
    )
    got = {r["k"]: (r["_p"], r["_pmin"]) for r in out.collect()}
    assert len(got) == len(vals)
    run_sum, run_min = 0, None
    for i, v in enumerate(vals):
        run_sum += v
        run_min = run_sum if run_min is None else min(run_min, run_sum)
        assert got[i] == (run_sum, run_min), (i, got[i], run_sum, run_min)


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(
        st.integers(-(10**9), 10**9), min_size=2, max_size=25
    ),
    parts=st.integers(1, 6),
)
def test_global_drawup_scan_matches_two_pass(spark, vals, parts):
    """The fused scan ≡ global_running_sum then global_running_min of
    the sum column, whatever the partition count (the q_cusum_drift
    plan equivalence)."""
    from dbt_snowflake_feature_store_spark.functions.ranks import (
        global_drawup_scan,
        global_running_min,
        global_running_sum,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(4)
    fused = global_drawup_scan(
        df, ["k"], "v", sum_col="_p", min_col="_pmin",
        num_partitions=parts,
    )
    p = global_running_sum(
        df, ["k"], "v", rank_col="_r", sum_col="_p", num_partitions=parts
    )
    two = global_running_min(
        p.select("k", "_p"), ["k"], "_p", rank_col="_r2", min_col="_pmin",
        num_partitions=parts,
    )
    got_f = {r["k"]: (r["_p"], r["_pmin"]) for r in fused.collect()}
    got_t = {r["k"]: (r["_p"], r["_pmin"]) for r in two.collect()}
    assert got_f == got_t


# ---------------------------------------------------------------------------
# sketches.kmv_kmin pre_distinct=False — dense_rank staging + trailing
# dedup ≡ the pre-distinct row_number path on duplicate-bearing input
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    hashes=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),          # key group
            st.integers(0, 200),                  # hash value (dense: ties!)
            st.integers(1, 3),                    # multiplicity
        ),
        min_size=1,
        max_size=30,
    ),
    k=st.integers(1, 8),
)
def test_kmv_kmin_pre_distinct_false_parity(spark, hashes, k):
    from dbt_snowflake_feature_store_spark.functions.sketches import (
        kmv_kmin,
    )

    rows = [(g, h) for g, h, m in hashes for _ in range(m)]
    df = spark.createDataFrame(rows, "g string, h long").repartition(5)
    a = {
        (r["g"], r["h"])
        for r in kmv_kmin(df, ["g"], k=k, pre_distinct=True).collect()
    }
    b = {
        (r["g"], r["h"])
        for r in kmv_kmin(df, ["g"], k=k, pre_distinct=False).collect()
    }
    assert a == b
    # and both equal the textbook k smallest distinct per group
    want = set()
    for g in {g for g, _ in rows}:
        vs = sorted({h for gg, h in rows if gg == g})[:k]
        want.update((g, h) for h in vs)
    assert a == want


# ---------------------------------------------------------------------------
# entity-path planner: shared snowflake bridge joins are reused
# (ADVICE r14 #3)
# ---------------------------------------------------------------------------


def test_entity_hop_bridge_join_reused(spark):
    """customer__nation_e__nname and customer__nation_e__region_e__rname
    share the customer→nation bridge — the planner must join the
    customers (key, nationkey) projection ONCE. Analyzed-plan Join
    count: 1 shared bridge + nname direct + region bridge + rname
    direct = 4 (the un-cached planner produced 5)."""
    import re

    from dbt_snowflake_feature_store_spark.models import evaluate_metric
    from dbt_snowflake_feature_store_spark.operators.feature_queries import (
        _metric_fs,
    )

    fs = _metric_fs(spark, "/root/testdata/sf0.001")
    keys = [
        "customer__nation_e__nname",
        "customer__nation_e__region_e__rname",
    ]
    df = evaluate_metric(fs, "total_revenue", group_by=keys)
    plan = df._jdf.queryExecution().analyzed().toString()
    njoins = len(re.findall(r"\bJoin\b", plan))
    assert njoins == 4, f"expected 4 joins (shared bridge), got {njoins}"
