"""Property pins for the r12 statistics keys — brute-force Python
replays independent of the DuckDB oracle (the r11 discipline): the
distributed integer spellings must equal the textbook definitions on
arbitrary small inputs, under any partitioning."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ranks.global_running_min — the new range-exchange prefix-min
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.integers(-(10**12), 10**12), min_size=1, max_size=40
    ),
)
def test_global_running_min_matches_sequential(spark, vals):
    from dbt_snowflake_feature_store_spark.functions.ranks import (
        global_running_min,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    out = global_running_min(
        df, ["k"], "v", rank_col="_r", min_col="_m", num_partitions=3
    )
    got = {r["k"]: r["_m"] for r in out.collect()}
    run = None
    for i, v in enumerate(vals):
        run = v if run is None else min(run, v)
        assert got[i] == run, (i, got[i], run)


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.integers(-(10**6), 10**6), min_size=2, max_size=30
    ),
)
def test_running_sum_and_min_one_pass(spark, vals):
    """sum_value and min_value compose on ONE _ranked pass."""
    from dbt_snowflake_feature_store_spark.functions.ranks import _ranked

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(5)
    out, n = _ranked(
        df, ["k"], "_r", 3,
        sum_value="v", sum_out="_s", min_value="v", min_out="_m",
    )
    assert n == len(vals)
    got = {r["k"]: (r["_s"], r["_m"]) for r in out.collect()}
    s, m = 0, None
    for i, v in enumerate(vals):
        s += v
        m = v if m is None else min(m, v)
        assert got[i] == (s, m)


# ---------------------------------------------------------------------------
# Spearman ×2-scaled tie-averaged ranks
# ---------------------------------------------------------------------------


def _spearman_brute(xs: list[int], ys: list[int]) -> int:
    """1e6 − floor(6e6·Σd² / (n(n²−1))) with exact tie-averaged ranks
    (Fractions), matching the key's simplified-statistic contract."""
    def avg_ranks(vs):
        order = sorted(range(len(vs)), key=lambda i: vs[i])
        ranks = [Fraction(0)] * len(vs)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vs[order[j]] == vs[order[i]]:
                j += 1
            avg = Fraction(i + 1 + j, 2)  # (min_rank + max_rank)/2
            for k in range(i, j):
                ranks[order[k]] = avg
            i = j
        return ranks

    r1, r2 = avg_ranks(xs), avg_ranks(ys)
    sd2 = sum((a - b) ** 2 for a, b in zip(r1, r2))
    n = len(xs)
    num = 6 * 1_000_000 * sd2
    den = Fraction(n * (n * n - 1))
    q = num / den
    return 1_000_000 - q.numerator // q.denominator


@settings(max_examples=10, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 50)),
        min_size=2,
        max_size=40,
    ),
)
def test_spearman_rank2_spelling_matches_brute(spark, pairs):
    from dbt_snowflake_feature_store_spark.functions.ranks import (
        global_running_sum,
    )

    # degenerate case: a constant column makes n(n²−1) the only guard
    df = spark.createDataFrame(
        [(a, b) for a, b in pairs], "_v1 long, _v2 long"
    ).repartition(5)

    def rank2(col):
        dv = df.groupBy(col).agg(F.count("*").cast("long").alias("_c"))
        cum = global_running_sum(
            dv, [col], "_c", rank_col="_r", sum_col="_cum",
            num_partitions=3,
        )
        return cum.select(
            col,
            F.expr("CAST(2 * _cum - _c + 1 AS BIGINT)").alias(
                f"{col}_r2"
            ),
        )

    joined = df.join(rank2("_v1"), "_v1").join(rank2("_v2"), "_v2")
    n = len(pairs)
    got = joined.agg(
        F.expr(
            "CAST(1000000 - CAST(6000000 AS DECIMAL(38,0))"
            " * SUM(CAST(_v1_r2 - _v2_r2 AS DECIMAL(38,0))"
            "       * CAST(_v1_r2 - _v2_r2 AS DECIMAL(38,0)))"
            f" DIV GREATEST(CAST(4 AS DECIMAL(38,0)) * {n}"
            f" * (CAST({n} AS DECIMAL(38,0)) * {n} - 1), 1) AS BIGINT)"
        )
    ).collect()[0][0]
    xs = [a for a, _ in pairs]
    ys = [b for _, b in pairs]
    if n > 1:
        assert got == _spearman_brute(xs, ys)


# ---------------------------------------------------------------------------
# CUSUM max drawup
# ---------------------------------------------------------------------------


def _cusum_brute(xs: list[int]) -> tuple[int, int]:
    """(max drawup of P_t = Σ(D·x − T), argmax index, earliest)."""
    D, T = len(xs), sum(xs)
    p, pmin, best, arg = 0, None, None, None
    for i, x in enumerate(xs):
        p += D * x - T
        pmin = p if pmin is None else min(pmin, p)
        s = p - pmin
        if best is None or s > best:
            best, arg = s, i
    return best, arg


@settings(max_examples=10, deadline=None)
@given(
    xs=st.lists(st.integers(0, 1000), min_size=1, max_size=40),
)
def test_cusum_drawup_matches_brute(spark, xs):
    from dbt_snowflake_feature_store_spark.functions.ranks import (
        global_running_min,
        global_running_sum,
    )

    D, T = len(xs), sum(xs)
    rows = [(i, D * x - T) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k long, _y long").repartition(4)
    p = global_running_sum(
        df, ["k"], "_y", rank_col="_r", sum_col="_p", num_partitions=3
    )
    s = global_running_min(
        p.select("k", "_p"), ["k"], "_p", rank_col="_r2",
        min_col="_pmin", num_partitions=3,
    )
    top = (
        s.select(
            "k", F.expr("CAST(_p - _pmin AS BIGINT)").alias("_s")
        )
        .orderBy(F.col("_s").desc(), F.col("k").asc())
        .limit(1)
        .collect()[0]
    )
    best, arg = _cusum_brute(xs)
    assert (top["_s"], top["k"]) == (best, arg)


# ---------------------------------------------------------------------------
# PSI octave-bits terms: every term ≥ 0 (sign coupling through floor-log2)
# ---------------------------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(
    c1=st.integers(0, 10**6),
    c2=st.integers(0, 10**6),
    n1=st.integers(1, 10**6),
    n2=st.integers(1, 10**6),
)
def test_psi_bits_term_nonnegative(c1, c2, n1, n2):
    a, b = c1 * n2, c2 * n1
    bl = lambda x: max(x, 1).bit_length() - 1  # noqa: E731
    term = (a - b) * (bl(a) - bl(b))
    assert term >= 0  # floor-log2 is monotone, so the factors share sign
