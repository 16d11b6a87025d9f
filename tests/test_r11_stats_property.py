"""Property pins for the r11 statistics keys — brute-force Python
replays independent of the DuckDB oracle (the q_auc_mann_whitney
discipline): the distributed integer spellings must equal the textbook
definitions on arbitrary small inputs, under any partitioning."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _ks_brute(a: list[int], b: list[int]) -> int:
    """floor(1e6 · sup|F1 − F2|) over the pooled step points, exact."""
    n1, n2 = len(a), len(b)
    best = Fraction(0)
    for v in sorted(set(a) | set(b)):
        f1 = Fraction(sum(1 for x in a if x <= v), n1)
        f2 = Fraction(sum(1 for x in b if x <= v), n2)
        best = max(best, abs(f1 - f2))
    return (best.numerator * 1_000_000) // best.denominator


@settings(max_examples=12, deadline=None)
@given(
    a=st.lists(st.integers(0, 40), min_size=2, max_size=30),
    b=st.lists(st.integers(0, 40), min_size=2, max_size=30),
)
def test_ks_matches_brute_force(spark, a, b):
    """The range-exchange KS spelling (cum1·n2 − cum2·n1 cross-mult)
    equals the Fraction-exact sup|F1 − F2| for any integer samples."""
    from dbt_snowflake_feature_store_spark.functions.ranks import (
        global_running_sum,
    )

    rows = [(v, 1, 0) for v in a] + [(v, 0, 1) for v in b]
    df = spark.createDataFrame(rows, "v long, _a long, _b long").repartition(5)
    pts = df.groupBy("v").agg(
        F.sum("_a").cast("long").alias("c1"),
        F.sum("_b").cast("long").alias("c2"),
    )
    cum = global_running_sum(
        pts, ["v"], ["c1", "c2"], rank_col="_r", sum_col=["_c1", "_c2"],
        num_partitions=3,
    )
    n1, n2 = len(a), len(b)
    got = (
        cum.select(
            F.expr(
                f"ABS(CAST(_c1 AS DECIMAL(18,0)) * {n2}"
                f" - CAST(_c2 AS DECIMAL(18,0)) * {n1})"
            ).alias("_g")
        )
        .agg(F.expr(f"CAST(MAX(_g) * 1000000 DIV ({n1} * {n2}) AS BIGINT)"))
        .collect()[0][0]
    )
    assert got == _ks_brute(a, b)


def _gini_brute(vals: list[int], labels: list[int]) -> tuple[int, int]:
    """(best split value, scaled score) by exhaustive scan — the scaled
    integer spelling of q_best_split_gini replayed in Python ints."""
    pts = sorted(set(vals))
    n, pos = len(vals), sum(labels)
    best = None
    for v in pts:
        left = [(x, y) for x, y in zip(vals, labels) if x <= v]
        L, Lp = len(left), sum(y for _, y in left)
        R, Rp = n - L, pos - Lp
        if R == 0:
            continue
        A = Lp * Lp + (L - Lp) * (L - Lp)
        B = Rp * Rp + (R - Rp) * (R - Rp)
        score = (A * R + B * L) * 1_000_000_000 // (L * R)
        if best is None or score > best[1]:
            best = (v, score)
    return best


@settings(max_examples=10, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 1)),
        min_size=4,
        max_size=40,
    ).filter(lambda d: len({v for v, _ in d}) >= 2),
)
def test_gini_split_matches_brute_force(spark, data):
    from dbt_snowflake_feature_store_spark.functions.ranks import (
        global_running_sum,
    )

    vals = [v for v, _ in data]
    labels = [y for _, y in data]
    df = spark.createDataFrame(
        list(zip(vals, labels)), "v long, _p long"
    ).repartition(4)
    pts = df.groupBy("v").agg(
        F.count("*").cast("long").alias("ct"),
        F.sum("_p").cast("long").alias("cp"),
    )
    cum = global_running_sum(
        pts, ["v"], ["ct", "cp"], rank_col="_r", sum_col=["_t", "_p2"],
        num_partitions=3,
    )
    n, pos = len(vals), sum(labels)
    got = (
        cum.filter(F.col("_t") < n)
        .select(
            "v",
            F.expr(
                f"""CAST((
                    (CAST(_p2 AS DECIMAL(38,0)) * _p2
                     + CAST(_t - _p2 AS DECIMAL(38,0)) * (_t - _p2))
                    * ({n} - _t)
                    + (CAST({pos} - _p2 AS DECIMAL(38,0)) * ({pos} - _p2)
                       + CAST(({n} - _t) - ({pos} - _p2) AS DECIMAL(38,0))
                         * (({n} - _t) - ({pos} - _p2)))
                    * _t
                ) * 1000000000
                DIV (CAST(_t AS DECIMAL(38,0)) * ({n} - _t)) AS BIGINT)"""
            ).alias("s"),
        )
        .orderBy(F.col("s").desc(), F.col("v").asc())
        .limit(1)
        .collect()[0]
    )
    want_v, want_s = _gini_brute(vals, labels)
    assert (got["v"], got["s"]) == (want_v, want_s)


@settings(max_examples=10, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(1, 20), st.integers(1, 9)),
        min_size=1,
        max_size=25,
    ),
)
def test_weighted_median_rule(spark, data):
    """Smallest value with 2·cumweight ≥ total — the lower weighted
    median — against a Python replay, any partitioning."""
    df = spark.createDataFrame(data, "v long, w long").repartition(3)
    agg = df.groupBy("v").agg(F.sum("w").cast("long").alias("w"))
    from pyspark.sql import Window

    win = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = sum(w for _, w in data)
    got = (
        agg.withColumn("_c", F.sum("w").over(win))
        .filter(F.col("_c") * 2 >= tot)
        .agg(F.min("v"))
        .collect()[0][0]
    )
    acc, want = 0, None
    for v in sorted({v for v, _ in data}):
        acc += sum(w for x, w in data if x == v)
        if acc * 2 >= tot:
            want = v
            break
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    a=st.lists(st.integers(1, 300), min_size=1, max_size=25),
    b=st.lists(st.integers(1, 300), min_size=1, max_size=25),
)
def test_tvd_cross_multiplication_matches_fractions(spark, a, b):
    """The integer cross-multiplied TVD (Σ|c1·N2 − c2·N1|·1e6 DIV
    (2·N1·N2)) equals the Fraction-exact ½Σ|p−q| floored to ppm, and
    stays within [0, 1000000] (Σ|p−q| ≤ 2, so TVD ≤ 1 — the maximum is
    reached exactly when the supports are disjoint)."""
    bins = sorted(set(a) | set(b))
    c1 = {v: a.count(v) for v in bins}
    c2 = {v: b.count(v) for v in bins}
    n1, n2 = len(a), len(b)
    want_frac = sum(
        abs(Fraction(c1[v], n1) - Fraction(c2[v], n2)) for v in bins
    ) / 2
    want = (want_frac.numerator * 1_000_000) // want_frac.denominator
    rows = [(v, c1[v], c2[v]) for v in bins]
    df = spark.createDataFrame(rows, "v long, c1 long, c2 long")
    got = (
        df.selectExpr(
            f"ABS(CAST(c1 AS DECIMAL(18,0)) * {n2}"
            f" - CAST(c2 AS DECIMAL(18,0)) * {n1}) AS g"
        )
        .agg(F.expr(f"CAST(SUM(g) * 1000000 DIV ({n1} * {n2} * 2) AS BIGINT)"))
        .collect()[0][0]
    )
    assert got == want
    assert 0 <= got <= 1_000_000


@settings(max_examples=10, deadline=None)
@given(
    counts=st.lists(st.integers(1, 1000), min_size=1, max_size=12),
)
def test_octave_entropy_identity(spark, counts):
    """The octave-bits entropy numerator Σ c·⌊log2⌊N/c⌋⌋ replayed in
    Python ints — `length(bin(x)) − 1` IS ⌊log2 x⌋ for every x ≥ 1."""
    n = sum(counts)
    want = sum(c * ((n // c).bit_length() - 1) for c in counts)
    df = spark.createDataFrame([(c,) for c in counts], "c long")
    got = (
        df.selectExpr(
            f"c * (length(bin(CAST({n} AS BIGINT) DIV c)) - 1) AS t"
        )
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    percounts=st.lists(st.integers(0, 6), min_size=3, max_size=20).filter(
        lambda xs: sum(1 for x in xs if x > 0) >= 1
    ),
)
def test_burstiness_vmr_matches_fractions(spark, percounts):
    """The DECIMAL cross-multiplied VMR (N·Σx² − (Σx)²)·1e6 DIV (N·Σx)
    equals the Fraction-exact (E[x²]−E[x]²)/E[x] floored to ppm (zeros
    enter through N, never materialized)."""
    n = len(percounts)
    xs = [x for x in percounts if x > 0]
    sx, sx2 = sum(xs), sum(x * x for x in xs)
    want_frac = (
        Fraction(sx2, n) - Fraction(sx, n) ** 2
    ) / Fraction(sx, n)
    want = (want_frac.numerator * 1_000_000) // want_frac.denominator
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = (
        df.agg(
            F.expr(
                f"CAST((CAST({n} AS DECIMAL(38,0)) * SUM(x * x)"
                f" - CAST(SUM(x) AS DECIMAL(38,0)) * SUM(x)) * 1000000"
                f" DIV (CAST({n} AS DECIMAL(38,0)) * SUM(x)) AS BIGINT)"
            )
        ).collect()[0][0]
    )
    assert got == want
