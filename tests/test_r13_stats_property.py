"""Property pins for the r13 wave-7 statistics keys — brute-force
Python replays independent of the DuckDB oracle (the r11/r12
discipline): the distributed integer spellings must equal the textbook
definitions on arbitrary small inputs, under any partitioning.

Each test rebuilds the KEY'S exact expression pipeline over a
generated frame (the keys themselves read driver testdata, so the
pipeline is restated here verbatim) and compares against an exact
Python reference (ints / Fractions, truncating division where the
engines truncate)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F


def _tdiv(a: int, b: int) -> int:
    """Truncation-toward-zero integral division — Spark DIV / DuckDB
    // semantics (Python // floors negatives, so spell it out)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def _bits(x: int) -> int:
    """⌊log2 x⌋ for x ≥ 1 — the length(bin(x)) − 1 spelling."""
    return max(x, 1).bit_length() - 1


# ---------------------------------------------------------------------------
# Kendall tau-b: S, doubled tie terms, tau² ppm
# ---------------------------------------------------------------------------


def _kendall_brute(xs, ys):
    n = len(xs)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = (xs[j] > xs[i]) - (xs[j] < xs[i])
            dy = (ys[j] > ys[i]) - (ys[j] < ys[i])
            s += dx * dy
    n0_2 = n * (n - 1)

    def ties2(vs):
        from collections import Counter

        return sum(t * (t - 1) for t in Counter(vs).values())

    xt2, yt2 = ties2(xs), ties2(ys)
    den = max((n0_2 - xt2) * (n0_2 - yt2), 1)
    return s, n0_2, xt2, yt2, _tdiv(s * s * 4 * 1_000_000, den)


@settings(max_examples=8, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 9)),
        min_size=2,
        max_size=25,
    ),
)
def test_kendall_tau_spelling_matches_brute(spark, pairs):
    rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    day = spark.createDataFrame(
        rows, "_ds long, _x long, _y long"
    ).repartition(5)
    a, b = day.alias("a"), day.alias("b")
    s = a.join(b, F.col("a._ds") < F.col("b._ds")).agg(
        F.coalesce(
            F.sum(
                F.expr(
                    "CAST(SIGN(b._x - a._x) AS BIGINT)"
                    " * CAST(SIGN(b._y - a._y) AS BIGINT)"
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("_s")
    )
    n = day.agg(F.count("*").cast("long").alias("_n"))
    xt = day.groupBy("_x").agg(F.count("*").alias("_t")).agg(
        F.coalesce(
            F.sum(F.expr("CAST(_t AS DECIMAL(38,0)) * (_t - 1)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_xt2")
    )
    yt = day.groupBy("_y").agg(F.count("*").alias("_t")).agg(
        F.coalesce(
            F.sum(F.expr("CAST(_t AS DECIMAL(38,0)) * (_t - 1)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_yt2")
    )
    row = (
        s.crossJoin(n)
        .crossJoin(xt)
        .crossJoin(yt)
        .select(
            "_s",
            F.expr(
                "CAST(CAST(_n AS DECIMAL(38,0)) * (_n - 1) AS BIGINT)"
            ).alias("_n02"),
            F.expr("CAST(_xt2 AS BIGINT)").alias("_x2"),
            F.expr("CAST(_yt2 AS BIGINT)").alias("_y2"),
            F.expr(
                "CAST(CAST(_s AS DECIMAL(38,0)) * _s * 4 * 1000000"
                " DIV GREATEST("
                "(CAST(_n AS DECIMAL(38,0)) * (_n - 1) - _xt2)"
                " * (CAST(_n AS DECIMAL(38,0)) * (_n - 1) - _yt2), 1)"
                " AS BIGINT)"
            ).alias("_tau"),
        )
        .collect()[0]
    )
    xs = [a_ for a_, _ in pairs]
    ys = [b_ for _, b_ in pairs]
    assert (
        row["_s"], row["_n02"], row["_x2"], row["_y2"], row["_tau"]
    ) == _kendall_brute(xs, ys)


# ---------------------------------------------------------------------------
# CUSUM-argmax changepoint: D_k = |n·S_k − k·S_n|, earliest-tie argmax
# ---------------------------------------------------------------------------


def _changepoint_brute(xs):
    n, sn = len(xs), sum(xs)
    best = None
    sk = 0
    for k, x in enumerate(xs, start=1):
        sk += x
        dev = abs(n * sk - k * sn)
        if best is None or dev > best[0]:
            best = (dev, k)
    dev, k = best
    return k, n, dev, _tdiv(dev * 1_000_000, max(n * sn, 1))


@settings(max_examples=8, deadline=None)
@given(
    xs=st.lists(st.integers(0, 500), min_size=1, max_size=30),
)
def test_changepoint_spelling_matches_brute(spark, xs):
    rows = [("t", i, int(x)) for i, x in enumerate(xs)]
    day = spark.createDataFrame(
        rows, "f_type string, f_day long, _c long"
    ).repartition(4)
    w_ord = (
        Window.partitionBy("f_type")
        .orderBy("f_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("f_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scored = (
        day.withColumn(
            "f_k",
            F.row_number()
            .over(Window.partitionBy("f_type").orderBy("f_day"))
            .cast("long"),
        )
        .withColumn("_sk", F.sum("_c").over(w_ord))
        .withColumn("f_days", F.count("*").over(w_all).cast("long"))
        .withColumn("_sn", F.sum("_c").over(w_all))
        .withColumn(
            "f_dev",
            F.expr("ABS(f_days * _sk - f_k * _sn)").cast("long"),
        )
    )
    best = (
        scored.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("f_type").orderBy(
                    F.col("f_dev").desc(), F.col("f_day").asc()
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(
            "f_k",
            "f_days",
            "f_dev",
            F.expr(
                "CAST(CAST(f_dev AS DECIMAL(38,0)) * 1000000"
                " DIV GREATEST(CAST(f_days AS DECIMAL(38,0)) * _sn, 1)"
                " AS BIGINT)"
            ).alias("f_dev_ppm"),
        )
        .collect()[0]
    )
    assert (
        best["f_k"], best["f_days"], best["f_dev"], best["f_dev_ppm"]
    ) == _changepoint_brute(xs)


# ---------------------------------------------------------------------------
# Theil–Sen: pairwise integer slopes + interpolated quantiles
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 400), st.integers(-(10**6), 10**6)),
        min_size=2,
        max_size=25,
        unique_by=lambda p: p[0],
    ),
)
def test_theil_sen_slopes_match_brute(spark, pts):
    day = spark.createDataFrame(
        [(int(d), int(y)) for d, y in pts], "_d long, _y long"
    ).repartition(4)
    a, b = day.alias("a"), day.alias("b")
    slopes_df = a.join(b, F.col("a._d") < F.col("b._d")).select(
        F.expr(
            "CAST(CAST(b._y - a._y AS DECIMAL(38,0)) * 1000000"
            " DIV (b._d - a._d) AS BIGINT)"
        ).alias("_slope")
    )
    got = slopes_df.agg(
        F.count("*").cast("long").alias("n"),
        F.expr("percentile(_slope, 0.5)").alias("med"),
        F.min("_slope").alias("lo"),
        F.max("_slope").alias("hi"),
    ).collect()[0]
    srt = sorted(pts)
    brute = sorted(
        _tdiv((y2 - y1) * 1_000_000, d2 - d1)
        for i, (d1, y1) in enumerate(srt)
        for d2, y2 in srt[i + 1 :]
    )
    assert got["n"] == len(brute)
    assert got["lo"] == brute[0] and got["hi"] == brute[-1]
    m = len(brute)
    med = (
        float(brute[m // 2])
        if m % 2 == 1
        else (brute[m // 2 - 1] + brute[m // 2]) / 2.0
    )
    assert got["med"] == med


# ---------------------------------------------------------------------------
# Banded mutual information: octave-bits terms, signed trunc ppm
# ---------------------------------------------------------------------------


def _mi_brute(cells):
    from collections import Counter

    c = Counter(cells)
    n = sum(c.values())
    r = Counter()
    k = Counter()
    for (i, j), v in c.items():
        r[i] += v
        k[j] += v
    s = sum(
        v * (_bits(v * n) - _bits(r[i] * k[j]))
        for (i, j), v in c.items()
    )
    return n, len(c), _tdiv(s * 1_000_000, max(n, 1))


@settings(max_examples=8, deadline=None)
@given(
    cells=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 4)),
        min_size=1,
        max_size=60,
    ),
)
def test_mi_bits_spelling_matches_brute(spark, cells):
    df = spark.createDataFrame(
        [(i, j) for i, j in cells], "_et long, _wd long"
    ).repartition(4)
    cell = df.groupBy("_et", "_wd").agg(
        F.count("*").cast("long").alias("_c")
    )
    rtot = cell.groupBy("_et").agg(F.sum("_c").cast("long").alias("_r"))
    ctot = cell.groupBy("_wd").agg(F.sum("_c").cast("long").alias("_k"))
    tot = cell.agg(
        F.sum("_c").cast("long").alias("_n"),
        F.count("*").cast("long").alias("_cells"),
    )
    term = (
        cell.join(rtot, "_et")
        .join(ctot, "_wd")
        .crossJoin(tot)
        .select(
            F.expr(
                "CAST(_c AS DECIMAL(38,0))"
                " * CAST((length(bin(GREATEST(_c * _n, 1))) - 1)"
                "      - (length(bin(GREATEST(_r * _k, 1))) - 1)"
                "   AS DECIMAL(38,0))"
            ).alias("_t")
        )
    )
    got = (
        term.agg(F.sum("_t").alias("_S"))
        .crossJoin(tot)
        .select(
            "_n",
            "_cells",
            F.expr(
                "CAST(_S * 1000000 DIV GREATEST(_n, 1) AS BIGINT)"
            ).alias("_ppm"),
        )
        .collect()[0]
    )
    n, ncells, ppm = _mi_brute(cells)
    assert (got["_n"], got["_cells"], got["_ppm"]) == (n, ncells, ppm)


# ---------------------------------------------------------------------------
# Lorenz deciles: NTILE bucketing + cumulative share ppm
# ---------------------------------------------------------------------------


def _lorenz_brute(spends, nt=10):
    order = sorted(range(len(spends)), key=lambda i: (spends[i], i))
    total = len(order)
    q, r = divmod(total, nt)
    out = []
    pos = 0
    tot_cents = sum(spends)
    cum = 0
    for b in range(1, nt + 1):
        size = q + 1 if b <= r else q
        if size == 0:
            continue
        chunk = order[pos : pos + size]
        pos += size
        cents = sum(spends[i] for i in chunk)
        cum += cents
        out.append(
            (b, size, cents, cum, _tdiv(cum * 1_000_000, max(tot_cents, 1)))
        )
    return out


@settings(max_examples=6, deadline=None)
@given(
    spends=st.lists(st.integers(0, 10**6), min_size=1, max_size=40),
)
def test_lorenz_deciles_match_brute(spark, spends):
    from dbt_snowflake_feature_store_spark.functions.ranks import (
        global_ntile,
    )

    rows = [(i, int(v)) for i, v in enumerate(spends)]
    spend = spark.createDataFrame(
        rows, "o_custkey long, _cents long"
    ).repartition(5)
    b = global_ntile(
        spend, ["_cents", "o_custkey"], 10, out_col="f_decile",
        num_partitions=3,
    )
    per = b.groupBy("f_decile").agg(
        F.count("*").cast("long").alias("f_n"),
        F.sum(F.col("_cents").cast("decimal(38,0)")).alias("_dc"),
    )
    w_cum = Window.orderBy("f_decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.orderBy("f_decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    got = [
        tuple(r)
        for r in per.withColumn("_cum", F.sum("_dc").over(w_cum))
        .withColumn("_tot", F.sum("_dc").over(w_tot))
        .select(
            "f_decile",
            "f_n",
            F.expr("CAST(_dc AS BIGINT)").alias("f_cents"),
            F.expr("CAST(_cum AS BIGINT)").alias("f_cum"),
            F.expr(
                "CAST(_cum * 1000000 DIV GREATEST(_tot, 1) AS BIGINT)"
            ).alias("f_ppm"),
        )
        .orderBy("f_decile")
        .collect()
    ]
    assert got == _lorenz_brute(list(spends))
