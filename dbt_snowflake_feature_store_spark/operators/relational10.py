"""Relational query surface, part 10 — round-13 wave 7 (statistics).

Same contract as ``relational.py``..``relational9.py``: DataFrame-first
Spark implementations with DuckDB oracle twins (identical aliases both
sides, exact integer/decimal arithmetic, deterministic output). This
wave rounds out the trend/association family q_trend_mk and
q_spearman_corr started:

- ``q_kendall_tau``     — Kendall's tau-b rank association between the
  daily order count and daily revenue (tie-corrected, exact integers).
- ``q_changepoint``     — per-event-type CUSUM-argmax changepoint day
  over the daily count series (the offline companion to the maintained
  q_cusum_drift monitor).
- ``q_theil_sen``       — the robust Theil–Sen trend slope: the median
  of all pairwise day-slopes of daily revenue.
- ``q_lorenz_deciles``  — the Lorenz concentration curve at decile
  grain over per-customer spend (the curve behind q_gini_spend's
  single coefficient).

Reference frame: the reference's feature-view bodies are arbitrary
SELECTs over sources (/root/reference/macros/materializations/
feature_view.sql:126); these keys pin the monitoring statistics an FV
author computes over order/event streams.

Cross-engine exactness: all pairwise statistics ride the
DECIMAL(38,0)/HUGEINT cross-multiplication discipline (q_trend_mk
precedent — square roots and divisions never cross the engine boundary
except as integral DIV ppm ratios); interpolated quantiles use Spark
``percentile`` ≡ DuckDB ``quantile_cont`` over integer inputs (pinned
bit-exact in NOTES r13); negative integral division truncates toward
zero identically (probed r13 for q_ols_slope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.tables import read_table

    return read_table(spark, sf_dir, name)


def _ckpt(df: DataFrame) -> DataFrame:
    """Register-then-checkpoint (the relational5/6/7 discipline)."""
    from ..plans import inspect as plan_inspect

    plan_inspect.register_subplan(df)
    return df.localCheckpoint(eager=False)


# ---------------------------------------------------------------------------
# Kendall's tau-b — rank association with tie correction
# ---------------------------------------------------------------------------


def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL'S TAU-B between the daily order COUNT and daily REVENUE
    series, ORACLE-GATED — the concordance companion to
    q_spearman_corr (rank correlation via ranks) and q_trend_mk
    (Kendall S against time itself): do high-count days and
    high-revenue days agree in ORDER, robust to outliers and ties?

    Exactness: S = Σ_{i<j} sign(x_j−x_i)·sign(y_j−y_i) is an exact
    integer; tie terms ride DOUBLED so no /2 ever divides —
    f_pairs2 = n(n−1), f_xt2 = Σ_t t(t−1) over x-tie groups, f_yt2
    likewise, and tau_b² = 4·S² / ((n(n−1)−Σtx)(n(n−1)−Σty)) is
    reported as f_tau2_ppm = S²·4·10⁶ DIV (…) with f_sign = SIGN(S)
    (the q_trend_mk sign/ratio spelling — square roots never cross
    the engine boundary). S²·4·10⁶ exceeds int64 at calendar scale ⇒
    DECIMAL(38,0)/HUGEINT cross-multiplication; the final ppm ≤ 10⁶
    casts back to BIGINT. Magnitude bound: n ≈ 2.4k days at ANY SF
    (the order calendar is fixed), so S² ≤ 8.5e12 and the DECIMAL
    numerator ≤ 3.4e19 < 10³⁸.

    Scale: the day frame is CALENDAR-BOUNDED, so the i<j pair join is
    a broadcast-nested-loop over a reduced bounded side — n² of a
    constant; the corpus cost is one map-side-combinable day
    aggregate."""
    o = _t(spark, sf_dir, "orders")
    day = _ckpt(
        o.groupBy(
            F.expr(
                "CAST(unix_timestamp(date_trunc('day', o_orderdate))"
                " AS BIGINT)"
            ).alias("_ds")
        ).agg(
            F.count("*").cast("long").alias("_x"),
            F.sum(
                F.expr(
                    "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
                )
            ).cast("long").alias("_y"),
        )
    )
    a, b = day.alias("a"), day.alias("b")
    s = a.join(b, F.col("a._ds") < F.col("b._ds")).agg(
        F.sum(
            F.expr(
                "CAST(SIGN(b._x - a._x) AS BIGINT)"
                " * CAST(SIGN(b._y - a._y) AS BIGINT)"
            )
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
    return (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(xt))
        .crossJoin(F.broadcast(yt))
        .select(
            F.col("_n").alias("f_days"),
            F.col("_s").alias("f_s"),
            F.expr("CAST(SIGN(_s) AS BIGINT)").alias("f_sign"),
            F.expr(
                "CAST(CAST(_n AS DECIMAL(38,0)) * (_n - 1) AS BIGINT)"
            ).alias("f_pairs2"),
            F.expr("CAST(_xt2 AS BIGINT)").alias("f_xt2"),
            F.expr("CAST(_yt2 AS BIGINT)").alias("f_yt2"),
            F.expr(
                "CAST(CAST(_s AS DECIMAL(38,0)) * _s * 4 * 1000000"
                " DIV GREATEST("
                "(CAST(_n AS DECIMAL(38,0)) * (_n - 1) - _xt2)"
                " * (CAST(_n AS DECIMAL(38,0)) * (_n - 1) - _yt2), 1)"
                " AS BIGINT)"
            ).alias("f_tau2_ppm"),
        )
    )


ORACLE["q_kendall_tau"] = """
    WITH day AS (
        SELECT CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT)
                   AS _ds,
               CAST(COUNT(*) AS BIGINT) AS _x,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS _y
        FROM orders GROUP BY 1
    ),
    s AS (
        SELECT CAST(SUM(CAST(SIGN(b._x - a._x) AS BIGINT)
                        * CAST(SIGN(b._y - a._y) AS BIGINT)) AS BIGINT)
                   AS _s
        FROM day a JOIN day b ON a._ds < b._ds
    ),
    n AS (SELECT CAST(COUNT(*) AS HUGEINT) AS _n FROM day),
    xt AS (
        SELECT COALESCE(CAST(SUM(t * (t - 1)) AS HUGEINT), 0) AS _xt2
        FROM (SELECT CAST(COUNT(*) AS HUGEINT) AS t FROM day GROUP BY _x)
    ),
    yt AS (
        SELECT COALESCE(CAST(SUM(t * (t - 1)) AS HUGEINT), 0) AS _yt2
        FROM (SELECT CAST(COUNT(*) AS HUGEINT) AS t FROM day GROUP BY _y)
    )
    SELECT CAST(_n AS BIGINT) AS f_days,
           _s AS f_s,
           CAST(SIGN(_s) AS BIGINT) AS f_sign,
           CAST(_n * (_n - 1) AS BIGINT) AS f_pairs2,
           CAST(_xt2 AS BIGINT) AS f_xt2,
           CAST(_yt2 AS BIGINT) AS f_yt2,
           CAST(CAST(_s AS HUGEINT) * _s * 4 * 1000000
                // GREATEST((_n * (_n - 1) - _xt2)
                            * (_n * (_n - 1) - _yt2), 1)
                AS BIGINT) AS f_tau2_ppm
    FROM s, n, xt, yt
"""
QUERIES["q_kendall_tau"] = q_kendall_tau


# ---------------------------------------------------------------------------
# CUSUM-argmax changepoint detection
# ---------------------------------------------------------------------------


def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-EVENT-TYPE CHANGEPOINT DAY via the CUSUM argmax, ORACLE-GATED
    — the offline answer to "WHEN did this stream's rate shift?", the
    localization companion to q_cusum_drift's maintained "did it
    shift?" score: over each type's daily-count series, the candidate
    split k maximizing the scaled deviation between the prefix rate and
    the overall rate. Cross-multiplied to stay integral —
    D_k = |n·S_k − k·S_n| (S_k = prefix count through day k, S_n =
    total, n = day count) — the (x·n − Σ)-style division-deferral; the
    best day reports D and D·10⁶ DIV (n·S_n) (the normalized deviation
    in ppm of the max possible). Ties break to the EARLIEST day.
    Magnitude bound: with T daily events at SF100 (T ≈ 10¹² overall),
    n·S_k ≤ 31·T fits int64 to T ≈ 3e17; the ppm numerator rides
    DECIMAL(38,0)/HUGEINT.

    Scale: the per-type day frame is calendar×types-bounded; all
    windows partition by event_type over that bounded frame. The
    corpus cost is one map-side-combinable (type, day) aggregate."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    day = _ckpt(
        ev.groupBy(
            F.col("event_type").alias("f_type"),
            F.date_trunc("day", F.col("ts")).alias("f_day"),
        ).agg(F.count("*").cast("long").alias("_c"))
    )
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
            F.row_number().over(
                Window.partitionBy("f_type").orderBy("f_day")
            ).cast("long"),
        )
        .withColumn("_sk", F.sum("_c").over(w_ord))
        .withColumn("f_days", F.count("*").over(w_all).cast("long"))
        .withColumn("_sn", F.sum("_c").over(w_all))
        .withColumn(
            "f_dev",
            F.expr("ABS(f_days * _sk - f_k * _sn)").cast("long"),
        )
    )
    best = scored.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("f_type").orderBy(
                F.col("f_dev").desc(), F.col("f_day").asc()
            )
        ),
    ).filter(F.col("_rn") == 1)
    return best.select(
        "f_type",
        "f_day",
        "f_k",
        "f_days",
        "f_dev",
        F.expr(
            "CAST(CAST(f_dev AS DECIMAL(38,0)) * 1000000"
            " DIV GREATEST(CAST(f_days AS DECIMAL(38,0)) * _sn, 1)"
            " AS BIGINT)"
        ).alias("f_dev_ppm"),
    ).orderBy("f_type")


ORACLE["q_changepoint"] = """
    WITH day AS (
        SELECT event_type AS f_type,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS f_day,
               CAST(COUNT(*) AS BIGINT) AS _c
        FROM events
        WHERE ts IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT f_type, f_day,
               CAST(ROW_NUMBER() OVER (PARTITION BY f_type
                    ORDER BY f_day) AS BIGINT) AS f_k,
               SUM(_c) OVER (PARTITION BY f_type ORDER BY f_day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS _sk,
               CAST(COUNT(*) OVER (PARTITION BY f_type) AS BIGINT)
                    AS f_days,
               SUM(_c) OVER (PARTITION BY f_type) AS _sn
        FROM day
    ),
    dev AS (
        SELECT f_type, f_day, f_k, f_days,
               CAST(ABS(f_days * _sk - f_k * _sn) AS BIGINT) AS f_dev,
               CAST(CAST(ABS(f_days * _sk - f_k * _sn) AS HUGEINT)
                    * 1000000
                    // GREATEST(CAST(f_days AS HUGEINT) * _sn, 1)
                    AS BIGINT) AS f_dev_ppm,
               ROW_NUMBER() OVER (PARTITION BY f_type
                    ORDER BY ABS(f_days * _sk - f_k * _sn) DESC,
                             f_day ASC) AS _rn
        FROM scored
    )
    SELECT f_type, f_day, f_k, f_days, f_dev, f_dev_ppm
    FROM dev WHERE _rn = 1
    ORDER BY f_type
"""
QUERIES["q_changepoint"] = q_changepoint


# ---------------------------------------------------------------------------
# Theil–Sen robust trend slope
# ---------------------------------------------------------------------------


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL–SEN ROBUST TREND SLOPE of daily order revenue,
    ORACLE-GATED — the outlier-resistant companion to q_ols_slope's
    least-squares line and q_trend_mk's trend direction: the MEDIAN of
    all pairwise slopes (y_j−y_i)/(d_j−d_i) over the daily revenue
    series. Each pairwise slope is computed as an exact integer in
    cents·10⁶ per day — (y_j−y_i)·10⁶ DIV (d_j−d_i) over whole-day
    x-coordinates (epoch DIV 86400) — negative numerators truncate
    toward zero identically in Spark DIV and DuckDB // (probed r13);
    the median/p10/p90 of those integers interpolate bit-identically
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont`` over integer
    inputs, pinned r13). Magnitude bound: daily revenue cents < 10¹⁵
    even at SF100 ⇒ the ·10⁶ cross-multiplication rides
    DECIMAL(38,0)/HUGEINT and each slope fits BIGINT.

    The series is the 1996 calendar year (the q_join_interval_keyless
    year-window precedent): Theil–Sen is an annual-trend estimator
    here, and the bound keeps the EXACT-percentile buffer (which must
    hold every pairwise slope) at ~67k values — n(n−1)/2 of 366 days —
    instead of 2.9M for the full 7-year calendar; all three quantiles
    ride ONE array-percentile aggregate, one buffer not three.

    Scale: the day frame is CALENDAR-BOUNDED; the i<j pair join is a
    broadcast-nested-loop over a reduced bounded side (n² of a
    constant at any SF); the percentile is one partial-merge
    aggregate — the corpus never joins itself."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    day = _ckpt(
        o.groupBy(
            F.expr(
                "CAST(unix_timestamp(date_trunc('day', o_orderdate))"
                " AS BIGINT) DIV 86400"
            ).alias("_d")
        ).agg(
            F.sum(
                F.expr(
                    "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
                )
            ).cast("long").alias("_y")
        )
    )
    a, b = day.alias("a"), day.alias("b")
    slopes = a.join(b, F.col("a._d") < F.col("b._d")).select(
        F.expr(
            "CAST(CAST(b._y - a._y AS DECIMAL(38,0)) * 1000000"
            " DIV (b._d - a._d) AS BIGINT)"
        ).alias("_slope")
    )
    return slopes.agg(
        F.count("*").cast("long").alias("f_pairs"),
        F.expr("percentile(_slope, array(0.1, 0.5, 0.9))").alias("_q"),
        F.min("_slope").alias("f_slope_min"),
        F.max("_slope").alias("f_slope_max"),
    ).select(
        "f_pairs",
        F.expr("_q[1]").alias("f_slope_med"),
        F.expr("_q[0]").alias("f_slope_p10"),
        F.expr("_q[2]").alias("f_slope_p90"),
        "f_slope_min",
        "f_slope_max",
    )


ORACLE["q_theil_sen"] = """
    WITH day AS (
        SELECT CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT)
                   // 86400 AS _d,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS _y
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
    ),
    slopes AS (
        SELECT CAST(CAST(b._y - a._y AS HUGEINT) * 1000000
                    // (b._d - a._d) AS BIGINT) AS _slope
        FROM day a JOIN day b ON a._d < b._d
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS f_pairs,
           quantile_cont(_slope, 0.5) AS f_slope_med,
           quantile_cont(_slope, 0.1) AS f_slope_p10,
           quantile_cont(_slope, 0.9) AS f_slope_p90,
           MIN(_slope) AS f_slope_min,
           MAX(_slope) AS f_slope_max
    FROM slopes
"""
QUERIES["q_theil_sen"] = q_theil_sen


# ---------------------------------------------------------------------------
# Lorenz concentration curve at decile grain
# ---------------------------------------------------------------------------


def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LORENZ CONCENTRATION CURVE at DECILE grain over per-customer
    spend, ORACLE-GATED — the curve behind q_gini_spend's single
    coefficient: customers ranked by total spend split into ten exact
    NTILE buckets, each reporting its customer count, spend, running
    cumulative spend, and cumulative share of total in ppm ("the
    bottom 60% of customers hold X% of revenue" — the skew statement a
    data-mix planner acts on).

    Exactness: spend rides integer cents; deciles come from
    functions/ranks.global_ntile (exact SQL NTILE semantics — the
    first total%10 buckets take the extra row — WITHOUT an
    unpartitioned data-sized window; q_global_ntile precedent, plan
    pinned in test_scale_plans.py); the cumulative share is
    cum·10⁶ DIV total on DECIMAL(38,0)/HUGEINT (total cents at SF100
    ≈ 2e17 ⇒ the ·10⁶ product needs >int64).

    Scale: one hash aggregate to the per-customer frame, the ranks.py
    range-exchange for the global order, then a second 10-group
    aggregate; the ONLY unpartitioned window runs over the TEN-row
    decile frame — bounded by construction (q_vocab_build
    precedent)."""
    from ..functions.ranks import global_ntile

    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(
            F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
        ).cast("long").alias("_cents")
    )
    b = global_ntile(spend, ["_cents", "o_custkey"], 10, out_col="f_decile")
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
    # both windows run over the 10-row decile frame — bounded by
    # construction, never data-sized
    return (
        per.withColumn("_cum", F.sum("_dc").over(w_cum))
        .withColumn("_tot", F.sum("_dc").over(w_tot))
        .select(
            "f_decile",
            "f_n",
            F.expr("CAST(_dc AS BIGINT)").alias("f_cents"),
            F.expr("CAST(_cum AS BIGINT)").alias("f_cum_cents"),
            F.expr(
                "CAST(_cum * 1000000 DIV GREATEST(_tot, 1) AS BIGINT)"
            ).alias("f_share_ppm"),
        )
        .orderBy("f_decile")
    )


ORACLE["q_lorenz_deciles"] = """
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS _cents
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT _cents,
               CAST(NTILE(10) OVER (ORDER BY _cents, o_custkey)
                    AS BIGINT) AS f_decile
        FROM spend
    ),
    per AS (
        SELECT f_decile,
               CAST(COUNT(*) AS BIGINT) AS f_n,
               CAST(SUM(_cents) AS HUGEINT) AS _dc
        FROM ranked GROUP BY 1
    )
    SELECT f_decile, f_n,
           CAST(_dc AS BIGINT) AS f_cents,
           CAST(SUM(_dc) OVER (ORDER BY f_decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS f_cum_cents,
           CAST(SUM(_dc) OVER (ORDER BY f_decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                * 1000000
                // GREATEST(SUM(_dc) OVER (), 1)
                AS BIGINT) AS f_share_ppm
    FROM per
    ORDER BY f_decile
"""
QUERIES["q_lorenz_deciles"] = q_lorenz_deciles


# ---------------------------------------------------------------------------
# Banded mutual information (event type × weekday)
# ---------------------------------------------------------------------------


def q_mi_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BANDED MUTUAL INFORMATION between event type and weekday,
    ORACLE-GATED — the information-theoretic member of the association
    family (q_chi2_assoc quadratic, q_cramers_v normalized, q_psi_bits
    one-variable stability): how much does KNOWING the weekday tell
    you about the event-type mix? The classical Σ p·ln(p/(p_r·p_c))
    needs IEEE ln, so the log factor rides the integer OCTAVE-BITS
    spelling (⌊log2 x⌋ = length(bin(x)) − 1 — the q_psi_bits /
    q_entropy_mix trick): per cell,
    t = c_ij · (⌊log2(c_ij·N)⌋ − ⌊log2(r_i·c_j)⌋), summed and reported
    as f_mi_bits_ppm = Σt·10⁶ DIV N (signed — banding can push a
    near-independent cell's term negative, unlike real MI; the
    docstring contract is the BANDED statistic, bit-stable across
    engines). Weekday is pure integer arithmetic ((epoch_day + 3) % 7,
    Monday = 0) — never an engine dayofweek() convention. The c·N /
    r·c products stay BIGINT-safe to ~3·10⁹ events (the q_psi_bits
    bound; document the DECIMAL widening past that).

    Scale: ONE map-side-combinable (type, weekday) corpus aggregate
    onto a ~5×7 cell domain; marginals and terms are broadcast joins
    over that bounded frame."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    cell = _ckpt(
        ev.groupBy(
            F.col("event_type").alias("_et"),
            F.expr(
                "(CAST(unix_timestamp(date_trunc('day', ts)) AS BIGINT)"
                " DIV 86400 + 3) % 7"
            ).alias("_wd"),
        ).agg(F.count("*").cast("long").alias("_c"))
    )
    rtot = cell.groupBy("_et").agg(F.sum("_c").cast("long").alias("_r"))
    ctot = cell.groupBy("_wd").agg(F.sum("_c").cast("long").alias("_k"))
    tot = cell.agg(
        F.sum("_c").cast("long").alias("_n"),
        F.count("*").cast("long").alias("_cells"),
    )
    term = (
        cell.join(F.broadcast(rtot), "_et")
        .join(F.broadcast(ctot), "_wd")
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "CAST(_c AS DECIMAL(38,0))"
                " * CAST((length(bin(GREATEST(_c * _n, 1))) - 1)"
                "      - (length(bin(GREATEST(_r * _k, 1))) - 1)"
                "   AS DECIMAL(38,0))"
            ).alias("_t")
        )
    )
    s = term.agg(F.sum("_t").alias("_S"))
    nr = rtot.agg(F.count("*").cast("long").alias("f_rows"))
    nc = ctot.agg(F.count("*").cast("long").alias("f_cols"))
    return (
        s.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nc))
        .select(
            F.col("_n").alias("f_n"),
            "f_rows",
            "f_cols",
            F.col("_cells").alias("f_cells"),
            F.expr(
                "CAST(_S * 1000000 DIV GREATEST(_n, 1) AS BIGINT)"
            ).alias("f_mi_bits_ppm"),
        )
    )


ORACLE["q_mi_bits"] = """
    WITH cell AS (
        SELECT event_type AS _et,
               (CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT)
                // 86400 + 3) % 7 AS _wd,
               CAST(COUNT(*) AS BIGINT) AS _c
        FROM events
        WHERE ts IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2
    ),
    rtot AS (
        SELECT _et, CAST(SUM(_c) AS BIGINT) AS _r FROM cell GROUP BY 1
    ),
    ctot AS (
        SELECT _wd, CAST(SUM(_c) AS BIGINT) AS _k FROM cell GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(_c) AS BIGINT) AS _n,
               CAST(COUNT(*) AS BIGINT) AS _cells
        FROM cell
    ),
    s AS (
        SELECT SUM(
                   CAST(_c AS HUGEINT)
                   * (CAST(length(bin(GREATEST(_c * _n, 1))) AS HUGEINT)
                      - CAST(length(bin(GREATEST(_r * _k, 1)))
                             AS HUGEINT))
               ) AS _S
        FROM cell
        JOIN rtot USING (_et)
        JOIN ctot USING (_wd)
        CROSS JOIN tot
    ),
    nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS f_rows FROM rtot),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS f_cols FROM ctot)
    SELECT _n AS f_n, f_rows, f_cols, _cells AS f_cells,
           CAST(_S * 1000000 // GREATEST(_n, 1) AS BIGINT)
               AS f_mi_bits_ppm
    FROM s, tot, nr, nc
"""
QUERIES["q_mi_bits"] = q_mi_bits
