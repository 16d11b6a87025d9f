"""Relational query surface, part 2 — additional SURVEY.md §2.B closure keys.

Same contract as ``relational.py``: each key is a DataFrame-first Spark
implementation with a DuckDB oracle twin, deterministic under the driver's
order-insensitive value-hash (identical aliases both sides, decimal-exact
double aggregation, full ORDER BY tiebreaks where row identity matters).

These keys extend coverage to constructs the reference's arbitrary-SELECT
feature-view bodies (/root/reference/macros/materializations/feature_view.sql:126,
:192) imply but round-1 part 1 did not yet declare: native session windows,
GROUPING SETS, window navigation functions, exact moment statistics
(variance/stddev/correlation), NULL semantics, array aggregation, numeric
scalar functions, and the TPC-H Q13 left-join count-distribution shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_DEC = "decimal(28,6)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.tables import read_table

    return read_table(spark, sf_dir, name)


def _dsum(col, alias: str):
    return F.sum(col.cast(_DEC)).cast("double").alias(alias)


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (F.session_window, 30-minute gap) per user —
    the Structured-Streaming-compatible form of q_sessionize: the exact
    same groupBy works under readStream with a watermark (streaming/
    incremental.py). Session end = last event + gap (Spark semantics; an
    event at exactly gap distance starts a NEW session — the oracle's
    gaps-and-islands uses >= gap accordingly).
    Scale: one shuffle on user_id; sessions merge map-side first."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("f_events"),
            _dsum(F.col("value"), "f_value_sum"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("f_session_start"),
            F.col("session_window.end").alias("f_session_end"),
            "f_events",
            "f_value_sum",
        )
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form of rollup/cube (q_rollup covers the
    hierarchy special case). grouping() arithmetic disambiguates subtotal
    rows from genuine NULL groups. Single expand + one hash aggregate."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_q2_orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS f_count,
               CAST(SUM(CAST(o_totalprice AS {_DEC})) AS DOUBLE) AS f_spend,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                    AS BIGINT) AS f_grouping
        FROM _q2_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )


def q_window_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window navigation: lag/lead/first/last + ntile/percent_rank/
    cume_dist per customer order history. Full (date, orderkey) ordering
    makes every rank deterministic. One shuffle on o_custkey; all seven
    functions share the same sort (single window exec)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_totalprice").over(w).alias("f_prev_price"),
        F.lead("o_totalprice").over(w).alias("f_next_price"),
        F.first("o_orderdate").over(w).alias("f_first_date"),
        F.last("o_orderkey").over(wfull).alias("f_last_key"),
        F.ntile(4).over(w).cast("long").alias("f_quartile"),
        F.percent_rank().over(w).alias("f_pct_rank"),
        F.cume_dist().over(w).alias("f_cume"),
    )


# shared SQL body for q_stats_moments: the EXACT same expression tree runs
# in Spark SQL and DuckDB (only the table identifier differs), so the
# double arithmetic after the exact sufficient statistics is bit-identical
# (IEEE ops in identical association order). The inputs are 2-decimal-place
# doubles, so ROUND(x*100) is an exact integer-valued double; all products
# and sums then happen in exact integer decimals (no double→decimal
# rounding, which differs between engines in the last micro-unit), and are
# descaled to doubles once at the end.
_MOMENTS_SQL = """
    WITH c AS (
        SELECT l_returnflag,
               CAST(ROUND(l_quantity * 100) AS DECIMAL(18,0)) AS xc,
               CAST(ROUND(l_extendedprice * 100) AS DECIMAL(18,0)) AS yc
        FROM {lineitem}
    ),
    s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(xc) AS DOUBLE) / 100 AS sx,
               CAST(SUM(xc * xc) AS DOUBLE) / 10000 AS sxx,
               CAST(SUM(yc) AS DOUBLE) / 100 AS sy,
               CAST(SUM(yc * yc) AS DOUBLE) / 10000 AS syy,
               CAST(SUM(xc * yc) AS DOUBLE) / 10000 AS sxy
        FROM c
        GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS f_n,
           sx / n AS f_mean_qty,
           (sxx - sx * sx / n) / (n - 1) AS f_var_qty,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS f_std_qty,
           (sxy - sx * sy / n)
               / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
               AS f_corr_qty_price
    FROM s
"""


def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact moment statistics per group — variance, stddev, Pearson
    correlation — via decimal-exact sufficient statistics (n, Σx, Σx²,
    Σxy). Spark's var_samp/corr accumulate doubles in partition order
    (nondeterministic low bits at scale); the sufficient-statistics form
    is order-independent AND a single hash aggregate (same shuffle count),
    which is also the mergeable form incremental refresh needs.
    Scale: one shuffle on the tiny returnflag key; everything map-side."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_q2_lineitem")
    return spark.sql(_MOMENTS_SQL.format(lineitem="_q2_lineitem"))


def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics end-to-end: NULLIF/CASE null injection, COUNT(col)
    vs COUNT(*), COALESCE in aggregation, distinct-over-nulls, null
    fraction. The canonical data-quality profile for a feature column."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderpriority",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("n_status"),
        F.when(F.col("o_totalprice") < 50000.0, F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice"))
        .alias("n_price"),
    )
    return base.groupBy("o_orderpriority").agg(
        F.count("*").alias("f_rows"),
        F.count("n_status").alias("f_status_nonnull"),
        (F.count("*") - F.count("n_price")).alias("f_price_nulls"),
        _dsum(F.coalesce(F.col("n_price"), F.lit(0.0)), "f_price_or_zero"),
        ((F.count("*") - F.count("n_price")).cast("double") / F.count("*")).alias(
            "f_null_frac"
        ),
        F.countDistinct("n_status").alias("f_distinct_status"),
    )


def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + array functions: collect → sort → join/distinct/
    element_at. Output is scalar columns (joined string, sizes) so the
    hash-compare stays type-stable. Scale: collect_list is bounded by
    per-key cardinality (orders per customer), never global."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_list("o_orderpriority")), ",").alias(
            "f_prio_list"
        ),
        F.count("*").alias("f_n_orders"),
        F.size(F.array_distinct(F.collect_list("o_orderpriority")))
        .cast("long")
        .alias("f_n_distinct_prio"),
        F.element_at(F.array_sort(F.collect_list("o_orderstatus")), 1).alias(
            "f_min_status"
        ),
    )


def q_num_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric scalar functions: floor/ceil/abs/sign/sqrt/power/greatest/
    least. All IEEE-exact on these inputs (sqrt is correctly rounded;
    power has an exact small-integer base). Pure per-row codegen — no
    shuffle."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.floor(F.col("p_retailprice")).cast("double").alias("f_floor"),
        F.ceil(F.col("p_retailprice")).cast("double").alias("f_ceil"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("f_abs_delta"),
        F.signum((F.col("p_size") - 25).cast("double")).alias("f_sign"),
        F.sqrt(F.col("p_retailprice")).alias("f_sqrt"),
        F.pow(F.col("p_size").cast("double"), F.lit(2.0)).alias("f_size_sq"),
        F.greatest(F.col("p_retailprice"), F.lit(1000.0)).alias("f_hi"),
        F.least(F.col("p_retailprice"), F.lit(1000.0)).alias("f_lo"),
    )


def q_tpch_q13like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution via left join
    with a join-level filter (not a WHERE — preserves zero-order
    customers), double aggregation. Scale: join shuffles on custkey, the
    second agg's key (c_count) is tiny; AQE coalesces it."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregated views (customers with open vs
    filled orders) — keys existing on either side survive with nulls on
    the other. Both inputs aggregate on the join key first, so the outer
    join reuses the agg's hash partitioning (no extra exchange)."""
    o = _t(spark, sf_dir, "orders")
    open_spend = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(_dsum(F.col("o_totalprice"), "f_open_spend"))
    )
    filled_spend = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("f_custkey"))
        .agg(_dsum(F.col("o_totalprice"), "f_filled_spend"))
    )
    joined = open_spend.join(
        filled_spend,
        open_spend.o_custkey == filled_spend.f_custkey,
        "full_outer",
    )
    return joined.select(
        F.coalesce(F.col("o_custkey"), F.col("f_custkey")).alias("custkey"),
        "f_open_spend",
        "f_filled_spend",
    )


def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimension CROSS JOIN (region × distinct order status): the
    scaffold grid for dense feature matrices (every key × every bucket
    before a left join fills observed values). Both sides tiny →
    BroadcastNestedLoopJoin, never a shuffled cartesian."""
    r = _t(spark, sf_dir, "region")
    o = _t(spark, sf_dir, "orders")
    statuses = o.select("o_orderstatus").distinct()
    return r.select("r_name").crossJoin(statuses).select(
        "r_name", F.col("o_orderstatus").alias("f_status")
    )


_Q17_SQL = """
    WITH avgs AS (
        SELECT l_partkey,
               0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                      / COUNT(l_quantity)) AS qty_threshold
        FROM {lineitem}
        GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
               / 7.0 AS avg_yearly,
           COUNT(*) AS n_small_qty_rows
    FROM {lineitem} l
    JOIN {part} p ON p.p_partkey = l.l_partkey
    JOIN avgs a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < a.qty_threshold
"""


def q_tpch_q17like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity revenue against a per-part
    correlated average (written as the decorrelated join Catalyst would
    produce, identically on both engines so the threshold doubles are
    bit-equal). Scale: the per-part average is a map-side-combinable agg
    sharing the lineitem scan partitioning; the brand filter prunes part
    before the join (broadcast-able dim)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_q2_li17")
    _t(spark, sf_dir, "part").createOrReplaceTempView("_q2_part17")
    return spark.sql(_Q17_SQL.format(lineitem="_q2_li17", part="_q2_part17"))


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 maintenance through ``functions.merge.scd2_apply``:
    current = each user's FIRST event as the open version; updates =
    each user's LAST event. Apply closes the old version at the update
    time and appends the new open version — the dimension-history
    pattern INCREMENTAL feature views imply. Deterministic: first/last
    rows picked with (ts, event_id) tiebreaks. One shuffle on the key."""
    from ..functions.merge import scd2_apply

    ev = _t(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_last = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    first_ev = (
        ev.withColumn("rn", F.row_number().over(w_first))
        .filter("rn = 1")
        .select(
            "user_id",
            F.col("value").alias("f_value"),
            F.col("ts").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
        )
    )
    last_ev = (
        ev.withColumn("rn", F.row_number().over(w_last))
        .filter("rn = 1")
        .select("user_id", F.col("value").alias("f_value"), "ts")
    )
    return scd2_apply(first_ev, last_ev, keys=["user_id"], ts_col="ts")


def q_scd2_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 with MULTIPLE updates per key in one batch: each user's 2nd
    and 3rd events (collapsed to one row per (user_id, ts) so the chain
    order is engine-deterministic without the xxhash tiebreak) are
    applied against the first-event open version. Hash-checks the
    lead()-chained validity path in ``functions.merge.scd2_apply`` —
    each new version's valid_to is the NEXT update's ts, only the last
    stays open — which q_scd2_history's one-update fixture never
    exercises. One shuffle on the key."""
    from ..functions.merge import scd2_apply

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    ranked = ev.withColumn("rn", F.row_number().over(w))
    current = ranked.filter("rn = 1").select(
        "user_id",
        F.col("value").alias("f_value"),
        F.col("ts").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    updates = (
        ranked.filter(F.col("rn").isin(2, 3))
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("f_value"))
        .select("user_id", "f_value", "ts")
    )
    return scd2_apply(current, updates, keys=["user_id"], ts_col="ts")


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel attribution (view → click → purchase): per user,
    the earliest view, the earliest click AT/AFTER that view, and the
    earliest purchase at/after that click — the MATCH_RECOGNIZE-class
    sequence op, expressed as three chained conditional aggregations.

    Scale: all three aggs group on user_id and share the events scan's
    shuffle partitioning; the per-user aggregates are tiny next to the
    event log, so the chain joins broadcast (AQE decides). No window
    over the raw log, no per-event state."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_q2_funnel_ev")
    return spark.sql(
        """
        WITH v AS (
            SELECT user_id, MIN(ts) AS t_view
            FROM _q2_funnel_ev WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM _q2_funnel_ev e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts >= v.t_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM _q2_funnel_ev e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
            GROUP BY e.user_id
        )
        SELECT a.user_id,
               CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
                         WHEN c.t_click IS NOT NULL THEN 2
                         WHEN v.t_view IS NOT NULL THEN 1
                         ELSE 0 END AS BIGINT) AS f_stage,
               v.t_view AS f_t_view,
               c.t_click AS f_t_click,
               p.t_purchase AS f_t_purchase
        FROM (SELECT DISTINCT user_id FROM _q2_funnel_ev) a
        LEFT JOIN v ON a.user_id = v.user_id
        LEFT JOIN c ON a.user_id = c.user_id
        LEFT JOIN p ON a.user_id = p.user_id
        """
    )


def q_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregation (1 h windows every 30 min) — the batch
    twin of the streaming windowed agg (streaming/incremental.py uses
    the same F.window). Each event lands in exactly 2 windows; Spark's
    window() epoch alignment is replayed in the oracle with integer
    floor-division on epoch microseconds. Decimal-exact value sums.
    Scale: explode-by-2 then one hash agg on the window start — no
    per-event state, map-side combinable."""
    ev = _t(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(w.alias("w"))
        .agg(
            F.count("*").alias("f_events"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("f_sum_value"),
        )
        .select(
            F.col("w.start").alias("f_win_start"),
            F.col("w.end").alias("f_win_end"),
            "f_events",
            "f_sum_value",
        )
    )


def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer features — the canonical feature-engineering recipe:
    recency (days from last order to the corpus max date — a data-
    derived anchor, never now()), frequency (order count), monetary
    (decimal-exact spend), plus ntile(4) scores per dimension with full
    ordering tiebreaks. One agg on o_custkey + three DISTRIBUTED exact
    ntiles (ranks.global_ntile: range exchange + parallel per-range
    sort — no unpartitioned Window node anywhere); the anchor is a
    broadcast scalar.

    This key pins the EXACT ntile form (the oracle needs exact quartile
    boundaries); the store-facing recipe is
    ``functions.features.rfm_features``, whose default scale path scores
    via ``quantile_bucket`` (approx-percentile thresholds + row-local
    CASE, plan-asserted sort-free in tests/test_features.py) — same
    feature, one pass, zero exchanges on the scored frame."""
    from ..functions.features import rfm_features

    return rfm_features(_t(spark, sf_dir, "orders"), buckets=4, exact=True)


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-event week (cohort),
    counted distinct-active per calendar week — the standard cohort
    matrix. Two aggs sharing the user_id shuffle + one join of two
    already-small per-user/per-week frames; date_trunc('week') has
    identical Monday-start semantics in Spark and DuckDB."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_q2_ret_ev")
    return spark.sql(
        """
        WITH f AS (
            SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS f_cohort_week
            FROM _q2_ret_ev GROUP BY user_id
        ),
        a AS (
            SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS f_active_week
            FROM _q2_ret_ev
        )
        SELECT f.f_cohort_week, a.f_active_week,
               CAST(COUNT(*) AS BIGINT) AS f_users
        FROM f JOIN a ON f.user_id = a.user_id
        GROUP BY f.f_cohort_week, a.f_active_week
        """
    )


def q_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed event deduplication: keep the FIRST event per
    (user_id, event_type, 10-minute tumbling window) — the batch twin of
    Structured Streaming's watermark dedup (dropDuplicates on the window
    key; parity test in tests/test_streaming.py). The standard at-least-
    once ingestion repair: upstream retries re-emit events, the sink
    keeps one per idempotency window.

    Scale: one shuffle on the high-cardinality (user, type, window) key;
    row_number frames are burst-sized (a handful of rows), never a
    stratum. Deterministic: (ts, event_id) tiebreak."""
    ev = _t(spark, sf_dir, "events")
    # FLOOR, not cast-truncation: for pre-1970 (negative-epoch) events
    # trunc-toward-zero and the oracle's FLOOR pick different buckets.
    win = F.floor(F.unix_timestamp("ts") / 600).cast("long").alias("f_win")
    w = Window.partitionBy("user_id", "event_type", "f_win").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.select("event_id", "user_id", "event_type", "ts", "value", win)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", "value", "f_win")
    )


def q_tpch_q4like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority distribution of orders with at
    least one late-shipping lineitem (EXISTS → left-semi join) in a
    3-month order-date band. Scale: the date filter pushes to the orders
    scan; the semi-join reads only l_orderkey + l_shipdate from lineitem
    (pruned scan) and shuffles on the join key once; the final agg key
    has 5 values (map-side combinable)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_shipdate") > F.lit("1996-02-01").cast("timestamp"))
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("f_order_count"))
    )


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long), the inverse of q_pivot: per-status order
    aggregates melted into (status, metric, value) rows via ``stack`` —
    one generator projection after the agg, no extra shuffle. The
    long-form reshape feature tooling needs when a metrics table feeds
    a generic consumer."""
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        _dsum(F.col("o_totalprice"), "f_total"),
        F.count("*").cast("double").alias("f_cnt"),
        F.max("o_totalprice").alias("f_max"),
    )
    return agg.selectExpr(
        "o_orderstatus",
        "stack(3, 'total', f_total, 'count', f_cnt, 'max', f_max)"
        " AS (f_metric, f_value)",
    )


def q_tpch_q10like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-revenue in a
    quarter — 3-way join (customer ⋈ orders ⋈ lineitem) + nation dim,
    grouped revenue, deterministic top-20. Scale: date filter pushes to
    the orders scan and the R-flag filter to the lineitem scan before
    either join; nation broadcasts; the revenue agg shuffles once on
    c_custkey; top-20 is TakeOrderedAndProject (revenue desc, custkey
    tiebreak)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    # operands at DECIMAL(15,4) keep the product at (32,8) — exact on
    # both engines (a (28,6)×(28,6) product exceeds p38 and Spark
    # silently reduces its scale); values carry ≤2+2 decimal digits so
    # the re-cast to (28,6) before summing is exact
    rev = (
        F.col("l_extendedprice").cast("decimal(15,4)")
        * (F.lit(1).cast("decimal(15,4)") - F.col("l_discount").cast("decimal(15,4)"))
    ).cast(_DEC)
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(rev.cast(_DEC)).cast("double").alias("f_revenue"),
        F.count("*").cast("long").alias("f_items"),
    )
    return agg.orderBy(
        F.col("f_revenue").desc(), F.col("c_custkey").asc()
    ).limit(20)


ORACLE: dict[str, str] = {
    "q_unpivot": """
        WITH agg AS (
            SELECT o_orderstatus,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                       AS f_total,
                   CAST(COUNT(*) AS DOUBLE) AS f_cnt,
                   MAX(o_totalprice) AS f_max
            FROM orders GROUP BY o_orderstatus
        )
        SELECT o_orderstatus, 'total' AS f_metric, f_total AS f_value FROM agg
        UNION ALL
        SELECT o_orderstatus, 'count', f_cnt FROM agg
        UNION ALL
        SELECT o_orderstatus, 'max', f_max FROM agg
    """,
    "q_tpch_q10like": """
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(SUM(CAST(
                   CAST(l.l_extendedprice AS DECIMAL(15,4))
                   * (CAST(1 AS DECIMAL(15,4))
                      - CAST(l.l_discount AS DECIMAL(15,4)))
                   AS DECIMAL(28,6))) AS DOUBLE) AS f_revenue,
               CAST(COUNT(*) AS BIGINT) AS f_items
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1995-10-01'
          AND o.o_orderdate <  TIMESTAMP '1996-01-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY f_revenue DESC, c.c_custkey ASC
        LIMIT 20
    """,
    "q_event_dedup": """
        WITH base AS (
            SELECT event_id, user_id, event_type, ts, value,
                   CAST(FLOOR(epoch(ts) / 600) AS BIGINT) AS f_win
            FROM events
        ),
        ranked AS (
            SELECT *,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type, f_win
                       ORDER BY ts ASC, event_id ASC
                   ) AS rn
            FROM base
        )
        SELECT event_id, user_id, event_type, ts, value, f_win
        FROM ranked WHERE rn = 1
    """,
    "q_tpch_q4like": """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS f_order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > TIMESTAMP '1996-02-01'
          )
        GROUP BY o_orderpriority
    """,
    "q_rfm": """
        WITH rfm AS (
            SELECT o_custkey,
                   MAX(o_orderdate) AS last_o,
                   CAST(COUNT(*) AS BIGINT) AS f_frequency,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                       AS f_monetary
            FROM orders GROUP BY o_custkey
        ),
        anchor AS (SELECT MAX(o_orderdate) AS a FROM orders),
        scored AS (
            SELECT o_custkey,
                   CAST(DATE_DIFF('day', CAST(last_o AS DATE),
                                  CAST(anchor.a AS DATE)) AS BIGINT)
                       AS f_recency_days,
                   f_frequency, f_monetary
            FROM rfm, anchor
        )
        SELECT o_custkey, f_recency_days, f_frequency, f_monetary,
               CAST(NTILE(4) OVER (
                   ORDER BY f_recency_days ASC, o_custkey ASC
               ) AS BIGINT) AS f_r_score,
               CAST(NTILE(4) OVER (
                   ORDER BY f_frequency DESC, o_custkey ASC
               ) AS BIGINT) AS f_f_score,
               CAST(NTILE(4) OVER (
                   ORDER BY f_monetary DESC, o_custkey ASC
               ) AS BIGINT) AS f_m_score
        FROM scored
    """,
    # hop = 30 min = 1.8e9 us, width = 1 h = 3.6e9 us; every event is in
    # the windows starting at floor(us/hop)*hop and one hop earlier —
    # the same 1970-epoch alignment Spark's window() uses
    "q_hopping": """
        WITH e AS (
            SELECT value, epoch_us(ts) AS us FROM events
        ),
        x AS (
            SELECT value, us,
                   unnest([(us // 1800000000) * 1800000000,
                           (us // 1800000000) * 1800000000 - 1800000000])
                       AS s
            FROM e
        )
        SELECT make_timestamp(s) AS f_win_start,
               make_timestamp(s + 3600000000) AS f_win_end,
               CAST(COUNT(*) AS BIGINT) AS f_events,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                   AS f_sum_value
        FROM x
        GROUP BY s
    """,
    "q_retention": """
        -- DuckDB date_trunc('week') yields DATE, Spark yields TIMESTAMP:
        -- cast here so the physical types agree (same midnight instants)
        WITH f AS (
            SELECT user_id,
                   CAST(DATE_TRUNC('week', MIN(ts)) AS TIMESTAMP)
                       AS f_cohort_week
            FROM events GROUP BY user_id
        ),
        a AS (
            SELECT DISTINCT user_id,
                   CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS f_active_week
            FROM events
        )
        SELECT f.f_cohort_week, a.f_active_week,
               CAST(COUNT(*) AS BIGINT) AS f_users
        FROM f JOIN a ON f.user_id = a.user_id
        GROUP BY f.f_cohort_week, a.f_active_week
    """,
    "q_funnel": """
        WITH v AS (
            SELECT user_id, MIN(ts) AS t_view
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts >= v.t_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
            GROUP BY e.user_id
        )
        SELECT a.user_id,
               CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
                         WHEN c.t_click IS NOT NULL THEN 2
                         WHEN v.t_view IS NOT NULL THEN 1
                         ELSE 0 END AS BIGINT) AS f_stage,
               v.t_view AS f_t_view,
               c.t_click AS f_t_click,
               p.t_purchase AS f_t_purchase
        FROM (SELECT DISTINCT user_id FROM events) a
        LEFT JOIN v ON a.user_id = v.user_id
        LEFT JOIN c ON a.user_id = c.user_id
        LEFT JOIN p ON a.user_id = p.user_id
    """,
    "q_scd2_multi": """
        WITH ranked AS (
            SELECT user_id, value, ts, event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ) AS rn
            FROM events
        ),
        firsts AS (
            SELECT user_id, value AS f_value, ts FROM ranked WHERE rn = 1
        ),
        upd AS (
            SELECT user_id, ts, MAX(value) AS f_value
            FROM ranked WHERE rn IN (2, 3)
            GROUP BY user_id, ts
        ),
        upd_min AS (
            SELECT user_id, MIN(ts) AS new_ts FROM upd GROUP BY user_id
        ),
        closed AS (
            SELECT f.user_id, f.f_value, f.ts AS valid_from,
                   m.new_ts AS valid_to
            FROM firsts f LEFT JOIN upd_min m ON f.user_id = m.user_id
        ),
        chained AS (
            SELECT user_id, f_value, ts AS valid_from,
                   LEAD(ts) OVER (
                       PARTITION BY user_id ORDER BY ts ASC
                   ) AS valid_to
            FROM upd
        )
        SELECT user_id, f_value, valid_from, valid_to FROM closed
        UNION ALL
        SELECT user_id, f_value, valid_from, valid_to FROM chained
    """,
    "q_scd2_history": """
        WITH firsts AS (
            SELECT user_id, value AS f_value, ts
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ) AS rn FROM events
            ) WHERE rn = 1
        ),
        lasts AS (
            SELECT user_id, value AS f_value, ts
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                ) AS rn FROM events
            ) WHERE rn = 1
        )
        SELECT f.user_id, f.f_value, f.ts AS valid_from, l.ts AS valid_to
        FROM firsts f JOIN lasts l USING (user_id)
        UNION ALL
        SELECT user_id, f_value, ts AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM lasts
    """,
    "q_join_full": """
        WITH open_spend AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                       AS f_open_spend
            FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
        ),
        filled_spend AS (
            SELECT o_custkey AS f_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                       AS f_filled_spend
            FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
        )
        SELECT COALESCE(o.o_custkey, f.f_custkey) AS custkey,
               o.f_open_spend, f.f_filled_spend
        FROM open_spend o
        FULL OUTER JOIN filled_spend f ON o.o_custkey = f.f_custkey
    """,
    "q_cross_join": """
        SELECT r_name, f_status
        FROM (SELECT r_name FROM region)
        CROSS JOIN (SELECT DISTINCT o_orderstatus AS f_status FROM orders)
    """,
    "q_tpch_q17like": _Q17_SQL.format(lineitem="lineitem", part="part"),
    "q_session_window": """
        WITH gaps AS (
            SELECT user_id, ts, value,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(LAG(ts) OVER w) >= 1800
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
        ),
        sess AS (
            SELECT *,
                   SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sess_id
            FROM gaps
        )
        SELECT user_id,
               MIN(ts) AS f_session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS f_session_end,
               COUNT(*) AS f_events,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS f_value_sum
        FROM sess
        GROUP BY user_id, sess_id
    """,
    "q_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS f_count,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS f_spend,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                    AS BIGINT) AS f_grouping
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
    """,
    "q_window_nav": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               LAG(o_totalprice) OVER w AS f_prev_price,
               LEAD(o_totalprice) OVER w AS f_next_price,
               FIRST_VALUE(o_orderdate) OVER w AS f_first_date,
               LAST_VALUE(o_orderkey) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS f_last_key,
               CAST(NTILE(4) OVER w AS BIGINT) AS f_quartile,
               PERCENT_RANK() OVER w AS f_pct_rank,
               CUME_DIST() OVER w AS f_cume
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    "q_stats_moments": _MOMENTS_SQL.format(lineitem="lineitem"),
    "q_null_handling": """
        WITH base AS (
            SELECT o_orderpriority,
                   NULLIF(o_orderstatus, 'P') AS n_status,
                   CASE WHEN o_totalprice < 50000.0 THEN NULL
                        ELSE o_totalprice END AS n_price
            FROM orders
        )
        SELECT o_orderpriority,
               COUNT(*) AS f_rows,
               COUNT(n_status) AS f_status_nonnull,
               COUNT(*) - COUNT(n_price) AS f_price_nulls,
               CAST(SUM(CAST(COALESCE(n_price, 0.0) AS DECIMAL(28,6)))
                    AS DOUBLE) AS f_price_or_zero,
               CAST(COUNT(*) - COUNT(n_price) AS DOUBLE) / COUNT(*)
                   AS f_null_frac,
               COUNT(DISTINCT n_status) AS f_distinct_status
        FROM base
        GROUP BY o_orderpriority
    """,
    "q_array_agg": """
        SELECT o_custkey,
               string_agg(o_orderpriority, ',' ORDER BY o_orderpriority)
                   AS f_prio_list,
               COUNT(*) AS f_n_orders,
               COUNT(DISTINCT o_orderpriority) AS f_n_distinct_prio,
               MIN(o_orderstatus) AS f_min_status
        FROM orders
        GROUP BY o_custkey
    """,
    "q_num_fns": """
        SELECT p_partkey,
               CAST(FLOOR(p_retailprice) AS DOUBLE) AS f_floor,
               CAST(CEIL(p_retailprice) AS DOUBLE) AS f_ceil,
               ABS(p_retailprice - 1000.0) AS f_abs_delta,
               CAST(SIGN(CAST(p_size - 25 AS DOUBLE)) AS DOUBLE) AS f_sign,
               SQRT(p_retailprice) AS f_sqrt,
               POWER(CAST(p_size AS DOUBLE), 2.0) AS f_size_sq,
               GREATEST(p_retailprice, 1000.0) AS f_hi,
               LEAST(p_retailprice, 1000.0) AS f_lo
        FROM part
    """,
    "q_tpch_q13like": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        ) t
        GROUP BY c_count
    """,
}

QUERIES = {
    "q_scd2_history": q_scd2_history,
    "q_scd2_multi": q_scd2_multi,
    "q_funnel": q_funnel,
    "q_retention": q_retention,
    "q_hopping": q_hopping,
    "q_rfm": q_rfm,
    "q_join_full": q_join_full,
    "q_cross_join": q_cross_join,
    "q_tpch_q17like": q_tpch_q17like,
    "q_session_window": q_session_window,
    "q_grouping_sets": q_grouping_sets,
    "q_window_nav": q_window_nav,
    "q_stats_moments": q_stats_moments,
    "q_null_handling": q_null_handling,
    "q_array_agg": q_array_agg,
    "q_num_fns": q_num_fns,
    "q_tpch_q13like": q_tpch_q13like,
    "q_event_dedup": q_event_dedup,
    "q_tpch_q4like": q_tpch_q4like,
    "q_tpch_q10like": q_tpch_q10like,
    "q_unpivot": q_unpivot,
}
