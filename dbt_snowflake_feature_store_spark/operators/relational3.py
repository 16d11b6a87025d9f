"""Relational query surface, part 3 — round-7 TPC-H-shape closure keys.

Same contract as ``relational.py``/``relational2.py``: DataFrame-first
Spark implementations with DuckDB oracle twins (identical aliases both
sides, decimal-exact double aggregation, deterministic output). These
add the remaining classic TPC-H join/aggregate shapes expressible over
the driver's tables (no partsupp → Q2/Q11/Q16/Q20 are out of reach):
the nation-pair volume join (Q7), the market-share ratio (Q8), the
promo-revenue ratio (Q14), and the scalar-subquery + anti-join customer
audit (Q22) — all plan shapes the reference's arbitrary-SELECT
feature-view bodies imply
(/root/reference/macros/materializations/feature_view.sql:126, :192).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DEC = "decimal(28,6)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.tables import read_table

    return read_table(spark, sf_dir, name)


# revenue operands at DECIMAL(15,4): the product lands at (32,8) — exact
# on both engines; a (28,6)×(28,6) product exceeds p38 and Spark silently
# reduces its scale (CLAUDE.md invariant)
def _rev() -> F.Column:
    return (
        F.col("l_extendedprice").cast("decimal(15,4)")
        * (
            F.lit(1).cast("decimal(15,4)")
            - F.col("l_discount").cast("decimal(15,4)")
        )
    ).cast(_DEC)


_REV_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(15,4))"
    " * (CAST(1 AS DECIMAL(15,4)) - CAST(l_discount AS DECIMAL(15,4)))"
    " AS DECIMAL(28,6))"
)


def q_tpch_q7like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year — lineitem ⋈ orders ⋈ customer ⋈ supplier with BOTH
    endpoint nations resolved and the (supp, cust) pair filtered in
    either direction.

    Scale: the nation-key filters reduce supplier/customer BEFORE the
    fact joins (predicate pushdown into the dim scans); only the
    25-row nation dim carries a broadcast HINT — supplier is
    SF-proportional, so its join is left to AQE, which broadcasts it
    only when its runtime size clears autoBroadcastJoinThreshold (a
    forced hint would be honored at ANY size and die at 100 TB); the
    two fact joins shuffle on their natural keys (orderkey, custkey);
    the final agg key (two nations × years) is tiny and map-side
    combinable. The pair filter is applied on the nationkey INTs, not
    names — names join in only for output."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = _t(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isin(1, 2)
    )
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 2)
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    joined = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(
            ((F.col("s_nationkey") == 1) & (F.col("c_nationkey") == 2))
            | ((F.col("s_nationkey") == 2) & (F.col("c_nationkey") == 1))
        )
        .join(
            F.broadcast(n.withColumnRenamed("n_name", "f_supp_nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .drop("n_nationkey")
        .join(
            F.broadcast(
                n.withColumnRenamed("n_name", "f_cust_nation").withColumnRenamed(
                    "n_nationkey", "n2_nationkey"
                )
            ),
            F.col("c_nationkey") == F.col("n2_nationkey"),
        )
    )
    return joined.groupBy(
        "f_supp_nation",
        "f_cust_nation",
        F.year("l_shipdate").cast("long").alias("f_year"),
    ).agg(
        F.sum(_rev()).cast("double").alias("f_volume"),
        F.count("*").cast("long").alias("f_items"),
    )


def q_tpch_q8like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a supplier nation's market share of PROMO-part
    revenue sold to ASIA-region customers, per order year — the
    conditional-numerator / total-denominator ratio aggregate.

    Scale: only the bounded nation/region dims carry broadcast hints;
    part (type-filtered) and supplier are SF-proportional, so their
    joins are left to AQE (runtime-size-checked broadcast, never a
    forced hint that would be honored at 100 TB); customer pre-filters
    to one region before joining the fact; both decimal sums come out
    of ONE aggregation pass (no second scan for the denominator); the
    ratio is a final DOUBLE division of exact decimal sums (IEEE
    division of identical operands — deterministic cross-engine)."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    cn = n.join(
        F.broadcast(r), n.n_regionkey == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
    )
    agg = joined.groupBy(
        F.year("o_orderdate").cast("long").alias("f_year")
    ).agg(
        F.sum(F.when(F.col("s_nationkey") == 2, _rev()).otherwise(
            F.lit(0).cast(_DEC)
        )).alias("_nat"),
        F.sum(_rev()).alias("_all"),
    )
    return agg.select(
        "f_year",
        F.col("_nat").cast("double").alias("f_nation_volume"),
        F.col("_all").cast("double").alias("f_total_volume"),
        (F.col("_nat").cast("double") / F.col("_all").cast("double")).alias(
            "f_mkt_share"
        ),
    )


def q_tpch_q14like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue percentage for one ship month —
    conditional revenue over total revenue, the month filter pushed to
    the lineitem scan. One aggregation pass produces both sums; the
    percentage is a final double division. The part join carries NO
    broadcast hint — part scales with SF, so AQE decides (it still
    broadcasts at small SF where part clears the size threshold, but
    the plan degrades to a shuffle join instead of dying at 100 TB)."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    agg = li.join(p, li.l_partkey == p.p_partkey).agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
                F.lit(0).cast(_DEC)
            )
        ).alias("_promo"),
        F.sum(_rev()).alias("_all"),
    )
    return agg.select(
        F.col("_promo").cast("double").alias("f_promo_revenue"),
        F.col("_all").cast("double").alias("f_total_revenue"),
        (
            F.lit(100.0)
            * F.col("_promo").cast("double")
            / F.col("_all").cast("double")
        ).alias("f_promo_pct"),
    )


def q_tpch_q22like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance customers above the global
    average balance with no RECENT order (none since 2000-01-01 — the
    driver corpus gives every customer SOME order, so Q22's literal
    never-ordered set is empty; the date-filtered anti join keeps the
    identical plan shape non-vacuous), grouped by a name-derived code —
    scalar aggregate subquery + LEFT ANTI join + group count.

    Scale: the scalar aggregate is a one-row broadcast (Catalyst
    rewrites the subquery); the anti join shuffles customer against the
    o_custkey projection only (2 columns scanned from orders); the
    group key (two name digits) is tiny.

    Exactness: the above-average filter is spelled MULTIPLICATIVELY —
    ``bal · n_pos > sum_pos`` — because an actual AVG would divide
    (Spark: DECIMAL with engine-chosen result scale, DuckDB: DOUBLE)
    and a threshold FEEDING A FILTER must never carry an
    engine-dependent rounding (CLAUDE.md invariant). All three operands
    stay exact decimals on both engines."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    tot = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast(_DEC)).alias("_sum"),
        F.count("*").cast("decimal(10,0)").alias("_n"),
    )
    cand = (
        c.join(F.broadcast(tot))
        .filter(
            F.col("c_acctbal").cast("decimal(15,4)") * F.col("_n")
            > F.col("_sum")
        )
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
    )
    return cand.groupBy(
        F.expr("substr(c_name, length(c_name) - 1, 2)").alias("f_code")
    ).agg(
        F.count("*").cast("long").alias("f_numcust"),
        F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("f_totacctbal"),
    )


def q_window_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — percent_rank, cume_dist, ntile —
    each line item ranked by price WITHIN ITS ORDER. The window
    partitions on the HIGH-CARDINALITY l_orderkey (bounded ~4 rows per
    partition), never on a handful of strata: per-stratum global ranks
    are the single-task-sort scale killer the two-phase top-K keys
    exist to avoid (tests/test_scale_plans.py), so the per-entity form
    is the one that ships. Determinism: the (price, linenumber) order
    key is unique per partition → no peers → percent_rank/cume_dist are
    exact integer ratios and ntile splits are stable."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_extendedprice", "l_linenumber"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.percent_rank().over(w).alias("f_prank"),
        F.cume_dist().over(w).alias("f_cume"),
        F.ntile(4).over(w).cast("long").alias("f_quartile"),
    )



def q_approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct-count sketches (functions/sketches.py):
    per-event-type approx distinct users from per-(type, day) sketches
    ROLLED UP across days — the incremental-refresh form (each refresh
    sketches only new days; any range query unions kilobyte sketches
    instead of rescanning events). ORACLE-GATED in bounds-check form
    (r11, VERDICT-r10 #6): the raw estimate is JVM-HLL-specific, so the
    output carries the exact count plus a flag that the rolled-up
    estimate lands within the 5% bound pytest gates
    (tests/test_sketches.py — merge algebra, layout invariance).
    DuckDB replays the flag as a literal; the exact column hash-gates
    the rollup path, which still runs to feed the flag."""
    from ..functions import sketches as SK

    ev = _t(spark, sf_dir, "events")
    daily = SK.distinct_over_time(ev, "event_type", "user_id")
    est = SK.hll_rollup(daily, ["event_type"]).select(
        "event_type", F.col("approx_distinct").alias("_approx")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("f_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "f_exact",
        (
            F.abs(F.col("_approx") - F.col("f_exact")) * 100
            <= F.col("f_exact") * 5
        ).cast("int").alias("f_within_5pct"),
    )



def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HDR-histogram QUANTILE sketches (functions/sketches.py
    hdr_*), ORACLE-GATED: per-event-type p50/p95 of event value read
    off per-(type, day) bucket-count sketches ROLLED UP across days —
    the incremental percentile recipe (percentiles don't re-aggregate;
    bucket counts ADD, so each refresh sketches only new days and any
    date range is a SUM-merge). Unlike the hash-based HLL key this is
    pure INTEGER arithmetic — micro-unit scaling, bit-length octaves,
    shift sub-buckets — so DuckDB replays the exact buckets and the
    merge-exactness claim is hash-checked, not just pytest-asserted
    (the oracle skips the day stage entirely: rollup is additive-exact
    by construction, same counts either way).

    Scale: two map-side-combinable exchanges (day sketch + rollup);
    the quantile read is a window over ≤ ~1000 bucket rows per key —
    bounded by the bucket universe, never by data size."""
    from ..functions import sketches as SK

    ev = _t(spark, sf_dir, "events")
    daily = SK.hdr_sketch_by_key(
        ev.withColumn("_fs_day", F.to_date("ts")),
        ["event_type", "_fs_day"],
        "value",
    )
    merged = SK.hdr_rollup(daily, ["event_type"])
    return SK.hdr_quantiles(merged, ["event_type"], [0.5, 0.95]).select(
        "event_type",
        F.col("n").alias("f_n"),
        F.col("p50").alias("f_p50"),
        F.col("p95").alias("f_p95"),
    )


def q_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact GLOBAL row number over the whole table — the operation
    Spark's own `Window.orderBy()` (no partition) executes in a single
    task. functions/ranks.global_row_number spells it distributed:
    range exchange on the order key, parallel per-partition local
    sorts, prefix-sum offsets from a bounded P-row collect. Unique
    (price, orderkey, linenumber) tiebreak ⇒ identical to SQL
    ROW_NUMBER() OVER (ORDER BY …) — oracle-gated; the no-single-task
    plan shape is asserted in tests/test_scale_plans.py."""
    from ..functions.ranks import global_row_number

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return global_row_number(
        li,
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        out_col="f_rank",
    )


def q_global_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global NTILE(7) by order value without a global window
    (functions/ranks.global_ntile — driver-side total from the P-row
    size collect, arithmetic bucketing). Output: per-bucket count and
    value range — the global quantile-cut table a dataset sharder uses."""
    from ..functions.ranks import global_ntile

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    b = global_ntile(
        o, ["o_totalprice", "o_orderkey"], 7, out_col="f_bucket"
    )
    return b.groupBy("f_bucket").agg(
        F.count("*").cast("long").alias("f_n"),
        F.min("o_totalprice").alias("f_lo"),
        F.max("o_totalprice").alias("f_hi"),
    )



def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation — all 2^k grouping-set combinations (the third
    member of the rollup / grouping-sets family; q_rollup and
    q_grouping_sets pin the other two). Spark expands CUBE into one
    Expand + single hash aggregate — one shuffle regardless of the
    number of grouping sets. GROUPING() flags disambiguate real NULLs
    from subtotal rows."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("f_n"),
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias(
                "f_qty"
            ),
            F.grouping("l_returnflag").cast("long").alias("f_g_rf"),
            F.grouping("l_linestatus").cast("long").alias("f_g_ls"),
        )
    )


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers — the privacy
    pre-release check a dataset publisher runs: every (mktsegment,
    nation) combination carried by fewer than k=10 customers is a
    re-identification risk. One map-side-combinable agg on the
    quasi-identifier key + a HAVING filter; linear, no joins. The
    release gate companion to q_pii_scan (direct identifiers)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count("*").cast("long").alias("f_group_size"))
        .filter(F.col("f_group_size") < 10)
        .withColumn(
            "f_risk",
            F.when(F.col("f_group_size") == 1, F.lit("unique"))
            .when(F.col("f_group_size") <= 4, F.lit("high"))
            .otherwise(F.lit("low")),
        )
    )



def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) interleave key over two bucketed dimensions
    (functions/features.zorder_value — the OPTIMIZE ZORDER BY analog
    driving two-dimensional file skipping, row-group-stat-proved in
    tests/test_cluster_by.py). Pure row-local shift/mask bit arithmetic
    (whole-stage codegen, zero shuffle) — and bit-exact across engines,
    so the layout key itself is oracle-gated."""
    from ..functions.features import zorder_value

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return o.select(
        "o_orderkey",
        (F.col("o_orderkey") % 128).alias("f_a"),
        (F.col("o_custkey") % 128).alias("f_b"),
        zorder_value(
            F.col("o_orderkey") % 128, F.col("o_custkey") % 128, bits=7
        ).alias("f_z"),
    )



def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set operations — INTERSECT ALL / EXCEPT ALL (the
    bag-semantics twins of q_set_ops' distinct forms; SQL:2003 feature
    both engines implement natively). Duplicate o_custkey rows survive
    with min-count / count-difference multiplicity — the semantics that
    matter when rows are events, not identities. One shuffle each on the
    compared column."""
    o = _t(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    filled_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    both = open_c.intersectAll(filled_c).select(
        "o_custkey", F.lit("both_all").alias("f_bucket")
    )
    surplus = open_c.exceptAll(filled_c).select(
        "o_custkey", F.lit("open_surplus").alias("f_bucket")
    )
    return both.unionByName(surplus)


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals — 20 buckets over the
    [min, max] range (two-pass: a 1-row bounds aggregate broadcast into
    a floor-spelled bucket projection, then a map-side-combinable
    count). The distribution profile every data-quality report carries.
    The bucket edge arithmetic uses identical double operation order on
    both engines and floor (never round) because the bucket id feeds
    the GROUP BY."""
    o = _t(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("_lo"), F.max("o_totalprice").alias("_hi")
    )
    b = o.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("_lo"))
                / ((F.col("_hi") - F.col("_lo")) / 20.0)
            ),
            F.lit(19),
        ).cast("long").alias("f_bucket"),
        "_lo",
        "_hi",
    )
    return b.groupBy("f_bucket").agg(
        F.count("*").cast("long").alias("f_n"),
        F.min("_lo").alias("f_range_lo"),
        F.max("_hi").alias("f_range_hi"),
    )



def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY … LIMIT (SQL:1999
    lateral derived table; Spark ≥3.2 and DuckDB both execute it) —
    each customer joined to their single highest-value order. Catalyst
    decorrelates the lateral into a ranked join (same physical family
    as the window top-1), so the declarative per-row-subquery form
    costs one shuffle, not |customers| subquery executions."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_q3_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_q3_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment,
               t.o_orderkey AS f_top_order,
               t.o_totalprice AS f_top_price
        FROM _q3_customer c JOIN LATERAL (
            SELECT o_orderkey, o_totalprice FROM _q3_orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1
        ) t
        """
    )


def q_tpch_q6like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the forecast-revenue-change scan-aggregate — one
    pushed-filter pass over lineitem (ship year + discount band +
    quantity cap), SUM(extendedprice·discount), no join at all.

    Scale: the canonical 'does the filter reach the scan' probe — all
    three predicates push into the parquet scan (PushedFilters), the
    aggregation is map-side partial into a 1-row result; the whole plan
    is one WholeStageCodegen span over the fact scan. At 100 TB this is
    bandwidth-bound and embarrassingly parallel."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    disc_rev = (
        F.col("l_extendedprice").cast("decimal(15,4)")
        * F.col("l_discount").cast("decimal(15,4)")
    ).cast(_DEC)
    return li.agg(
        F.sum(disc_rev).cast("double").alias("f_revenue"),
        F.count("*").cast("long").alias("f_items"),
    )


def q_tpch_q12like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional priority counts after the
    orders⋈lineitem join — per line status (the driver schema has no
    l_shipmode/l_receiptdate, so line status stands in for ship mode
    and the ship-year window for the receipt-lateness predicate;
    documented deviation, same join + dual-CASE-count plan shape).

    Scale: the date filter pushes into the fact scan; the join shuffles
    on orderkey once; the 2-group agg is map-side combinable."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias(
                "f_high_line_count"
            ),
            F.sum(F.when(hi, 0).otherwise(1)).cast("long").alias(
                "f_low_line_count"
            ),
        )
    )


def q_tpch_q15like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top supplier(s) by quarterly revenue — the
    view + scalar-MAX-subquery pattern. The winner filter compares the
    EXACT decimal revenue sums (never the double projection), so the
    row-set is engine-exact; revenue is cast to double only for output.

    Scale: one fact-scan agg keyed by suppkey, a 1-row broadcast of the
    max (the ONLY forced hint — genuinely bounded), and an AQE-decided
    supplier join for the name (the winner set after the max filter is
    tiny, so AQE broadcasts THAT side at runtime; supplier itself is
    SF-proportional and never force-broadcast) — no window, no global
    sort."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("_rev"))
    mx = rev.agg(F.max("_rev").alias("_mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("_rev") == F.col("_mx"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("_rev").cast("double").alias("f_revenue"),
        )
    )


def q_tpch_q18like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume customers — orders whose total
    quantity clears a threshold (HAVING over the fact agg), joined back
    to orders + customer, top-100 by price.

    Scale: the quantity agg shuffles the fact once on orderkey; the
    surviving order set is small, and THAT reduced side is what AQE
    broadcasts at runtime into the orders and customer joins — customer
    is SF-proportional and carries no hint (a forced customer broadcast
    would be honored at any size and die at 100 TB);
    TakeOrderedAndProject caps the output (full tiebreak on the unique
    orderkey)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(15,4)")).alias("_qty")
        )
        .filter(F.col("_qty") > 250)
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_qty").cast("double").alias("f_sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def q_tpch_q19like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue under a DISJUNCTION of three
    (brand, size-band, quantity-band) clauses — the OR-of-conjunctions
    predicate that exercises join-predicate normalization (the driver
    schema has no l_shipmode/l_shipinstruct; those conjuncts are
    dropped, same three-clause disjunctive shape).

    Scale: the brand/size disjunction prunes part BEFORE the join (only
    rows matching SOME clause join); part is SF-proportional even
    brand-filtered, so the join carries no broadcast hint — AQE
    size-checks it at runtime; the quantity conjuncts evaluate
    post-join row-locally. One fact pass, 1-row result."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 15)
            & qty.between(20, 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(clause)
        .agg(
            F.sum(_rev()).cast("double").alias("f_revenue"),
            F.count("*").cast("long").alias("f_items"),
        )
    )


def q_tpch_q21like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS / NOT-EXISTS double-correlation —
    suppliers who were the ONLY supplier with returned lines on a
    multi-supplier order (the driver schema has no commit/receipt
    dates, so 'returned' stands in for 'late'; identical correlated
    semi + anti join plan shape). Count qualifying orders per supplier,
    top-20.

    Scale: the (order, supplier) pair sets are DISTINCT-reduced before
    any join; EXISTS becomes a left_semi and NOT EXISTS a left_anti on
    (orderkey, suppkey≠) — both shuffle the reduced pair set, never raw
    lineitem; the final per-supplier count is the tiny side of the name
    join, so AQE broadcasts IT at runtime (supplier is SF-proportional
    and carries no forced hint) and TakeOrderedAndProject caps at
    20."""
    li = _t(spark, sf_dir, "lineitem")
    all_sup = li.select("l_orderkey", "l_suppkey").distinct()
    r_sup = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other_all = all_sup.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    other_r = r_sup.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    # EXISTS another supplier on the order
    cand = r_sup.join(
        other_all,
        (r_sup.l_orderkey == other_all._ok)
        & (r_sup.l_suppkey != other_all._sk),
        "left_semi",
    )
    # NOT EXISTS another R-supplier on the order
    only = cand.join(
        other_r,
        (cand.l_orderkey == other_r._ok) & (cand.l_suppkey != other_r._sk),
        "left_anti",
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        only.groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("f_numwait"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "f_numwait")
        .orderBy(
            F.col("f_numwait").desc(),
            F.col("s_name").asc(),
            F.col("s_suppkey").asc(),
        )
        .limit(20)
    )


ORACLE: dict[str, str] = {
    "q_tpch_q6like": """
        SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(15,4))
                             * CAST(l_discount AS DECIMAL(15,4))
                             AS DECIMAL(28,6))) AS DOUBLE) AS f_revenue,
               CAST(COUNT(*) AS BIGINT) AS f_items
        FROM lineitem
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q_tpch_q12like": """
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS f_high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT)
                   AS f_low_line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1998-01-01'
        GROUP BY l.l_linestatus
    """,
    "q_tpch_q15like": f"""
        WITH rev AS (
            SELECT l_suppkey, SUM({_REV_SQL}) AS _rev
            FROM lineitem
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, CAST(r._rev AS DOUBLE) AS f_revenue
        FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r._rev = (SELECT MAX(_rev) FROM rev)
    """,
    "q_tpch_q18like": """
        WITH big AS (
            SELECT l_orderkey,
                   SUM(CAST(l_quantity AS DECIMAL(15,4))) AS _qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(15,4))) > 250
        )
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, CAST(b._qty AS DOUBLE) AS f_sum_qty
        FROM big b
        JOIN orders o ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
        LIMIT 100
    """,
    "q_tpch_q19like": f"""
        SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS f_revenue,
               CAST(COUNT(*) AS BIGINT) AS f_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "q_tpch_q21like": """
        WITH allsup AS (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        ),
        rsup AS (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
            WHERE l_returnflag = 'R'
        ),
        only_r AS (
            SELECT r.l_orderkey, r.l_suppkey
            FROM rsup r
            WHERE EXISTS (
                      SELECT 1 FROM allsup a
                      WHERE a.l_orderkey = r.l_orderkey
                        AND a.l_suppkey <> r.l_suppkey)
              AND NOT EXISTS (
                      SELECT 1 FROM rsup r2
                      WHERE r2.l_orderkey = r.l_orderkey
                        AND r2.l_suppkey <> r.l_suppkey)
        )
        SELECT s.s_suppkey, s.s_name,
               CAST(COUNT(*) AS BIGINT) AS f_numwait
        FROM only_r o JOIN supplier s ON o.l_suppkey = s.s_suppkey
        GROUP BY s.s_suppkey, s.s_name
        ORDER BY f_numwait DESC, s.s_name ASC, s.s_suppkey ASC
        LIMIT 20
    """,
    "q_quantile_sketch": """
        WITH v AS (
            SELECT event_type,
                   CAST(ROUND(CAST(value AS DOUBLE) * 1000000.0) AS BIGINT)
                       AS mv
            FROM events
        ),
        b AS (
            SELECT event_type,
                   CASE WHEN mv < 16 THEN mv
                        ELSE (CAST(length(bin(mv)) AS BIGINT) - 4) * 16
                             + (mv >> (CAST(length(bin(mv)) AS INT) - 5))
                             - 16
                   END AS bucket
            FROM v
        ),
        sk AS (
            SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM b GROUP BY event_type, bucket
        ),
        c AS (
            SELECT event_type, bucket, cnt,
                   SUM(cnt) OVER (PARTITION BY event_type
                                  ORDER BY bucket) AS cum,
                   SUM(cnt) OVER (PARTITION BY event_type) AS n
            FROM sk
        ),
        lo AS (
            SELECT event_type, cum, n,
                   CASE WHEN bucket < 16 THEN bucket
                        ELSE ((16 + (bucket % 16)) << ((bucket // 16) - 1))
                   END AS blo
            FROM c
        )
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS f_n,
               CAST(MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN blo END)
                    AS DOUBLE) / 1000000.0 AS f_p50,
               CAST(MIN(CASE WHEN cum >= CEIL(0.95 * n) THEN blo END)
                    AS DOUBLE) / 1000000.0 AS f_p95
        FROM lo
        GROUP BY event_type
    """,
    "q_lateral_topn": """
        SELECT c.c_custkey, c.c_mktsegment,
               t.o_orderkey AS f_top_order,
               t.o_totalprice AS f_top_price
        FROM customer c JOIN LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1
        ) t ON TRUE
    """,
    "q_set_ops_all": """
        WITH o1 AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
             f1 AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        SELECT o_custkey, 'both_all' AS f_bucket
        FROM (SELECT o_custkey FROM o1 INTERSECT ALL
              SELECT o_custkey FROM f1)
        UNION ALL
        SELECT o_custkey, 'open_surplus' AS f_bucket
        FROM (SELECT o_custkey FROM o1 EXCEPT ALL
              SELECT o_custkey FROM f1)
    """,
    "q_histogram": """
        WITH bounds AS (
            SELECT MIN(o_totalprice) AS _lo, MAX(o_totalprice) AS _hi
            FROM orders
        ),
        b AS (
            SELECT LEAST(FLOOR((o_totalprice - _lo) / ((_hi - _lo) / 20.0)),
                         19) AS f_bucket,
                   _lo, _hi
            FROM orders, bounds
        )
        SELECT CAST(f_bucket AS BIGINT) AS f_bucket,
               CAST(COUNT(*) AS BIGINT) AS f_n,
               MIN(_lo) AS f_range_lo,
               MAX(_hi) AS f_range_hi
        FROM b GROUP BY f_bucket
    """,
    "q_zorder_key": """
        WITH b AS (
            SELECT o_orderkey,
                   o_orderkey % 128 AS f_a,
                   o_custkey % 128 AS f_b
            FROM orders
        )
        SELECT o_orderkey, f_a, f_b,
               CAST((
                   (((f_a >> 0) & 1) << 0) |
                   (((f_b >> 0) & 1) << 1) |
                   (((f_a >> 1) & 1) << 2) |
                   (((f_b >> 1) & 1) << 3) |
                   (((f_a >> 2) & 1) << 4) |
                   (((f_b >> 2) & 1) << 5) |
                   (((f_a >> 3) & 1) << 6) |
                   (((f_b >> 3) & 1) << 7) |
                   (((f_a >> 4) & 1) << 8) |
                   (((f_b >> 4) & 1) << 9) |
                   (((f_a >> 5) & 1) << 10) |
                   (((f_b >> 5) & 1) << 11) |
                   (((f_a >> 6) & 1) << 12) |
                   (((f_b >> 6) & 1) << 13)
               ) AS BIGINT) AS f_z
        FROM b
    """,
    "q_cube": """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS f_n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                   AS f_qty,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS f_g_rf,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS f_g_ls
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "q_k_anonymity": """
        SELECT c_mktsegment, c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS f_group_size,
               CASE WHEN COUNT(*) = 1 THEN 'unique'
                    WHEN COUNT(*) <= 4 THEN 'high'
                    ELSE 'low' END AS f_risk
        FROM customer
        GROUP BY c_mktsegment, c_nationkey
        HAVING COUNT(*) < 10
    """,
    "q_global_rank": """
        SELECT l_orderkey, l_linenumber, l_extendedprice,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ) AS BIGINT) AS f_rank
        FROM lineitem
    """,
    "q_global_ntile": """
        WITH b AS (
            SELECT o_totalprice,
                   NTILE(7) OVER (ORDER BY o_totalprice, o_orderkey)
                       AS f_bucket
            FROM orders
        )
        SELECT CAST(f_bucket AS BIGINT) AS f_bucket,
               CAST(COUNT(*) AS BIGINT) AS f_n,
               MIN(o_totalprice) AS f_lo,
               MAX(o_totalprice) AS f_hi
        FROM b GROUP BY f_bucket
    """,
    "q_window_percentile": """
        SELECT l_orderkey, l_linenumber, l_extendedprice,
               percent_rank() OVER w AS f_prank,
               cume_dist() OVER w AS f_cume,
               CAST(ntile(4) OVER w AS BIGINT) AS f_quartile
        FROM lineitem
        WINDOW w AS (PARTITION BY l_orderkey
                     ORDER BY l_extendedprice, l_linenumber)
    """,
    "q_tpch_q7like": f"""
        SELECT sn.n_name AS f_supp_nation,
               cn.n_name AS f_cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS f_year,
               CAST(SUM({_REV_SQL}) AS DOUBLE) AS f_volume,
               CAST(COUNT(*) AS BIGINT) AS f_items
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
          AND ((s.s_nationkey = 1 AND c.c_nationkey = 2)
            OR (s.s_nationkey = 2 AND c.c_nationkey = 1))
        GROUP BY sn.n_name, cn.n_name, f_year
    """,
    "q_tpch_q8like": f"""
        WITH agg AS (
            SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS f_year,
                   SUM(CASE WHEN s.s_nationkey = 2 THEN {_REV_SQL}
                            ELSE CAST(0 AS DECIMAL(28,6)) END) AS _nat,
                   SUM({_REV_SQL}) AS _all
            FROM lineitem l
            JOIN part p     ON l.l_partkey = p.p_partkey
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            WHERE p.p_type = 'PROMO' AND r.r_name = 'ASIA'
            GROUP BY f_year
        )
        SELECT f_year,
               CAST(_nat AS DOUBLE) AS f_nation_volume,
               CAST(_all AS DOUBLE) AS f_total_volume,
               CAST(_nat AS DOUBLE) / CAST(_all AS DOUBLE) AS f_mkt_share
        FROM agg
    """,
    "q_tpch_q14like": f"""
        WITH agg AS (
            SELECT SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL}
                            ELSE CAST(0 AS DECIMAL(28,6)) END) AS _promo,
                   SUM({_REV_SQL}) AS _all
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
              AND l.l_shipdate <  TIMESTAMP '1996-04-01'
        )
        SELECT CAST(_promo AS DOUBLE) AS f_promo_revenue,
               CAST(_all AS DOUBLE) AS f_total_revenue,
               100.0 * CAST(_promo AS DOUBLE) / CAST(_all AS DOUBLE)
                   AS f_promo_pct
        FROM agg
    """,
    "q_tpch_q22like": """
        WITH tot AS (
            SELECT SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS _sum,
                   CAST(COUNT(*) AS DECIMAL(10,0)) AS _n
            FROM customer WHERE c_acctbal > 0
        )
        SELECT substr(c_name, length(c_name) - 1, 2) AS f_code,
               CAST(COUNT(*) AS BIGINT) AS f_numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                   AS f_totacctbal
        FROM customer c, tot
        WHERE CAST(c_acctbal AS DECIMAL(15,4)) * _n > _sum
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY f_code
    """,
}

ORACLE["q_approx_distinct_sketch"] = """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS f_exact,
           CAST(1 AS INT) AS f_within_5pct
    FROM events
    GROUP BY event_type
"""

QUERIES = {
    "q_tpch_q6like": q_tpch_q6like,
    "q_tpch_q7like": q_tpch_q7like,
    "q_tpch_q8like": q_tpch_q8like,
    "q_tpch_q12like": q_tpch_q12like,
    "q_tpch_q14like": q_tpch_q14like,
    "q_tpch_q15like": q_tpch_q15like,
    "q_tpch_q18like": q_tpch_q18like,
    "q_tpch_q19like": q_tpch_q19like,
    "q_tpch_q21like": q_tpch_q21like,
    "q_tpch_q22like": q_tpch_q22like,
    "q_window_percentile": q_window_percentile,
    "q_approx_distinct_sketch": q_approx_distinct_sketch,
    "q_quantile_sketch": q_quantile_sketch,
    "q_global_rank": q_global_rank,
    "q_global_ntile": q_global_ntile,
    "q_cube": q_cube,
    "q_k_anonymity": q_k_anonymity,
    "q_zorder_key": q_zorder_key,
    "q_set_ops_all": q_set_ops_all,
    "q_histogram": q_histogram,
    "q_lateral_topn": q_lateral_topn,
}
