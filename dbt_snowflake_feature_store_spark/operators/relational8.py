"""Relational query surface, part 8 — round-12 wave.

Same contract as ``relational.py``..``relational7.py``: DataFrame-first
Spark implementations with DuckDB oracle twins (identical aliases both
sides, exact integer/decimal arithmetic, deterministic output). This
wave closes out the drift/association statistics family and adds the
temporal-join operator the earlier waves lacked:

- PSI-style population-stability drift in integer OCTAVE BITS (the
  q_entropy_mix ``length(bin(x)) − 1`` floor-log2 trick — IEEE ln is
  never correctly-rounded cross-engine, octave bits are);
- Cramér's V association strength — the 1-number normalization of
  q_chi2_assoc's per-cell contributions (is the association strong, not
  just significant?);
- exact Spearman rank correlation with tie-averaged ranks in ×2-scaled
  integers (both rank tables ride ranks.global_running_sum — never an
  unpartitioned window over fact rows);
- CUSUM changepoint score over the daily error-count series — the
  max-drawup spelling ``max_t (P_t − min_{i≤t} P_i)`` runs on TWO
  range-exchange scans (running sum + the NEW ranks.global_running_min),
  so even the prefix-min never becomes a single-task window;
- INTERVAL OVERLAP self-join (concurrent same-part shipment windows) —
  the temporal join beside q_join_range's point-in-range and
  q_join_asof's nearest-key forms, in pure integer unix-seconds
  arithmetic (no INTERVAL types cross the engine boundary).

Reference frame: the reference's feature-view bodies are arbitrary
SELECTs over sources (/root/reference/macros/materializations/
feature_view.sql:126); these keys pin the statistics and join shapes
those bodies compute when the FV feeds a monitoring or training
pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
# PSI-style drift in octave bits (floor-log2 population stability)
# ---------------------------------------------------------------------------


def q_psi_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI-STYLE population-stability drift between the doc-length
    (n_chars octave) distributions of English vs non-English documents,
    ORACLE-GATED — the banded drift score risk pipelines run beside
    TVD (q_tvd_drift) and KS (q_ks_drift). The classical
    Σ (p−q)·ln(p/q) needs IEEE ln (never correctly-rounded
    cross-engine), so the log factor is spelled in integer OCTAVE BITS:
    ⌊log2 x⌋ = length(bin(x)) − 1 (the q_entropy_mix / q_doc_surprisal
    trick), giving per-bin terms
    (c1·N2 − c2·N1) · (⌊log2 c1·N2⌋ − ⌊log2 c2·N1⌋) — every term ≥ 0
    exactly as in the real PSI (both factors share sign because
    floor-log2 is monotone), zero cells clamped via GREATEST(·,1)
    (the standard PSI zero-cell guard). Output: one row — group sizes,
    occupied bins, and Σterm·1e6 DIV (N1·N2) as f_psi_bits_ppm.

    Scale: one combinable (octave, group) agg over a projection; the
    octave domain is int64-bounded (~60 bins); the bit-length products
    c·N stay in BIGINT for N ≤ ~3e9 rows per side (document the wider
    DECIMAL spelling past that); the term sum runs in DECIMAL(38,0) /
    HUGEINT."""
    from .relational7 import doc_octave_cells

    # the SAME cell builder as q_tvd_drift (relational7) — one binning
    cell = _ckpt(doc_octave_cells(spark, sf_dir))
    return psi_from_cells(cell)


def psi_from_cells(cell: DataFrame) -> DataFrame:
    """PSI-bits statistic off an ALREADY-AGGREGATED (key, c1, c2) cell
    frame — the same maintained-state consumer contract as
    ``ks_from_points`` / ``tvd_from_cells`` / ``cusum_from_days``
    (relational7/8): the cell frame is a keyed SUM, so an incremental
    FV maintains it exactly via the foreachBatch-MERGE path and a
    drift monitor evaluates PSI from the maintained table without
    rescanning raw history (TestStreamingDrift pins batch ==
    maintained). Extracted r13 to complete the drift family's
    maintained-state story."""
    tot = cell.agg(
        F.sum("c1").cast("long").alias("f_n1"),
        F.sum("c2").cast("long").alias("f_n2"),
        F.count("*").cast("long").alias("f_bins"),
    )
    term = cell.crossJoin(F.broadcast(tot)).select(
        F.expr(
            "CAST(c1 * f_n2 - c2 * f_n1 AS DECIMAL(38,0))"
            " * CAST((length(bin(GREATEST(c1 * f_n2, 1))) - 1)"
            "      - (length(bin(GREATEST(c2 * f_n1, 1))) - 1)"
            "   AS DECIMAL(38,0))"
        ).alias("_term")
    )
    gap = term.agg(F.sum("_term").alias("_S"))
    return gap.crossJoin(F.broadcast(tot)).select(
        "f_n1",
        "f_n2",
        "f_bins",
        F.expr(
            "CAST(_S * 1000000"
            " DIV GREATEST(CAST(f_n1 AS DECIMAL(18,0)) * f_n2, 1)"
            " AS BIGINT)"
        ).alias("f_psi_bits_ppm"),
    )


from .relational7 import DOC_OCTAVE_CELLS_SQL as _CELLS_SQL  # noqa: E402

ORACLE["q_psi_bits"] = f"""
    WITH cell AS ({_CELLS_SQL}),
    tot AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS f_n1,
               CAST(SUM(c2) AS BIGINT) AS f_n2,
               CAST(COUNT(*) AS BIGINT) AS f_bins
        FROM cell
    ),
    gap AS (
        SELECT SUM(
                   CAST(c1 * f_n2 - c2 * f_n1 AS HUGEINT)
                   * (CAST(length(bin(GREATEST(c1 * f_n2, 1))) AS HUGEINT)
                      - CAST(length(bin(GREATEST(c2 * f_n1, 1)))
                             AS HUGEINT))
               ) AS _S
        FROM cell CROSS JOIN tot
    )
    SELECT f_n1, f_n2, f_bins,
           CAST(_S * 1000000
                // GREATEST(CAST(f_n1 AS HUGEINT) * f_n2, 1)
                AS BIGINT) AS f_psi_bits_ppm
    FROM gap CROSS JOIN tot
"""
QUERIES["q_psi_bits"] = q_psi_bits


# ---------------------------------------------------------------------------
# Cramér's V association strength (the chi² normalization)
# ---------------------------------------------------------------------------


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMÉR'S V association strength lang × source over documents,
    ORACLE-GATED — the [0,1]-normalized summary of q_chi2_assoc (chi²
    says the association is SIGNIFICANT; V says whether it is STRONG —
    the feature-selection cutoff is on V, not chi²). V² = chi² /
    (N · min(r−1, c−1)); chi² reuses the chi2 key's exact per-cell
    ppm contributions (summing the identically-DIV'd integers is
    deterministic on both engines), so f_v2_ppm is a pure-integer
    replay. Output: one row — N, table shape, chi² ppm, V² ppm.

    Scale: the contingency frame is category-domain-sized; this key
    adds ONE aggregate over it (q_chi2_assoc's scoring pass runs once —
    the frame is _ckpt-cut before fanning into the two aggregates)."""
    from .relational6 import q_chi2_assoc

    cells = _ckpt(
        q_chi2_assoc(spark, sf_dir).select("lang", "source", "f_obs",
                                           "f_contrib_ppm")
    )
    shape = cells.agg(
        F.sum("f_obs").cast("long").alias("f_n"),
        F.countDistinct("lang").cast("long").alias("f_rows"),
        F.countDistinct("source").cast("long").alias("f_cols"),
        F.sum("f_contrib_ppm").cast("long").alias("f_chi2_ppm"),
    )
    return shape.select(
        "f_n",
        "f_rows",
        "f_cols",
        "f_chi2_ppm",
        F.expr(
            "CAST(f_chi2_ppm DIV GREATEST(f_n *"
            " LEAST(f_rows - 1, f_cols - 1), 1) AS BIGINT)"
        ).alias("f_v2_ppm"),
    )


from .relational6 import ORACLE as _R6_ORACLE  # noqa: E402

ORACLE["q_cramers_v"] = f"""
    WITH cells AS ({_R6_ORACLE["q_chi2_assoc"]}),
    shape AS (
        SELECT CAST(SUM(f_obs) AS BIGINT) AS f_n,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS f_rows,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS f_cols,
               CAST(SUM(f_contrib_ppm) AS BIGINT) AS f_chi2_ppm
        FROM cells
    )
    SELECT f_n, f_rows, f_cols, f_chi2_ppm,
           CAST(f_chi2_ppm // GREATEST(f_n *
                LEAST(f_rows - 1, f_cols - 1), 1) AS BIGINT) AS f_v2_ppm
    FROM shape
"""
QUERIES["q_cramers_v"] = q_cramers_v


# ---------------------------------------------------------------------------
# Exact Spearman rank correlation (tie-averaged ranks, ×2 integers)
# ---------------------------------------------------------------------------


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT SPEARMAN rank correlation between l_quantity and
    l_extendedprice over lineitem, ORACLE-GATED — the monotone-
    association screen (robust to the heavy tails that wreck Pearson).
    Tie-averaged ranks carry a half-unit, so ranks are ×2-SCALED
    integers: for a distinct value with count c and inclusive
    cumulative count cum, r×2 = 2·cum − c + 1 (= min-rank + max-rank).
    ρ = 1 − 6·Σd² / (n(n²−1)) with d in half-units becomes
    ρ_ppm = 1e6 − 6e6·Σ(d×2)² DIV (4·n·(n²−1)), every step
    DECIMAL(38,0)/HUGEINT (exact to n ≈ 1.6e10 rows — the documented
    N³ magnitude bound, chi2/KS/Gini precedent). The tie-corrected
    denominator variant is noted, not computed: with heavy ties this
    simplified statistic is itself the standard reported number.

    Scale (r18 rewrite — the r17 shape pre-aggregated to (v1, v2) PAIR
    cells, but price in cents is nearly unique per row so the pair
    frame IS the fact: the localCheckpoint materialized ~n rows, both
    rank tables joined back onto ~n rows, and two range exchanges ran
    where the math needs one). Σd² decomposes exactly over integers:
    Σ(r1−r2)² = Σc₁·r1² + Σc₂·r2² − 2·Σ_rows r1·r2. The quantity side
    is SCHEMA-BOUNDED (l_quantity ∈ 1..50 at every SF): one
    map-combinable 50-key agg, a 50-row driver collect, and exact
    Python-int rank arithmetic turn Σc₁·r1² into a literal and r1 into
    a 50-entry row-local map. The price side then needs ONE fact pass
    grouped by _v2 (map-side combinable; carries count and Σr1 per
    price — the cross term's joint information), ONE
    ranks.global_running_sum range exchange over the price DOMAIN, and
    a domain-sized final agg. No fact-level checkpoint, no fact-sized
    join, no second range exchange. Magnitude bound unchanged: every
    Σ-term ≤ 4n³ (r×2 ≤ 2n), DECIMAL(38,0)/HUGEINT-exact to n ≈
    1.3·10¹² (the documented N³ discipline); the per-price Σr1 partial
    sums accumulate in DECIMAL(38,0) (≤ 2n² — BIGINT would overflow
    past n ≈ 2·10⁹)."""
    from ..functions.ranks import bucketed_running_sum

    li = _t(spark, sf_dir, "lineitem").select(
        F.expr("CAST(l_quantity AS BIGINT)").alias("_v1"),
        F.expr(
            "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
        ).alias("_v2"),
    ).filter(F.col("_v1").isNotNull() & F.col("_v2").isNotNull())
    # qty domain: bounded collect (≤50 rows — the ranks-module P-row
    # collect discipline), ×2-scaled tie-averaged ranks as exact ints
    v1rows = sorted(
        (r["_v1"], r["_c"])
        for r in li.groupBy("_v1")
        .agg(F.count("*").cast("long").alias("_c"))
        .collect()
    )
    n_qty = len(v1rows)
    r1: dict[int, int] = {}
    sum_c_r1sq = 0  # Σ c₁·r1² over the qty domain — exact Python int
    cum = 0
    for v, c in v1rows:
        cum += c
        rx = 2 * cum - c + 1
        r1[v] = rx
        sum_c_r1sq += c * rx * rx
    r1map = F.create_map(*[F.lit(x) for kv in r1.items() for x in kv])
    # ONE fact pass keyed on price: count + Σ r1 per distinct price
    dv = (
        li.select("_v2", r1map[F.col("_v1")].alias("_r1"))
        .groupBy("_v2")
        .agg(
            F.count("*").cast("long").alias("_c"),
            F.sum(F.expr("CAST(_r1 AS DECIMAL(38,0))")).alias("_sr1"),
        )
    )
    # r18: the price rank rides ranks.bucketed_running_sum instead of
    # the sampled range exchange — the price DOMAIN is schema-bounded
    # (TPC-H l_extendedprice = qty × retailprice ≤ ~10.5e6 cents at ANY
    # SF), so _v2 DIV 2^14 is a ≤ ~650-bucket monotone key: one
    # map-combinable histogram off the RAW fact (per-bucket row count =
    # per-bucket Σ_c of dv, since dv is the per-price count), one
    # bounded driver collect, one bucket-partitioned window. Removes
    # repartitionByRange's sampling re-execution of the fact agg, the
    # pinned localCheckpoint, and the id bookkeeping; falls back to the
    # range machinery above 65536 buckets.
    _SP_BUCKET = 1 << 14
    bexpr = F.expr(f"CAST(_v2 DIV {_SP_BUCKET} AS BIGINT)")
    hist = li.groupBy(bexpr.alias("_b")).agg(
        F.count("*").cast("long").alias("_w")
    )
    cum2 = bucketed_running_sum(
        dv.withColumn("_fs_spb", bexpr),
        ["_v2"],
        "_c",
        "_fs_spb",
        sum_col="_cum",
        hist_df=hist,
    )
    ranked = cum2.select(
        "_c",
        "_sr1",
        F.expr("CAST(2 * _cum - _c + 1 AS BIGINT)").alias("_r2x"),
    )
    agg = ranked.agg(
        F.sum("_c").cast("long").alias("f_n"),
        F.count("*").cast("long").alias("f_distinct_price"),
        F.sum(
            F.expr(
                "CAST(_c AS DECIMAL(38,0))"
                " * CAST(_r2x AS DECIMAL(38,0))"
                " * CAST(_r2x AS DECIMAL(38,0))"
            )
        ).alias("_sr2sq"),
        F.sum(F.expr("_sr1 * CAST(_r2x AS DECIMAL(38,0))")).alias("_cross"),
    )
    return agg.select(
        "f_n",
        F.lit(n_qty).cast("long").alias("f_distinct_qty"),
        "f_distinct_price",
        F.expr(
            f"CAST(1000000 - CAST(6000000 AS DECIMAL(38,0)) *"
            f" (CAST('{sum_c_r1sq}' AS DECIMAL(38,0)) + _sr2sq"
            " - 2 * _cross)"
            " DIV GREATEST(CAST(4 AS DECIMAL(38,0)) * f_n"
            " * (CAST(f_n AS DECIMAL(38,0)) * f_n - 1), 1) AS BIGINT)"
        ).alias("f_rho_ppm"),
    )


ORACLE["q_spearman_corr"] = """
    WITH li AS (
        SELECT CAST(l_quantity AS BIGINT) AS _v1,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS _v2
        FROM lineitem
    ),
    d1 AS (
        SELECT _v1, CAST(COUNT(*) AS BIGINT) AS _c FROM li GROUP BY _v1
    ),
    r1 AS (
        SELECT _v1,
               CAST(2 * SUM(_c) OVER (ORDER BY _v1
                        ROWS UNBOUNDED PRECEDING) - _c + 1 AS BIGINT)
                   AS _v1_r2
        FROM d1
    ),
    d2 AS (
        SELECT _v2, CAST(COUNT(*) AS BIGINT) AS _c FROM li GROUP BY _v2
    ),
    r2 AS (
        SELECT _v2,
               CAST(2 * SUM(_c) OVER (ORDER BY _v2
                        ROWS UNBOUNDED PRECEDING) - _c + 1 AS BIGINT)
                   AS _v2_r2
        FROM d2
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS f_n,
               CAST(COUNT(DISTINCT li._v1) AS BIGINT) AS f_distinct_qty,
               CAST(COUNT(DISTINCT li._v2) AS BIGINT) AS f_distinct_price,
               SUM(CAST(_v1_r2 - _v2_r2 AS HUGEINT)
                   * CAST(_v1_r2 - _v2_r2 AS HUGEINT)) AS _sd2
        FROM li
        JOIN r1 ON li._v1 = r1._v1
        JOIN r2 ON li._v2 = r2._v2
    )
    SELECT f_n, f_distinct_qty, f_distinct_price,
           CAST(1000000 - CAST(6000000 AS HUGEINT) * _sd2
                // GREATEST(CAST(4 AS HUGEINT) * f_n
                            * (CAST(f_n AS HUGEINT) * f_n - 1), 1)
                AS BIGINT) AS f_rho_ppm
    FROM agg
"""
QUERIES["q_spearman_corr"] = q_spearman_corr


# ---------------------------------------------------------------------------
# CUSUM changepoint score over the daily error series (max drawup)
# ---------------------------------------------------------------------------


def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM CHANGEPOINT score over the daily error-event series,
    ORACLE-GATED — the sequential drift detector beside the
    distributional ones (KS/TVD/PSI compare two snapshots; CUSUM finds
    WHEN the rate shifted). Deviations are centered exactly without
    division: y_t = D·x_t − T (D days, T total errors, so Σy = 0 and
    everything stays BIGINT). The one-sided statistic is the MAX
    DRAWUP of the cumulative deviation, S = max_t (P_t − min_{i≤t}
    P_i) with P the prefix sum of y — the clamped-recursion CUSUM
    spelled as two prefix scans, no recursion. Output: one row —
    f_days, f_total, f_cusum_max (in D-scaled count units), and
    f_peak_day (earliest argmax).

    Scale: the day-grain aggregate is calendar-sized; both prefix
    scans ride ONE fused range exchange (ranks.global_drawup_scan) —
    P parallel tasks even if the series grows to millions of periods,
    never a single-task window. The final argmax is a
    TakeOrderedAndProject."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & (F.col("event_type") == "error")
    )
    day = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("_d")
    ).agg(F.count("*").cast("long").alias("_x"))
    return cusum_from_days(day)


def cusum_from_days(day: DataFrame) -> DataFrame:
    """Max-drawup CUSUM from a PER-PERIOD count frame ``(_d, _x)`` —
    the mergeable drift state: the period frame is a keyed COUNT
    aggregate, so a streaming FV maintains it exactly via the
    foreachBatch-MERGE path and the changepoint monitor reads the
    maintained table instead of rescanning raw history (the
    ks_from_points / tvd_from_cells discipline;
    tests/test_streaming.py TestStreamingDrift parity)."""
    from ..functions.ranks import global_drawup_scan

    day = _ckpt(day)
    # _nd/_tt, NOT _D/_T: Spark resolves case-insensitively and DuckDB
    # lowercases unquoted identifiers, so _d vs _D in one scope COLLIDE
    # on both engines (the CLAUDE.md case-collision hazard)
    tot = day.agg(
        F.count("*").cast("long").alias("_nd"),
        F.sum("_x").cast("long").alias("_tt"),
    )
    y = day.crossJoin(F.broadcast(tot)).select(
        "_d",
        "_nd",
        "_tt",
        (F.col("_nd") * F.col("_x") - F.col("_tt"))
        .cast("long")
        .alias("_y"),
    )
    # ONE fused range exchange for both prefix scans (running sum AND
    # its running min — ranks.global_drawup_scan; the r15 de-creep:
    # previously global_running_sum + global_running_min cost two
    # exchanges, two lineage cuts and two P-row collects).
    s = global_drawup_scan(y, ["_d"], "_y", sum_col="_p", min_col="_pmin")
    return (
        s.select(
            F.col("_nd").alias("f_days"),
            F.col("_tt").alias("f_total"),
            F.expr("CAST(_p - _pmin AS BIGINT)").alias("f_cusum_max"),
            F.col("_d").alias("f_peak_day"),
        )
        .orderBy(F.col("f_cusum_max").desc(), F.col("f_peak_day").asc())
        .limit(1)
    )


ORACLE["q_cusum_drift"] = """
    WITH day AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS _d,
               CAST(COUNT(*) AS BIGINT) AS _x
        FROM events
        WHERE ts IS NOT NULL AND event_type = 'error'
        GROUP BY 1
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS _nd,
               CAST(SUM(_x) AS BIGINT) AS _tt
        FROM day
    ),
    p AS (
        SELECT _d, _nd, _tt,
               CAST(SUM(_nd * _x - _tt) OVER (ORDER BY _d
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _p
        FROM day CROSS JOIN tot
    ),
    s AS (
        SELECT _d, _nd, _tt, _p,
               CAST(MIN(_p) OVER (ORDER BY _d
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _pmin
        FROM p
    )
    SELECT _nd AS f_days, _tt AS f_total,
           CAST(_p - _pmin AS BIGINT) AS f_cusum_max,
           _d AS f_peak_day
    FROM s
    ORDER BY f_cusum_max DESC, f_peak_day ASC
    LIMIT 1
"""
QUERIES["q_cusum_drift"] = q_cusum_drift


# ---------------------------------------------------------------------------
# Interval-overlap self-join (concurrent same-part shipment windows)
# ---------------------------------------------------------------------------

_IV_TOP = 20


def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP self-join, ORACLE-GATED — the temporal join
    missing between q_join_range (point-in-range) and q_join_asof
    (nearest key): each lineitem defines a shipment WINDOW
    [shipdate, shipdate + quantity days] in integer unix seconds, and
    the key counts, per part, the pairs of DISTINCT line items whose
    windows overlap (``a.s ≤ b.e AND b.s ≤ a.e``) — "how often is the
    same part in flight twice at once". Pairs dedup via strict
    (orderkey, linenumber) ordering; overlap length reported in whole
    days. Output: top-20 parts by pair count (full ORDER BY with
    partkey tiebreak). No INTERVAL/date arithmetic crosses the engine
    boundary — epoch seconds + 86400·quantity on both sides.

    Scale (r17 rewrite, r18 fused fold): ONE
    map-side-combinable-free shuffle on l_partkey (collect_list per
    part) and the pair expansion runs ROW-LOCALLY over the sorted
    per-part array — since r18 as a SINGLE aggregate fold producing
    (count, max-overlap) in one traversal, with the zero-pair filter
    above the top-k (the r17 spelling's size-filter was
    predicate-pushed below the defining Project and re-evaluated the
    quadratic expansion twice) —
    per-part multiplicity is a schema-fixed ratio (~30 lines/part at
    every TPC-H SF), so the per-row array and its ≤ ~m²/2 pair scan are
    bounded BY THE SCHEMA at any SF. The pre-r17 spelling was a partkey
    equi self-join (two sorted exchanges + SMJ + a second agg exchange)
    whose pair stream carried the identical comparisons; same output,
    one exchange instead of three, no join machinery. The array sorts
    on (orderkey, linenumber) — the PK, so position order i<j IS the
    strict dedup ordering. Parts with zero overlapping pairs are
    filtered (the join produced no group for them). A keyless interval
    join would instead bucket by coarse time slices (explode to
    slice keys → equi-join → exact refine); documented here as the
    scale path for that shape."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.expr("CAST(unix_timestamp(l_shipdate) AS BIGINT)").alias("_s"),
        F.expr(
            "CAST(unix_timestamp(l_shipdate)"
            " + 86400 * CAST(l_quantity AS BIGINT) AS BIGINT)"
        ).alias("_e"),
    )
    grouped = li.groupBy(F.col("l_partkey").alias("f_partkey")).agg(
        F.expr(
            "array_sort(collect_list(struct("
            "l_orderkey AS ok, l_linenumber AS ln, _s AS s, _e AS e)))"
        ).alias("_arr")
    )
    # r18: ONE fused fold computes (pair count, max overlap) in a single
    # traversal of the (i < j) pair stream — the r17 spelling
    # materialized the filtered pair ARRAY and its `size(_p) > 0` gate
    # was predicate-pushed below the defining Project, re-evaluating the
    # full quadratic expansion TWICE per group (verified in the before
    # plan: the filter(flatten(transform(...))) subtree appears in both
    # the Filter and the Project). `_arr` is an Aggregate-output
    # ATTRIBUTE, so referencing it inside the lambdas is the legal
    # materialized-column form; `_st` is referenced twice below, which
    # cost-aware CollapseProject refuses to inline — fold runs once.
    stats = grouped.select(
        "f_partkey",
        F.expr(
            "aggregate("
            " flatten(transform(_arr, (x, i) ->"
            "  transform(slice(_arr, i + 2, size(_arr)),"
            "  y -> struct(x.s AS s1, x.e AS e1, y.s AS s2, y.e AS e2)))),"
            " named_struct('cnt', CAST(0 AS BIGINT),"
            "               'mx', CAST(NULL AS BIGINT)),"
            " (acc, p) -> CASE WHEN p.s1 <= p.e2 AND p.s2 <= p.e1"
            "  THEN named_struct('cnt', acc.cnt + CAST(1 AS BIGINT),"
            "   'mx', GREATEST(acc.mx,"
            "    (LEAST(p.e1, p.e2) - GREATEST(p.s1, p.s2)) DIV 86400))"
            "  ELSE acc END)"
        ).alias("_st"),
    )
    out = stats.select(
        "f_partkey",
        F.col("_st.cnt").alias("f_pairs"),
        F.col("_st.mx").alias("f_max_overlap_days"),
    )
    # zero-pair parts are dropped ABOVE the top-k (a filter below it
    # would predicate-push into the fold's Project and duplicate the
    # expansion): with ≥ top-k positive parts the limit already contains
    # only positives (they sort first on f_pairs DESC); with fewer, the
    # post-limit filter leaves exactly the positive set — both cases
    # identical to filtering first, which is what the oracle's inner
    # join spells.
    return (
        out.orderBy(F.col("f_pairs").desc(), F.col("f_partkey").asc())
        .limit(_IV_TOP)
        .filter(F.col("f_pairs") > 0)
    )


ORACLE["q_join_interval"] = f"""
    WITH li AS (
        SELECT l_partkey, l_orderkey, l_linenumber,
               CAST(epoch(l_shipdate) AS BIGINT) AS _s,
               CAST(epoch(l_shipdate)
                    + 86400 * CAST(l_quantity AS BIGINT) AS BIGINT) AS _e
        FROM lineitem
    ),
    pairs AS (
        SELECT a.l_partkey,
               LEAST(a._e, b._e) - GREATEST(a._s, b._s) AS _ov
        FROM li a JOIN li b
          ON a.l_partkey = b.l_partkey
         AND (a.l_orderkey < b.l_orderkey
              OR (a.l_orderkey = b.l_orderkey
                  AND a.l_linenumber < b.l_linenumber))
         AND a._s <= b._e AND b._s <= a._e
    )
    SELECT l_partkey AS f_partkey,
           CAST(COUNT(*) AS BIGINT) AS f_pairs,
           CAST(MAX(_ov // 86400) AS BIGINT) AS f_max_overlap_days
    FROM pairs
    GROUP BY 1
    ORDER BY f_pairs DESC, f_partkey ASC
    LIMIT {_IV_TOP}
"""
QUERIES["q_join_interval"] = q_join_interval


# ---------------------------------------------------------------------------
# Benford first-digit audit (data-quality screen on monetary values)
# ---------------------------------------------------------------------------

# floor(log10(1 + 1/d) · 1e6 + 0.5) for d = 1..9 — sums to exactly 1e6.
_BENFORD_PPM = (
    301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757,
)


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD first-significant-digit audit of order totals,
    ORACLE-GATED — the classic fabricated-/synthetic-data screen a
    data-quality pipeline runs on monetary columns: organically-grown
    magnitudes follow log10(1 + 1/d); clerical defaults, copy-paste
    rows and naive generators don't. The digit comes from the integer
    cents via string truncation (BIGINT→string renders identically on
    both engines — no IEEE log10 anywhere); expected shares are the
    half-up ppm constants of log10(1+1/d) (they sum to exactly 1e6),
    so observed share, expected share and deviation are all integers.

    Scale: one map-side-combinable groupBy onto a 9-value digit
    domain; everything downstream is 9 rows."""
    o = _t(spark, sf_dir, "orders")
    dig = o.select(
        F.expr(
            "CAST(substring(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5)"
            " AS BIGINT) AS STRING), 1, 1) AS BIGINT)"
        ).alias("f_digit")
    ).groupBy("f_digit").agg(F.count("*").cast("long").alias("f_n"))
    return benford_from_digits(dig)


def benford_from_digits(dig: DataFrame) -> DataFrame:
    """The Benford audit off a PRE-AGGREGATED digit frame ``(f_digit,
    f_n)`` — the ks_from_points / tvd_from_cells / cusum_from_days /
    autocorr_from_days / psi_from_cells discipline (SIXTH member of
    the maintained-monitor family): the digit frame is a keyed COUNT,
    so an incremental FV maintains it exactly via the
    foreachBatch-MERGE path and this statistic reads the maintained
    9-row table — the audit never rescans raw history
    (tests/test_streaming.py TestStreamingDrift pins
    batch == maintained across arrivals)."""
    dig = _ckpt(dig)
    tot = dig.agg(F.sum("f_n").cast("long").alias("_N"))
    exp_case = "CASE f_digit " + " ".join(
        f"WHEN {d + 1} THEN {ppm}" for d, ppm in enumerate(_BENFORD_PPM)
    ) + " ELSE 0 END"
    return (
        dig.crossJoin(F.broadcast(tot))
        .select(
            "f_digit",
            "f_n",
            F.expr(
                "CAST(f_n * 1000000 DIV GREATEST(_N, 1) AS BIGINT)"
            ).alias("f_share_ppm"),
            F.expr(f"CAST({exp_case} AS BIGINT)").alias("f_benford_ppm"),
            F.expr(
                f"CAST(f_n * 1000000 DIV GREATEST(_N, 1)"
                f" - ({exp_case}) AS BIGINT)"
            ).alias("f_dev_ppm"),
        )
        .orderBy("f_digit")
    )


_BENFORD_CASE_SQL = "CASE f_digit " + " ".join(
    f"WHEN {d + 1} THEN {ppm}" for d, ppm in enumerate(_BENFORD_PPM)
) + " ELSE 0 END"

ORACLE["q_benford_digits"] = f"""
    WITH dig AS (
        SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5)
                    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS f_digit,
               CAST(COUNT(*) AS BIGINT) AS f_n
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(f_n) AS BIGINT) AS _N FROM dig)
    SELECT f_digit, f_n,
           CAST(f_n * 1000000 // GREATEST(_N, 1) AS BIGINT) AS f_share_ppm,
           CAST({_BENFORD_CASE_SQL} AS BIGINT) AS f_benford_ppm,
           CAST(f_n * 1000000 // GREATEST(_N, 1)
                - ({_BENFORD_CASE_SQL}) AS BIGINT) AS f_dev_ppm
    FROM dig CROSS JOIN tot
    ORDER BY f_digit
"""
QUERIES["q_benford_digits"] = q_benford_digits


# ---------------------------------------------------------------------------
# Lagged autocorrelation of the daily event series (exact integer Pearson²)
# ---------------------------------------------------------------------------

_ACF_LAGS = (1, 7)


def q_autocorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG-k AUTOCORRELATION of the daily event-count series (k = 1, 7),
    ORACLE-GATED — the seasonality probe beside q_cusum_drift's
    changepoint score (lag-7 ≫ lag-1 reveals weekly cadence). Pearson r
    needs square roots, so the key reports the EXACT integer pieces and
    r² with its sign: num = n·Σxy − Σx·Σy, den = (n·Σx² − (Σx)²)·
    (n·Σy² − (Σy)²), f_r2_ppm = num²·1e6 DIV den, f_sign = SIGN(num) —
    every step DECIMAL(38,0)/HUGEINT (num² ≤ (n·x²_max)² ≈ 1e24·1e6 at
    the day grain — document the ~1e6-day bound). Pairs join on integer
    epoch seconds + k·86400 — no INTERVAL arithmetic crosses engines.
    Pairs are OBSERVED-day pairs (a missing day contributes no pair, the
    standard gap treatment for count series; document).

    Scale: the day-grain aggregate is calendar-sized; the lag join is a
    self-equi-join on the shifted day key; sufficient statistics are one
    combinable aggregate per lag over that frame."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    day = ev.groupBy(
        F.expr(
            "CAST(unix_timestamp(date_trunc('day', ts)) AS BIGINT)"
        ).alias("_ds")
    ).agg(F.count("*").cast("long").alias("_x"))
    return autocorr_from_days(day)


def autocorr_from_days(day: DataFrame) -> DataFrame:
    """Lag-k autocorrelation pieces off a (``_ds`` epoch-second day,
    ``_x`` BIGINT count) frame — split out of q_autocorr_lag (r13) so
    the statistic composes with MAINTAINED state: the day frame is a
    keyed COUNT aggregate, exactly what an INCREMENTAL feature view
    maintains via the foreachBatch-MERGE path, so a seasonality monitor
    reads the maintained table instead of rescanning raw history (the
    ks_from_points / tvd_from_cells / cusum_from_days discipline —
    TestStreamingDrift pins batch == maintained)."""
    day = _ckpt(day)
    outs = []
    for lag in _ACF_LAGS:
        a, b = day.alias("a"), day.alias("b")
        pairs = a.join(
            b,
            F.col("a._ds") + F.lit(lag * 86400) == F.col("b._ds"),
        ).select(
            F.col("a._x").alias("_xa"), F.col("b._x").alias("_xb")
        )
        stats = pairs.agg(
            F.count("*").cast("long").alias("_n"),
            F.sum("_xa").cast("long").alias("_sx"),
            F.sum("_xb").cast("long").alias("_sy"),
            F.sum(F.expr("CAST(_xa AS DECIMAL(38,0)) * _xb")).alias("_sxy"),
            F.sum(F.expr("CAST(_xa AS DECIMAL(38,0)) * _xa")).alias("_sxx"),
            F.sum(F.expr("CAST(_xb AS DECIMAL(38,0)) * _xb")).alias("_syy"),
        )
        outs.append(
            stats.select(
                F.lit(lag).cast("long").alias("f_lag"),
                F.col("_n").alias("f_pairs"),
                F.expr(
                    "CAST(SIGN(CAST(_n AS DECIMAL(38,0)) * _sxy"
                    " - CAST(_sx AS DECIMAL(38,0)) * _sy) AS BIGINT)"
                ).alias("f_sign"),
                F.expr(
                    "CAST((CAST(_n AS DECIMAL(38,0)) * _sxy"
                    "      - CAST(_sx AS DECIMAL(38,0)) * _sy)"
                    " * (CAST(_n AS DECIMAL(38,0)) * _sxy"
                    "      - CAST(_sx AS DECIMAL(38,0)) * _sy)"
                    " * 1000000"
                    " DIV GREATEST((CAST(_n AS DECIMAL(38,0)) * _sxx"
                    "      - CAST(_sx AS DECIMAL(38,0)) * _sx)"
                    " * (CAST(_n AS DECIMAL(38,0)) * _syy"
                    "      - CAST(_sy AS DECIMAL(38,0)) * _sy), 1)"
                    " AS BIGINT)"
                ).alias("f_r2_ppm"),
            )
        )
    out = outs[0]
    for o2 in outs[1:]:
        out = out.unionAll(o2)
    # row-count parity: Spark's global agg emits a row even for a lag
    # with ZERO pairs (f_pairs=0, NULL stats) where the oracle's
    # GROUP BY emits none — drop empty lags on this side too (a series
    # shorter than the lag simply has no row for it)
    return out.filter(F.col("f_pairs") > 0).orderBy("f_lag")


ORACLE["q_autocorr_lag"] = """
    WITH day AS (
        SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS _ds,
               CAST(COUNT(*) AS BIGINT) AS _x
        FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    lags AS (SELECT * FROM (VALUES (1), (7)) AS t(f_lag)),
    pairs AS (
        SELECT l.f_lag, a._x AS _xa, b._x AS _xb
        FROM lags l
        JOIN day a ON TRUE
        JOIN day b ON a._ds + l.f_lag * 86400 = b._ds
    ),
    stats AS (
        SELECT f_lag,
               CAST(COUNT(*) AS BIGINT) AS _n,
               CAST(SUM(_xa) AS BIGINT) AS _sx,
               CAST(SUM(_xb) AS BIGINT) AS _sy,
               SUM(CAST(_xa AS HUGEINT) * _xb) AS _sxy,
               SUM(CAST(_xa AS HUGEINT) * _xa) AS _sxx,
               SUM(CAST(_xb AS HUGEINT) * _xb) AS _syy
        FROM pairs GROUP BY f_lag
    )
    SELECT CAST(f_lag AS BIGINT) AS f_lag,
           _n AS f_pairs,
           CAST(SIGN(CAST(_n AS HUGEINT) * _sxy
                     - CAST(_sx AS HUGEINT) * _sy) AS BIGINT) AS f_sign,
           CAST((CAST(_n AS HUGEINT) * _sxy - CAST(_sx AS HUGEINT) * _sy)
                * (CAST(_n AS HUGEINT) * _sxy - CAST(_sx AS HUGEINT) * _sy)
                * 1000000
                // GREATEST((CAST(_n AS HUGEINT) * _sxx
                             - CAST(_sx AS HUGEINT) * _sx)
                          * (CAST(_n AS HUGEINT) * _syy
                             - CAST(_sy AS HUGEINT) * _sy), 1)
                AS BIGINT) AS f_r2_ppm
    FROM stats
    ORDER BY f_lag
"""
QUERIES["q_autocorr_lag"] = q_autocorr_lag


# ---------------------------------------------------------------------------
# Co-occurrence lift over daily user baskets (feature-cross screening)
# ---------------------------------------------------------------------------


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-TYPE co-occurrence LIFT over daily user baskets,
    ORACLE-GATED — the market-basket statistic feature engineering uses
    to screen feature CROSSES: a basket is the distinct event-type set
    of one (user, day); for every unordered type pair,
    lift = P(a,b) / (P(a)·P(b)) spelled exactly as
    C(a,b)·N·1e6 DIV (C(a)·C(b)) with N the basket count. Output: one
    row per pair (a < b) — support counts and lift ppm.

    Scale: the distinct (user, day, type) frame is one combinable
    aggregate; the pair self-join is EQUI on (user, day) with per-basket
    multiplicity bounded by the TYPE DOMAIN (~5), so pairs are linear in
    baskets; marginals aggregate the same distinct frame (one _ckpt cut,
    one scan); the output domain is |types|² / 2."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # r18 (the q_graph_triangles treatment): ONE (user, day) exchange
    # builds each basket's SORTED distinct type set directly
    # (collect_set = the old projection-distinct, minus NULL types —
    # harmless: the old `_ty < _ty` pair join never emitted NULLs, the
    # NULL marginal never joined back, and a basket whose only type is
    # NULL still keeps its group row so the basket count is unchanged);
    # pairs expand ROW-LOCALLY (i < j over the sorted distinct set = the
    # strict `a._ty < b._ty` pair set), and the marginals and basket
    # count ride the SAME checkpointed frame — the old spelling paid a
    # distinct exchange, a two-sided sorted self-join, and a second
    # distinct for the basket count.
    byb = _ckpt(
        ev.select(
            "user_id",
            F.expr(
                "CAST(unix_timestamp(date_trunc('day', ts)) AS BIGINT)"
            ).alias("_ds"),
            F.col("event_type").alias("_ty"),
        )
        .groupBy("user_id", "_ds")
        .agg(F.expr("array_sort(collect_set(_ty))").alias("_ts"))
    )
    n_baskets = byb.agg(F.count("*").cast("long").alias("_N"))
    singles = byb.select(F.explode("_ts").alias("_ty")).groupBy("_ty").agg(
        F.count("*").cast("long").alias("_c")
    )
    pair = (
        byb.select(
            F.explode(
                F.expr(
                    "flatten(transform(_ts, (x, i) ->"
                    " transform(slice(_ts, i + 2, size(_ts)),"
                    " y -> struct(x AS a, y AS b))))"
                )
            ).alias("_pr")
        )
        .groupBy(
            F.col("_pr.a").alias("f_type_a"),
            F.col("_pr.b").alias("f_type_b"),
        )
        .agg(F.count("*").cast("long").alias("f_both"))
    )
    sa = singles.select(
        F.col("_ty").alias("f_type_a"), F.col("_c").alias("f_n_a")
    )
    sb = singles.select(
        F.col("_ty").alias("f_type_b"), F.col("_c").alias("f_n_b")
    )
    return (
        pair.join(F.broadcast(sa), "f_type_a")
        .join(F.broadcast(sb), "f_type_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "f_type_a",
            "f_type_b",
            "f_both",
            "f_n_a",
            "f_n_b",
            F.expr(
                "CAST(CAST(f_both AS DECIMAL(38,0)) * _N * 1000000"
                " DIV GREATEST(CAST(f_n_a AS DECIMAL(38,0)) * f_n_b, 1)"
                " AS BIGINT)"
            ).alias("f_lift_ppm"),
        )
        .orderBy("f_type_a", "f_type_b")
    )


ORACLE["q_basket_lift"] = """
    WITH basket AS (
        SELECT DISTINCT user_id,
               CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS _ds,
               event_type AS _ty
        FROM events WHERE ts IS NOT NULL
    ),
    nb AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS _N
        FROM (SELECT DISTINCT user_id, _ds FROM basket)
    ),
    singles AS (
        SELECT _ty, CAST(COUNT(*) AS BIGINT) AS _c FROM basket GROUP BY _ty
    ),
    pair AS (
        SELECT a._ty AS f_type_a, b._ty AS f_type_b,
               CAST(COUNT(*) AS BIGINT) AS f_both
        FROM basket a
        JOIN basket b
          ON a.user_id = b.user_id AND a._ds = b._ds AND a._ty < b._ty
        GROUP BY 1, 2
    )
    SELECT f_type_a, f_type_b, f_both,
           sa._c AS f_n_a, sb._c AS f_n_b,
           CAST(CAST(f_both AS HUGEINT) * _N * 1000000
                // GREATEST(CAST(sa._c AS HUGEINT) * sb._c, 1)
                AS BIGINT) AS f_lift_ppm
    FROM pair
    JOIN singles sa ON pair.f_type_a = sa._ty
    JOIN singles sb ON pair.f_type_b = sb._ty
    CROSS JOIN nb
    ORDER BY f_type_a, f_type_b
"""
QUERIES["q_basket_lift"] = q_basket_lift


# ---------------------------------------------------------------------------
# ISO-weekday seasonality profile
# ---------------------------------------------------------------------------


def q_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-WEEKDAY seasonality profile of the event stream,
    ORACLE-GATED — the day-of-week shape q_autocorr_lag's lag-7 signal
    summarizes: per ISO weekday (1 = Monday … 7 = Sunday), events,
    share ppm, distinct users. The portable spelling is Spark
    ``weekday(ts) + 1`` == DuckDB ``isodow(ts)`` (Spark ``dayofweek``
    is Sunday-1 and DuckDB ``dayofweek`` Sunday-0 — both rejected).

    Scale: one combinable agg onto the FIXED 7-value domain + the
    standard two-phase distinct-user expansion."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    wd = ev.groupBy(
        F.expr("CAST(weekday(ts) + 1 AS BIGINT)").alias("f_isodow")
    ).agg(
        F.count("*").cast("long").alias("f_events"),
        F.countDistinct("user_id").cast("long").alias("f_users"),
    )
    wd = _ckpt(wd)
    tot = wd.agg(F.sum("f_events").cast("long").alias("_N"))
    return (
        wd.crossJoin(F.broadcast(tot))
        .select(
            "f_isodow",
            "f_events",
            "f_users",
            F.expr(
                "CAST(f_events * 1000000 DIV GREATEST(_N, 1) AS BIGINT)"
            ).alias("f_share_ppm"),
        )
        .orderBy("f_isodow")
    )


ORACLE["q_weekday_profile"] = """
    WITH wd AS (
        SELECT CAST(isodow(ts) AS BIGINT) AS f_isodow,
               CAST(COUNT(*) AS BIGINT) AS f_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS f_users
        FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(f_events) AS BIGINT) AS _N FROM wd)
    SELECT f_isodow, f_events, f_users,
           CAST(f_events * 1000000 // GREATEST(_N, 1) AS BIGINT)
               AS f_share_ppm
    FROM wd CROSS JOIN tot
    ORDER BY f_isodow
"""
QUERIES["q_weekday_profile"] = q_weekday_profile
