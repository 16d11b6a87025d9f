"""Relational query surface, part 6 — round-10 second wave.

Same contract as ``relational.py``..``relational5.py``: DataFrame-first
Spark implementations with DuckDB oracle twins (identical aliases both
sides, exact integer/decimal arithmetic, deterministic output). This
wave adds the feature-engineering statistics a training-data pipeline
computes over label/category columns before a model ever sees a row:

- chi-squared association between two categorical columns (feature
  selection / leakage screening) in exact rational arithmetic;
- m-estimate target encoding (the smoothed category->mean feature that
  replaces high-cardinality one-hots) with integer-cents exactness;
- decile lift over customer spend (campaign-targeting lift tables) on
  the distributed global-ntile machinery — no single-task sort;
- hashing-trick feature buckets (signed feature hashing a la Vowpal
  Wabbit) over corpus tokens with the portable md5 hash both engines
  replay bit-for-bit.

Reference frame: the reference's feature-view bodies are arbitrary
SELECTs over sources (/root/reference/macros/materializations/
feature_view.sql:126); these keys pin the aggregate shapes those
bodies take when the FV is a model-feature table.
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
    """Register-then-checkpoint (the relational5/ranks discipline):
    lineage cut for a multiply-referenced frame, with the pre-cut plan
    registered so PLANS.md audits still see its exchanges."""
    from ..plans import inspect as plan_inspect

    plan_inspect.register_subplan(df)
    return df.localCheckpoint(eager=False)


# ---------------------------------------------------------------------------
# Chi-squared association between two categorical columns (exact rational)
# ---------------------------------------------------------------------------


def q_chi2_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared association lang x source over documents,
    ORACLE-GATED — the categorical feature-selection statistic
    (is `source` informative about `lang`?). Per contingency cell:
    observed count, expected count in ppm, and the cell's chi^2
    contribution in ppm, all in EXACT arithmetic: (O - E)^2 / E =
    (O*N - R*C)^2 / (N*R*C) clears every denominator, the square runs
    in DECIMAL(38,0) (DuckDB HUGEINT) so no IEEE rounding enters, and
    the ppm scaling is integer DIV on both engines.

    Scale: one map-side-combinable groupBy over the fact table builds
    the contingency table; row/column marginals aggregate THAT table
    (category-domain-sized, not SF-proportional), so the marginal joins
    broadcast a bounded frame. DECIMAL(38,0) holds the squared term up
    to N ~ 3e7 docs at ppm scale; past that, drop the ppm factor to
    reach N ~ 1e9 or switch the contribution to DOUBLE (the gate needs
    the exact form; a 100 TB run reads the same plan with the wider
    type)."""
    d = _t(spark, sf_dir, "documents")
    # the contingency table is referenced FOUR times (cells + three
    # marginals) — checkpoint it so the fact table scans ONCE; the
    # checkpointed frame is category-domain-sized, not SF-proportional
    obs = _ckpt(
        d.groupBy("lang", "source").agg(
            F.count("*").cast("long").alias("f_obs")
        )
    )
    rows = obs.groupBy("lang").agg(F.sum("f_obs").cast("long").alias("_R"))
    cols = obs.groupBy("source").agg(F.sum("f_obs").cast("long").alias("_C"))
    tot = obs.groupBy().agg(F.sum("f_obs").cast("long").alias("_N"))
    cell = (
        obs.join(F.broadcast(rows), "lang")
        .join(F.broadcast(cols), "source")
        .crossJoin(F.broadcast(tot))
    )
    return cell.select(
        "lang",
        "source",
        "f_obs",
        F.expr(
            "CAST(CAST(_R AS DECIMAL(19,0)) * CAST(_C AS DECIMAL(19,0))"
            " * 1000000 DIV CAST(_N AS DECIMAL(19,0)) AS BIGINT)"
        ).alias("f_exp_ppm"),
        F.expr(
            "CAST(CAST(f_obs * _N - _R * _C AS DECIMAL(19,0))"
            " * CAST(f_obs * _N - _R * _C AS DECIMAL(19,0)) * 1000000"
            " DIV (CAST(_N AS DECIMAL(19,0)) * CAST(_R AS DECIMAL(19,0))"
            " * CAST(_C AS DECIMAL(19,0))) AS BIGINT)"
        ).alias("f_contrib_ppm"),
    )


ORACLE["q_chi2_assoc"] = """
    WITH obs AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS f_obs
        FROM documents GROUP BY lang, source
    ),
    r AS (SELECT lang, CAST(SUM(f_obs) AS BIGINT) AS _R FROM obs GROUP BY lang),
    c AS (SELECT source, CAST(SUM(f_obs) AS BIGINT) AS _C FROM obs GROUP BY source),
    n AS (SELECT CAST(SUM(f_obs) AS BIGINT) AS _N FROM obs)
    SELECT obs.lang, obs.source, obs.f_obs,
           CAST(CAST(_R AS HUGEINT) * _C * 1000000 // _N AS BIGINT)
               AS f_exp_ppm,
           CAST((CAST(f_obs AS HUGEINT) * _N - CAST(_R AS HUGEINT) * _C)
                * (CAST(f_obs AS HUGEINT) * _N - CAST(_R AS HUGEINT) * _C)
                * 1000000
                // (CAST(_N AS HUGEINT) * _R * _C) AS BIGINT)
               AS f_contrib_ppm
    FROM obs
    JOIN r ON obs.lang = r.lang
    JOIN c ON obs.source = c.source
    CROSS JOIN n
"""
QUERIES["q_chi2_assoc"] = q_chi2_assoc


# ---------------------------------------------------------------------------
# m-estimate target encoding (smoothed category mean, integer cents)
# ---------------------------------------------------------------------------

_TE_M = 25  # m-estimate pseudo-count


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m-ESTIMATE TARGET ENCODING of o_orderpriority against order
    value, ORACLE-GATED: enc = (sum + m*prior) / (cnt + m) — the
    smoothed category->mean feature that replaces a high-cardinality
    one-hot in tabular models. Order totals go to integer cents via
    the half-up floor spelling; the global prior is an integer DIV
    mean; the encoding itself is one BIGINT DIV, so both engines agree
    to the last cent. f_shrink_ppm = cnt/(cnt+m) exposes how much of
    each encoding is data vs prior.

    Scale: two map-side-combinable aggregates (per-category + global)
    over the fact table; the category frame is domain-sized. BIGINT
    cents hold to ~9e16 dollars of turnover per category; a 100 TB run
    widens the sums to DECIMAL(38,0) in the same plan."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
        ).alias("_cents"),
    )
    per = o.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("f_cnt"),
        F.sum("_cents").cast("long").alias("f_sum_cents"),
    )
    g = o.groupBy().agg(
        F.expr("CAST(sum(_cents) DIV count(*) AS BIGINT)").alias(
            "f_prior_cents"
        )
    )
    return per.crossJoin(F.broadcast(g)).select(
        "o_orderpriority",
        "f_cnt",
        "f_sum_cents",
        "f_prior_cents",
        F.expr(
            f"CAST((f_sum_cents + {_TE_M} * f_prior_cents)"
            f" DIV (f_cnt + {_TE_M}) AS BIGINT)"
        ).alias("f_enc_cents"),
        F.expr(
            f"CAST(f_cnt * 1000000 DIV (f_cnt + {_TE_M}) AS BIGINT)"
        ).alias("f_shrink_ppm"),
    )


ORACLE["q_target_encode"] = f"""
    WITH o AS (
        SELECT o_orderpriority,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS _cents
        FROM orders
    ),
    per AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS f_cnt,
               CAST(SUM(_cents) AS BIGINT) AS f_sum_cents
        FROM o GROUP BY o_orderpriority
    ),
    g AS (
        SELECT CAST(SUM(_cents) // COUNT(*) AS BIGINT) AS f_prior_cents
        FROM o
    )
    SELECT o_orderpriority, f_cnt, f_sum_cents, f_prior_cents,
           CAST((f_sum_cents + {_TE_M} * f_prior_cents)
                // (f_cnt + {_TE_M}) AS BIGINT) AS f_enc_cents,
           CAST(f_cnt * 1000000 // (f_cnt + {_TE_M}) AS BIGINT)
               AS f_shrink_ppm
    FROM per CROSS JOIN g
"""
QUERIES["q_target_encode"] = q_target_encode


# ---------------------------------------------------------------------------
# Decile lift table over customer spend (distributed global ntile)
# ---------------------------------------------------------------------------


def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECILE LIFT TABLE over customer spend, ORACLE-GATED — the
    campaign-targeting table: rank customers by total spend
    descending, cut into 10 equal buckets, report each decile's share
    of total spend as lift vs a uniform decile (1e6 ppm = average).
    The decile comes from ranks.global_ntile (range exchange +
    prefix-sum offsets — NO unpartitioned window; the q_rfm / q_gini
    discipline), matching SQL NTILE(10) exactly including the
    remainder rule. The lift numerator runs in DECIMAL(25,0)
    (spend_cents * 1e7 passes 2^63 already at sf0.1) with integer DIV
    on both engines.

    Scale: one groupBy(custkey) aggregate, the P-row range-exchange
    collect, one decile aggregate. No data-proportional window."""
    from ..functions.ranks import global_ntile

    spend = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))"
                " AS BIGINT)"
            ).alias("_spend_cents")
        )
    )
    deciled = global_ntile(
        spend,
        [F.col("_spend_cents").desc(), F.col("o_custkey").asc()],
        10,
        out_col="f_decile",
    )
    per = deciled.groupBy("f_decile").agg(
        F.count("*").cast("long").alias("f_customers"),
        F.sum("_spend_cents").cast("long").alias("f_spend_cents"),
    )
    tot = per.groupBy().agg(
        F.sum("f_spend_cents").cast("long").alias("_tot")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "f_decile",
        "f_customers",
        "f_spend_cents",
        F.expr(
            "CAST(CAST(f_spend_cents AS DECIMAL(25,0)) * 10000000"
            " DIV CAST(_tot AS DECIMAL(25,0)) AS BIGINT)"
        ).alias("f_lift_ppm"),
    )


ORACLE["q_decile_lift"] = """
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS _spend_cents
        FROM orders GROUP BY o_custkey
    ),
    deciled AS (
        SELECT _spend_cents,
               CAST(NTILE(10) OVER (
                   ORDER BY _spend_cents DESC, o_custkey ASC
               ) AS BIGINT) AS f_decile
        FROM spend
    ),
    per AS (
        SELECT f_decile,
               CAST(COUNT(*) AS BIGINT) AS f_customers,
               CAST(SUM(_spend_cents) AS BIGINT) AS f_spend_cents
        FROM deciled GROUP BY f_decile
    ),
    tot AS (SELECT CAST(SUM(f_spend_cents) AS BIGINT) AS _tot FROM per)
    SELECT f_decile, f_customers, f_spend_cents,
           CAST(CAST(f_spend_cents AS HUGEINT) * 10000000 // _tot AS BIGINT)
               AS f_lift_ppm
    FROM per CROSS JOIN tot
"""
QUERIES["q_decile_lift"] = q_decile_lift


# ---------------------------------------------------------------------------
# Signed feature hashing (hashing trick) over corpus tokens
# ---------------------------------------------------------------------------

_FH_BUCKETS = 64


def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIGNED FEATURE HASHING (the Vowpal-Wabbit hashing trick) over
    corpus tokens, ORACLE-GATED: tok -> bucket via the portable md5
    spelling (Spark ``conv(substr(md5,1,8),16,10)`` == DuckDB
    ``('0x'||substr(md5,1,8))::BIGINT``), sign from the 9th hex digit's
    parity — the collision-cancelling +/-1 of Weinberger et al. Output
    is the per-bucket corpus profile: documents touching the bucket,
    unsigned token mass, and the signed mass a linear model would see.

    Scale: tokenize -> one (doc, tok) count (map-side combinable) ->
    bucket hash is a projection -> two keyed aggregates whose final
    key domain is the FIXED 64-bucket space. No vocabulary-sized
    shuffle key ever carries a skewed stop-word: the bucket key mixes
    them uniformly by construction — that IS the hashing trick's
    scale story."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count("*").cast("long").alias("_tf")
    )
    hashed = tf.select(
        "doc_id",
        "_tf",
        F.expr(
            "CAST(conv(substring(md5(concat('fh:', tok)), 1, 8), 16, 10)"
            f" AS BIGINT) % {_FH_BUCKETS}"
        ).alias("f_bucket"),
        F.expr(
            "CASE WHEN CAST(conv(substring(md5(concat('fh:', tok)), 9, 1),"
            " 16, 10) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END"
        ).alias("_sign"),
    )
    per_doc = hashed.groupBy("doc_id", "f_bucket").agg(
        F.sum("_tf").cast("long").alias("_mass"),
        F.sum(F.col("_sign") * F.col("_tf")).cast("long").alias("_signed"),
    )
    return per_doc.groupBy("f_bucket").agg(
        F.count("*").cast("long").alias("f_docs"),
        F.sum("_mass").cast("long").alias("f_mass"),
        F.sum("_signed").cast("long").alias("f_signed_mass"),
    )


# ---------------------------------------------------------------------------
# Exact median + MAD robust outliers (distributed rank, no global window)
# ---------------------------------------------------------------------------

_MAD_K_E4 = 44478  # 3 * 1.4826 (normal-consistency factor) at 1e4 fixed point


def q_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT MEDIAN + MAD robust outlier fences, ORACLE-GATED — the
    robust-statistics anomaly screen (median/MAD survives the heavy
    tails that wreck mean/stddev z-scores). Median = the lower-median
    element at rank (n+1) DIV 2 via ranks.global_row_number (range
    exchange + prefix offsets — NO unpartitioned window); MAD = the
    same rank spelling over |x − median|; a row is an outlier when
    |x − med|·10⁴ > 44478·MAD (3σ-equivalent, integer fixed point).
    Output: per-priority totals + outlier counts with the shared
    median/MAD columns — every number a BIGINT both engines replay.

    Scale (r18): both order statistics come from
    ranks.bounded_kth_smallest — two bounded histogram collects each
    over the SCHEMA-bounded cents domain (map-combinable aggregates,
    zero fact shuffles), falling back to the ranked range-exchange
    spelling above the domain gate. One final aggregate."""
    from ..functions.ranks import bounded_kth_smallest, global_row_number

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "_c"
        ),
    )
    # r18: both selections ride ranks.bounded_kth_smallest — the cents
    # domain is SCHEMA-bounded (o_totalprice ≤ ~$560k at any SF, so ≤
    # ~860 2^16-wide buckets; deviations are bounded by the same
    # range), and the k-th smallest VALUE ignores the tiebreak, so the
    # histogram selection equals the rank spelling exactly. Replaces
    # TWO full global-rank passes (each a sampled range exchange +
    # checkpoint + P-row collect) with four bounded map-combinable
    # histogram collects and ZERO fact shuffles. The scalars enter the
    # plan as literals — driver round-trips of schema-bounded data, the
    # bpe/pagerank bounded-collect discipline. Falls back to the rank
    # machinery if the domain gate is ever exceeded (None).
    med_v = bounded_kth_smallest(o.select("_c"), "_c")
    if med_v is None:  # over-gate fallback: the pre-r18 rank spelling
        n_row = o.groupBy().agg(F.count("*").cast("long").alias("_n"))
        ranked = global_row_number(
            o, [F.col("_c").asc(), F.col("o_orderkey").asc()],
            out_col="_rn",
        )
        med = (
            ranked.crossJoin(F.broadcast(n_row))
            .filter(F.col("_rn") == F.expr("(_n + 1) DIV 2"))
            .select(F.col("_c").alias("_med"))
        )
        dev = o.crossJoin(F.broadcast(med)).withColumn(
            "_dev", F.abs(F.col("_c") - F.col("_med"))
        )
        dev_ranked = global_row_number(
            dev, [F.col("_dev").asc(), F.col("o_orderkey").asc()],
            out_col="_rn",
        )
        mad = (
            dev_ranked.crossJoin(F.broadcast(n_row))
            .filter(F.col("_rn") == F.expr("(_n + 1) DIV 2"))
            .select(F.col("_dev").alias("_mad"))
        )
        flagged = dev.crossJoin(F.broadcast(mad))
    else:
        dev = o.withColumn(
            "_med", F.lit(int(med_v)).cast("long")
        ).withColumn("_dev", F.abs(F.col("_c") - F.col("_med")))
        mad_v = bounded_kth_smallest(dev.select("_dev"), "_dev")
        assert mad_v is not None  # deviations span ≤ the value domain
        flagged = dev.withColumn("_mad", F.lit(int(mad_v)).cast("long"))
    return flagged.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("f_n"),
        F.sum(
            (F.col("_dev") * 10000 > F.lit(_MAD_K_E4) * F.col("_mad"))
            .cast("long")
        )
        .cast("long")
        .alias("f_outliers"),
        F.max("_med").cast("long").alias("f_median_cents"),
        F.max("_mad").cast("long").alias("f_mad_cents"),
    )


ORACLE["q_median_mad"] = f"""
    WITH o AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS _c
        FROM orders
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS _n FROM o),
    med AS (
        SELECT _c AS _med FROM (
            SELECT _c, ROW_NUMBER() OVER (ORDER BY _c, o_orderkey) AS _rn
            FROM o
        ), n WHERE _rn = (_n + 1) // 2
    ),
    dev AS (
        SELECT o.o_orderkey, o.o_orderpriority, o._c,
               ABS(o._c - med._med) AS _dev, med._med
        FROM o CROSS JOIN med
    ),
    mad AS (
        SELECT _dev AS _mad FROM (
            SELECT _dev, ROW_NUMBER() OVER (ORDER BY _dev, o_orderkey) AS _rn
            FROM dev
        ), n WHERE _rn = (_n + 1) // 2
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS f_n,
           CAST(SUM(CASE WHEN _dev * 10000 > {_MAD_K_E4} * _mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS f_outliers,
           CAST(MAX(_med) AS BIGINT) AS f_median_cents,
           CAST(MAX(_mad) AS BIGINT) AS f_mad_cents
    FROM dev CROSS JOIN mad
    GROUP BY o_orderpriority
"""
QUERIES["q_median_mad"] = q_median_mad


# ---------------------------------------------------------------------------
# Temporal train/valid/test split (time-based, leakage-free)
# ---------------------------------------------------------------------------


def q_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL train/valid/test split of the event stream,
    ORACLE-GATED — the leakage-free split a forecasting/CTR pipeline
    uses instead of random sampling: boundaries at 80% / 90% of the
    observed time RANGE (integer epoch-second arithmetic, so both
    engines compute the same cut), each split summarized (events,
    distinct users, decimal-exact value sum). The range endpoints ride
    a broadcast 1-row aggregate.

    Scale: one global min/max aggregate + one map-side-combinable
    grouped aggregate over the assigned split; countDistinct expands
    to the standard two-phase partial-agg plan."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.unix_timestamp("ts").alias("_s"),
    )
    rng = ev.groupBy().agg(
        F.min("_s").alias("_lo"), F.max("_s").alias("_hi")
    )
    tagged = ev.crossJoin(F.broadcast(rng)).withColumn(
        "f_split",
        F.expr(
            "CASE WHEN (_s - _lo) * 10 < (_hi - _lo + 1) * 8 THEN 'train'"
            " WHEN (_s - _lo) * 10 < (_hi - _lo + 1) * 9 THEN 'valid'"
            " ELSE 'test' END"
        ),
    )
    return tagged.groupBy("f_split").agg(
        F.count("*").cast("long").alias("f_events"),
        F.countDistinct("user_id").cast("long").alias("f_users"),
        F.sum(F.col("value").cast("decimal(28,6)"))
        .cast("decimal(28,6)")
        .cast("double")
        .alias("f_value_sum"),
    )


ORACLE["q_time_split"] = """
    WITH ev AS (
        -- FLOOR before the cast: epoch() keeps the microsecond fraction
        -- and ::BIGINT would ROUND, while Spark unix_timestamp() floors
        SELECT user_id, value, CAST(FLOOR(epoch(ts)) AS BIGINT) AS _s
        FROM events
    ),
    rng AS (SELECT MIN(_s) AS _lo, MAX(_s) AS _hi FROM ev),
    tagged AS (
        SELECT user_id, value,
               CASE WHEN (_s - _lo) * 10 < (_hi - _lo + 1) * 8 THEN 'train'
                    WHEN (_s - _lo) * 10 < (_hi - _lo + 1) * 9 THEN 'valid'
                    ELSE 'test' END AS f_split
        FROM ev CROSS JOIN rng
    )
    SELECT f_split,
           CAST(COUNT(*) AS BIGINT) AS f_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS f_users,
           CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DECIMAL(28,6))
                AS DOUBLE) AS f_value_sum
    FROM tagged GROUP BY f_split
"""
QUERIES["q_time_split"] = q_time_split


# ---------------------------------------------------------------------------
# Calibration table: equal-width score bins vs outcome rate
# ---------------------------------------------------------------------------

_CAL_BINS = 10


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALIBRATION TABLE, ORACLE-GATED — the reliability-diagram /
    expected-calibration-error input: treat event `value` as a model
    score and `purchase` as the positive outcome, cut scores into 10
    equal-width cents bins over the observed [min, max], and report
    per-bin volume, positives, and positive-rate ppm. Bin assignment
    is pure integer arithmetic — (c − lo)·B DIV (hi − lo + 1), clamped
    — so both engines agree at every boundary.

    Scale: one global min/max + one combinable grouped aggregate onto
    the FIXED 10-bin key domain. No window, no Python."""
    ev = _t(spark, sf_dir, "events").select(
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("_c"),
        (F.col("event_type") == "purchase").cast("long").alias("_pos"),
    )
    rng = ev.groupBy().agg(
        F.min("_c").alias("_lo"), F.max("_c").alias("_hi")
    )
    binned = ev.crossJoin(F.broadcast(rng)).withColumn(
        "f_bin",
        F.expr(
            f"CAST(least({_CAL_BINS - 1},"
            f" (_c - _lo) * {_CAL_BINS} DIV (_hi - _lo + 1)) AS BIGINT)"
        ),
    )
    return binned.groupBy("f_bin").agg(
        F.count("*").cast("long").alias("f_n"),
        F.sum("_pos").cast("long").alias("f_pos"),
        F.expr(
            "CAST(sum(_pos) * 1000000 DIV count(*) AS BIGINT)"
        ).alias("f_rate_ppm"),
    )


ORACLE["q_calibration_bins"] = f"""
    WITH ev AS (
        SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS _c,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS _pos
        FROM events
    ),
    rng AS (SELECT MIN(_c) AS _lo, MAX(_c) AS _hi FROM ev),
    binned AS (
        SELECT _c, _pos,
               CAST(LEAST({_CAL_BINS - 1},
                    (_c - _lo) * {_CAL_BINS} // (_hi - _lo + 1))
                    AS BIGINT) AS f_bin
        FROM ev CROSS JOIN rng
    )
    SELECT f_bin,
           CAST(COUNT(*) AS BIGINT) AS f_n,
           CAST(SUM(_pos) AS BIGINT) AS f_pos,
           CAST(SUM(_pos) * 1000000 // COUNT(*) AS BIGINT) AS f_rate_ppm
    FROM binned GROUP BY f_bin
"""
QUERIES["q_calibration_bins"] = q_calibration_bins


ORACLE["q_feature_hash"] = f"""
    WITH toks AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
            FROM documents
        ) WHERE length(tok) > 0
    ),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS _tf
        FROM toks GROUP BY doc_id, tok
    ),
    hashed AS (
        SELECT doc_id, _tf,
               ('0x' || substr(md5('fh:' || tok), 1, 8))::BIGINT
                   % {_FH_BUCKETS} AS f_bucket,
               CASE WHEN ('0x' || substr(md5('fh:' || tok), 9, 1))::BIGINT
                         % 2 = 0 THEN 1 ELSE -1 END AS _sign
        FROM tf
    ),
    per_doc AS (
        SELECT doc_id, f_bucket,
               CAST(SUM(_tf) AS BIGINT) AS _mass,
               CAST(SUM(_sign * _tf) AS BIGINT) AS _signed
        FROM hashed GROUP BY doc_id, f_bucket
    )
    SELECT f_bucket,
           CAST(COUNT(*) AS BIGINT) AS f_docs,
           CAST(SUM(_mass) AS BIGINT) AS f_mass,
           CAST(SUM(_signed) AS BIGINT) AS f_signed_mass
    FROM per_doc GROUP BY f_bucket
"""
QUERIES["q_feature_hash"] = q_feature_hash


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (integer A-Res priorities)
# ---------------------------------------------------------------------------

_WS_K = 32


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHT-BIASED deterministic sample, ORACLE-GATED — the
    weighted cousin of q_sample_split that completes the sampling
    family: documents drawn with probability increasing in their
    length. Efraimidis–Spirakis A-Res assigns priority u^(1/w); the
    integer spelling keeps the same stochastic ordering with ZERO
    float ops: priority = h DIV w, h the portable 32-bit md5 hash
    (uniform), w = n_chars — larger weights divide their uniform draw
    down harder, so the k smallest priorities form the weighted
    sample. Fully deterministic (seeded by the hash literal), so
    reproducible across runs AND engines — a property float A-Res
    cannot give cross-engine.

    Scale: one projection + TakeOrderedAndProject (per-partition
    top-K, K·P driver merge). No shuffle beyond the top-K exchange,
    no window."""
    d = _t(spark, sf_dir, "documents")
    pri = d.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("f_weight"),
        F.expr(
            "CAST(conv(substring(md5(concat('ws:', CAST(doc_id AS STRING))),"
            " 1, 8), 16, 10) AS BIGINT)"
        ).alias("_h"),
    ).select(
        "doc_id",
        "f_weight",
        F.expr(
            "CAST(_h DIV greatest(f_weight, 1) AS BIGINT)"
        ).alias("f_priority"),
    )
    return (
        pri.orderBy(F.col("f_priority").asc(), F.col("doc_id").asc())
        .limit(_WS_K)
        .withColumn(
            "f_rank",
            F.row_number()
            .over(Window.orderBy(F.col("f_priority").asc(), F.col("doc_id").asc()))
            .cast("long"),
        )
    )


ORACLE["q_sample_weighted"] = f"""
    WITH pri AS (
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS f_weight,
               CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)),
                     1, 8))::BIGINT
                    // GREATEST(n_chars, 1) AS BIGINT) AS f_priority
        FROM documents
    ),
    top AS (
        SELECT doc_id, f_weight, f_priority
        FROM pri ORDER BY f_priority ASC, doc_id ASC LIMIT {_WS_K}
    )
    SELECT doc_id, f_weight, f_priority,
           CAST(ROW_NUMBER() OVER (ORDER BY f_priority ASC, doc_id ASC)
                AS BIGINT) AS f_rank
    FROM top
"""
QUERIES["q_sample_weighted"] = q_sample_weighted


# ---------------------------------------------------------------------------
# Exact ROC-AUC (Mann-Whitney U with midrank ties, distributed ranks)
# ---------------------------------------------------------------------------


def q_auc_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC, ORACLE-GATED — the Mann–Whitney rank form
    AUC = (Σ_pos rank − P(P+1)/2) / (P·N) with textbook MIDRANK tie
    handling, scoring `value` as the model output and `purchase` as
    the positive class. Everything stays integer: ranks come from
    ranks.global_row_number (range exchange — NO unpartitioned
    window); tied cents values collapse to one group whose DOUBLED
    midrank is min_rank + max_rank (integer, no .5s); the final ratio
    is DECIMAL(38,0) multiply + integer DIV, so DuckDB replays the ppm
    AUC bit-for-bit. One row: positives, negatives, doubled U
    statistic, AUC in ppm.

    Scale: one ranked pass + a distinct-value-keyed aggregate (the
    tie-group reduce is map-side combinable) + a 1-row total. The
    midrank identity Σ_pos 2·midrank = Σ_groups pos_g·(lo_g + hi_g)
    avoids ever materializing per-row midranks."""
    from ..functions.ranks import global_row_number

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("_c"),
        (F.col("event_type") == "purchase").cast("long").alias("_pos"),
    )
    ranked = global_row_number(
        ev, [F.col("_c").asc(), F.col("event_id").asc()], out_col="_rn"
    )
    groups = ranked.groupBy("_c").agg(
        F.min("_rn").cast("long").alias("_lo"),
        F.max("_rn").cast("long").alias("_hi"),
        F.sum("_pos").cast("long").alias("_p"),
    )
    agg = groups.groupBy().agg(
        F.sum(F.col("_p") * (F.col("_lo") + F.col("_hi")))
        .cast("long")
        .alias("_sum2r"),
        F.sum("_p").cast("long").alias("f_pos"),
        F.sum(F.col("_hi") - F.col("_lo") + 1 - F.col("_p"))
        .cast("long")
        .alias("f_neg"),
    )
    return agg.select(
        "f_pos",
        "f_neg",
        F.expr("CAST(_sum2r - f_pos * (f_pos + 1) AS BIGINT)").alias(
            "f_u2"
        ),
        F.expr(
            "CAST(CAST(_sum2r - f_pos * (f_pos + 1) AS DECIMAL(38,0))"
            " * 1000000 DIV greatest(CAST(2 AS DECIMAL(38,0)) * f_pos * f_neg,"
            " CAST(1 AS DECIMAL(38,0)))"
            " AS BIGINT)"
        ).alias("f_auc_ppm"),
    )


ORACLE["q_auc_mann_whitney"] = """
    WITH ev AS (
        SELECT event_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS _c,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS _pos
        FROM events
    ),
    ranked AS (
        SELECT _c, _pos,
               CAST(ROW_NUMBER() OVER (ORDER BY _c, event_id) AS BIGINT)
                   AS _rn
        FROM ev
    ),
    groups AS (
        SELECT _c,
               CAST(MIN(_rn) AS BIGINT) AS _lo,
               CAST(MAX(_rn) AS BIGINT) AS _hi,
               CAST(SUM(_pos) AS BIGINT) AS _p
        FROM ranked GROUP BY _c
    ),
    agg AS (
        SELECT CAST(SUM(_p * (_lo + _hi)) AS BIGINT) AS _sum2r,
               CAST(SUM(_p) AS BIGINT) AS f_pos,
               CAST(SUM(_hi - _lo + 1 - _p) AS BIGINT) AS f_neg
        FROM groups
    )
    SELECT f_pos, f_neg,
           CAST(_sum2r - f_pos * (f_pos + 1) AS BIGINT) AS f_u2,
           CAST(CAST(_sum2r - f_pos * (f_pos + 1) AS HUGEINT) * 1000000
                // GREATEST(CAST(2 AS HUGEINT) * f_pos * f_neg, 1) AS BIGINT)
               AS f_auc_ppm
    FROM agg
"""
QUERIES["q_auc_mann_whitney"] = q_auc_mann_whitney


# ---------------------------------------------------------------------------
# Diversity-capped global top-K (budgeted selection with per-group cap)
# ---------------------------------------------------------------------------

_DIV_CAP = 5    # max docs per source
_DIV_BUDGET = 60  # global selection budget


def q_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIVERSITY-CAPPED GLOBAL TOP-K, ORACLE-GATED — the curation
    selection rule every training-mix builder applies: take the
    globally best 60 documents by length (the quality proxy here) but
    never more than 5 from any one source, so no domain floods the
    budget. Two-level ranking: a per-source window (PARTITIONED —
    source-keyed, shuffle-parallel) keeps each source's local top-5;
    the global cut over the capped survivors rides
    ranks.global_row_number (range exchange — NO unpartitioned
    window). Both levels break ties by doc_id, so the selection is a
    total order both engines replay.

    Scale: the partitioned window shuffles once on source (skewed
    mega-sources cost their own partition, and the cap means only 5
    rows survive per source into the global stage); the global stage
    ranks at most 5·|sources| rows."""
    from ..functions.ranks import global_row_number

    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("f_len").desc(), F.col("doc_id").asc()
    )
    capped = (
        d.select("doc_id", "source", F.col("n_chars").cast("long").alias("f_len"))
        .withColumn("f_source_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("f_source_rank") <= _DIV_CAP)
    )
    ranked = global_row_number(
        capped,
        [F.col("f_len").desc(), F.col("doc_id").asc()],
        out_col="f_grank",
    )
    return ranked.filter(F.col("f_grank") <= _DIV_BUDGET).select(
        "doc_id",
        "source",
        "f_len",
        "f_source_rank",
        F.col("f_grank").cast("long").alias("f_grank"),
    )


ORACLE["q_diverse_topk"] = f"""
    WITH capped AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS f_len,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY n_chars DESC, doc_id ASC
               ) AS BIGINT) AS f_source_rank
        FROM documents
        QUALIFY f_source_rank <= {_DIV_CAP}
    )
    SELECT doc_id, source, f_len, f_source_rank,
           CAST(ROW_NUMBER() OVER (ORDER BY f_len DESC, doc_id ASC)
                AS BIGINT) AS f_grank
    FROM capped
    QUALIFY f_grank <= {_DIV_BUDGET}
"""
QUERIES["q_diverse_topk"] = q_diverse_topk


# ---------------------------------------------------------------------------
# Quantile normalization across sources (distribution alignment)
# ---------------------------------------------------------------------------

_QN_BINS = 20


def q_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE NORMALIZATION across sources, ORACLE-GATED — the
    batch-effect correction step (microarray lineage, reused for
    cross-crawl feature alignment): replace every source's length
    distribution by the GLOBAL one, quantile by quantile. Per-source
    vigintiles come from a PARTITIONED window (source-keyed,
    shuffle-parallel); the global vigintile targets come from
    ranks.global_ntile (range exchange — NO unpartitioned window) +
    half-up integer bucket means (the q_cluster_kmeans exactness
    trick). Output: one row per (source, bucket) with its row count,
    the source-local half-up mean, and the globally-mapped value every
    member would be replaced by.

    Scale: one keyed window pass + one ranked pass + two combinable
    aggregates; the 20-row mapping and the |sources|-row count frame
    broadcast by construction (the count comes from a groupBy, NOT a
    second order-less window over the data)."""
    from ..functions.ranks import global_ntile

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("_len")
    )
    gl = global_ntile(
        d,
        [F.col("_len").asc(), F.col("doc_id").asc()],
        _QN_BINS,
        out_col="_gb",
    )
    gmap = gl.groupBy("_gb").agg(
        F.expr(
            "CAST(floor(CAST(sum(_len) AS DOUBLE) / count(*) + 0.5)"
            " AS BIGINT)"
        ).alias("f_mapped")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("_len").asc(), F.col("doc_id").asc()
    )
    # SQL NTILE semantics per source, spelled via row_number + count so
    # the remainder rule matches global_ntile's (first n%k buckets one
    # extra row) — NTILE() itself would also work; this keeps ONE window
    scnt = d.groupBy("source").agg(F.count("*").cast("long").alias("_cnt"))
    src = (
        d.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(scnt), "source")
        .withColumn(
            "f_bucket",
            F.expr(
                f"CAST(CASE WHEN _cnt % {_QN_BINS} * ((_cnt DIV {_QN_BINS}) + 1)"
                f" >= _rn THEN ((_rn - 1) DIV ((_cnt DIV {_QN_BINS}) + 1)) + 1"
                f" ELSE {_QN_BINS} - (_cnt - _rn) DIV greatest(_cnt DIV {_QN_BINS}, 1)"
                " END AS BIGINT)"
            ),
        )
    )
    per = src.groupBy("source", "f_bucket").agg(
        F.count("*").cast("long").alias("f_n"),
        F.expr(
            "CAST(floor(CAST(sum(_len) AS DOUBLE) / count(*) + 0.5)"
            " AS BIGINT)"
        ).alias("f_src_mean"),
    )
    return per.join(
        F.broadcast(gmap.withColumnRenamed("_gb", "f_bucket")), "f_bucket"
    ).select("source", "f_bucket", "f_n", "f_src_mean", "f_mapped")


ORACLE["q_quantile_norm"] = f"""
    WITH d AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS _len
        FROM documents
    ),
    gl AS (
        SELECT _len,
               CAST(NTILE({_QN_BINS}) OVER (ORDER BY _len, doc_id)
                    AS BIGINT) AS _gb
        FROM d
    ),
    gmap AS (
        SELECT _gb AS f_bucket,
               CAST(floor(CAST(SUM(_len) AS DOUBLE) / COUNT(*) + 0.5)
                    AS BIGINT) AS f_mapped
        FROM gl GROUP BY _gb
    ),
    src AS (
        SELECT source, _len,
               CAST(NTILE({_QN_BINS}) OVER (
                   PARTITION BY source ORDER BY _len, doc_id
               ) AS BIGINT) AS f_bucket
        FROM d
    ),
    per AS (
        SELECT source, f_bucket,
               CAST(COUNT(*) AS BIGINT) AS f_n,
               CAST(floor(CAST(SUM(_len) AS DOUBLE) / COUNT(*) + 0.5)
                    AS BIGINT) AS f_src_mean
        FROM src GROUP BY source, f_bucket
    )
    SELECT per.source, per.f_bucket, per.f_n, per.f_src_mean, gmap.f_mapped
    FROM per JOIN gmap USING (f_bucket)
"""
QUERIES["q_quantile_norm"] = q_quantile_norm


# ---------------------------------------------------------------------------
# Group K-fold assignment (leakage-free cross-validation folds)
# ---------------------------------------------------------------------------

_KFOLD = 5


def q_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP K-FOLD assignment, ORACLE-GATED — the leakage-free CV
    split: every event of a user lands in the SAME fold (GroupKFold),
    fold = portable md5 hash of the GROUP key mod 5, so membership is
    deterministic, engine-portable, and stable under any repartition
    or re-run (sklearn's GroupKFold depends on group iteration order;
    the hash form doesn't). Output: per-fold groups / events /
    positives / decimal-exact value sum — the balance sheet a CV
    harness checks before training.

    Scale: fold id is a projection off the group key (no shuffle to
    assign); the summary is one map-side-combinable aggregate onto the
    FIXED 5-fold domain + one distinct-group count (two-phase
    partial agg)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    tagged = ev.select(
        "user_id",
        "value",
        (F.col("event_type") == "purchase").cast("long").alias("_pos"),
        F.expr(
            "CAST(conv(substring(md5(concat('kf:', CAST(user_id AS STRING))),"
            f" 1, 8), 16, 10) AS BIGINT) % {_KFOLD}"
        ).alias("f_fold"),
    )
    return tagged.groupBy("f_fold").agg(
        F.countDistinct("user_id").cast("long").alias("f_groups"),
        F.count("*").cast("long").alias("f_events"),
        F.sum("_pos").cast("long").alias("f_pos"),
        F.sum(F.col("value").cast("decimal(28,6)"))
        .cast("decimal(28,6)")
        .cast("double")
        .alias("f_value_sum"),
    )


ORACLE["q_group_kfold"] = f"""
    WITH tagged AS (
        SELECT user_id, value,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS _pos,
               ('0x' || substr(md5('kf:' || CAST(user_id AS VARCHAR)),
                1, 8))::BIGINT % {_KFOLD} AS f_fold
        FROM events WHERE user_id IS NOT NULL
    )
    SELECT f_fold,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS f_groups,
           CAST(COUNT(*) AS BIGINT) AS f_events,
           CAST(SUM(_pos) AS BIGINT) AS f_pos,
           CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DECIMAL(28,6))
                AS DOUBLE) AS f_value_sum
    FROM tagged GROUP BY f_fold
"""
QUERIES["q_group_kfold"] = q_group_kfold


# ---------------------------------------------------------------------------
# Per-source token-distribution divergence vs the corpus (exact chi-square)
# ---------------------------------------------------------------------------


def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SOURCE TOKEN-DISTRIBUTION DIVERGENCE vs the corpus,
    ORACLE-GATED — the domain-mix diagnostic behind "which crawl
    drifted?": chi-square divergence chi2(p_s || q) between each
    source's unigram distribution and the corpus distribution, in
    EXACT arithmetic. Per present term, (c*N - C*n)^2 * 1e9 DIV
    (n^2 * N * C) — numerator squared in DECIMAL(38,0)/HUGEINT, each
    term floor-rounded to ppb BEFORE summing (the q_feature_drift
    discipline: the sum is then order-independent). Terms ABSENT from
    a source contribute exactly C_t/N each, so their total is the
    closed form (N - sum_present C) * 1e9 DIV N — no source x vocab
    expansion ever materializes.

    Scale: two map-side-combinable counts (source-term, corpus-term);
    the term join shuffles on tok with NO forced broadcast (a
    web-scale vocabulary is unbounded — the q_tfidf_topterms lesson);
    the final key domain is |sources|."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    # the source-term table is referenced FOUR times (terms + corpus
    # marginal + source totals + grand total) — checkpoint it so the
    # corpus scans once AND the derived joins don't share lineage
    # (shared-lineage same-name columns resolve ambiguously)
    st = _ckpt(
        toks.groupBy("source", "tok").agg(
            F.count("*").cast("long").alias("_c")
        )
    )
    ct = st.groupBy("tok").agg(F.sum("_c").cast("long").alias("_C"))
    ns = st.groupBy("source").agg(F.sum("_c").cast("long").alias("_n"))
    n_tot = st.groupBy().agg(F.sum("_c").cast("long").alias("_N"))
    # all four frames share the checkpoint's lineage and Spark's
    # self-join de-dup exposes duplicate names through the crossJoin
    # branch (the NOTES shared-lineage rule) — resolve by PLAN ID
    # (frame["col"]) into fresh unambiguous names, THEN run the expr
    stj = st.withColumnRenamed("_c", "_cs")
    flat = (
        stj.join(ct, "tok")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(n_tot))
        .select(
            stj["source"],
            stj["_cs"].alias("c_s"),
            ct["_C"].alias("c_t"),
            ns["_n"].alias("n_s"),
            n_tot["_N"].alias("n_t"),
        )
    )
    terms = flat.withColumn(
        "_t_ppb",
        F.expr(
            "CAST(CAST(c_s * n_t - c_t * n_s AS DECIMAL(19,0))"
            " * CAST(c_s * n_t - c_t * n_s AS DECIMAL(19,0)) * 1000000000"
            " DIV (CAST(n_s AS DECIMAL(19,0)) * CAST(n_s AS DECIMAL(19,0))"
            " * CAST(n_t AS DECIMAL(19,0)) * CAST(c_t AS DECIMAL(19,0)))"
            " AS BIGINT)"
        ),
    )
    return terms.groupBy("source").agg(
        F.max("n_s").cast("long").alias("f_tokens"),
        F.count("*").cast("long").alias("f_distinct"),
        F.expr(
            "CAST(sum(_t_ppb)"
            " + CAST((max(n_t) - sum(c_t)) AS BIGINT) * 1000000000"
            "   DIV max(n_t) AS BIGINT)"
        ).alias("f_div_ppb"),
    )


ORACLE["q_source_divergence"] = """
    WITH toks AS (
        SELECT source, tok FROM (
            SELECT source,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
            FROM documents
        ) WHERE length(tok) > 0
    ),
    st AS (
        SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS _c
        FROM toks GROUP BY source, tok
    ),
    ct AS (SELECT tok, CAST(SUM(_c) AS BIGINT) AS _C FROM st GROUP BY tok),
    ns AS (SELECT source, CAST(SUM(_c) AS BIGINT) AS _n FROM st GROUP BY source),
    nt AS (SELECT CAST(SUM(_c) AS BIGINT) AS _N FROM st),
    terms AS (
        -- DuckDB lowercases unquoted identifiers, so _c/_C and _n/_N
        -- COLLIDE case-insensitively (the absent-mass term silently
        -- bound to the wrong column) - distinct names are mandatory
        SELECT st.source, st._c AS c_s, ct._C AS c_t,
               ns._n AS n_s, nt._N AS n_t,
               CAST((CAST(st._c AS HUGEINT) * nt._N - CAST(ct._C AS HUGEINT) * ns._n)
                    * (CAST(st._c AS HUGEINT) * nt._N - CAST(ct._C AS HUGEINT) * ns._n)
                    * 1000000000
                    // (CAST(ns._n AS HUGEINT) * ns._n * nt._N * ct._C)
                    AS BIGINT) AS _t_ppb
        FROM st
        JOIN ct ON st.tok = ct.tok
        JOIN ns ON st.source = ns.source
        CROSS JOIN nt
    )
    SELECT source,
           CAST(MAX(n_s) AS BIGINT) AS f_tokens,
           CAST(COUNT(*) AS BIGINT) AS f_distinct,
           CAST(SUM(_t_ppb)
                + CAST(MAX(n_t) - SUM(c_t) AS BIGINT) * 1000000000
                  // MAX(n_t) AS BIGINT) AS f_div_ppb
    FROM terms GROUP BY source
"""
QUERIES["q_source_divergence"] = q_source_divergence


# ---------------------------------------------------------------------------
# Portable HLL register pipeline (the q_approx_distinct_sketch twin)
# ---------------------------------------------------------------------------

_HLL_M = 64                      # registers
_HLL_2P55 = 1 << 55              # 2^55: fixed-point denominator unit
_HLL_ALPHA_NUM, _HLL_ALPHA_DEN = 709, 1000  # alpha_64 ~= 0.709 as a ratio


def q_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE HLL REGISTER PIPELINE, ORACLE-GATED — the twin that
    puts q_approx_distinct_sketch's algorithm under the hash gate (the
    q_sim_ivf_portable strategy: production keeps the fast JVM sketch,
    the twin replays the identical math with an engine-portable hash).
    60-bit md5 hash -> register index = h mod 64, rho = 55 - bitlen(h
    DIV 64) (bitlen 0 => rho 55) -> per-register MAX -> the harmonic
    denominator as an EXACT integer: sum 2^(55-reg) over hit registers
    plus 2^55 per empty register (clearing 2^-reg to the common
    denominator 2^55 — no float ever) -> raw estimate alpha*m^2*2^55
    DIV regsum with alpha = 709/1000 exact-rational. The bias
    corrections (linear counting etc.) are deliberately NOT here: they
    need ln(), and the production sketch owns that policy — this key
    pins the register construction and harmonic algebra that make HLL
    mergeable. f_exact/f_abs_err ride along as the accuracy witness.

    Scale: one map-side-combinable (type, idx) MAX — the whole sketch
    state is 64 rows per group BY CONSTRUCTION; everything downstream
    is group-count-sized."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    hashed = ev.select(
        "event_type",
        F.expr(
            "CAST(conv(substring(md5(concat('hll:',"
            " CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        ).alias("_h"),
    )
    regs = (
        hashed.select(
            "event_type",
            F.expr(f"CAST(_h % {_HLL_M} AS BIGINT)").alias("_idx"),
            F.expr(
                f"CASE WHEN _h DIV {_HLL_M} = 0 THEN 55"
                f" ELSE 55 - length(bin(_h DIV {_HLL_M})) END"
            ).alias("_rho"),
        )
        .groupBy("event_type", "_idx")
        .agg(F.max("_rho").cast("long").alias("_reg"))
    )
    per = regs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("_nhit"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - _reg AS INT))"))
        .cast("long")
        .alias("_hitsum"),
    )
    scored = per.select(
        "event_type",
        F.col("_nhit").alias("f_hit_regs"),
        F.expr(
            f"CAST(_hitsum + ({_HLL_M} - _nhit)"
            f" * CAST({_HLL_2P55} AS BIGINT) AS BIGINT)"
        ).alias("f_regsum"),
    ).withColumn(
        "f_raw_est",
        F.expr(
            f"CAST(CAST({_HLL_ALPHA_NUM} AS DECIMAL(38,0))"
            f" * {_HLL_M * _HLL_M} * CAST({_HLL_2P55} AS DECIMAL(38,0))"
            f" DIV (CAST({_HLL_ALPHA_DEN} AS DECIMAL(38,0)) * f_regsum)"
            " AS BIGINT)"
        ),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("f_exact")
    )
    return scored.join(exact, "event_type").select(
        "event_type",
        "f_hit_regs",
        "f_regsum",
        "f_raw_est",
        "f_exact",
        F.abs(F.col("f_raw_est") - F.col("f_exact"))
        .cast("long")
        .alias("f_abs_err"),
    )


ORACLE["q_hll_portable"] = f"""
    WITH hashed AS (
        SELECT event_type,
               ('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)),
                1, 15))::BIGINT AS _h
        FROM events WHERE user_id IS NOT NULL
    ),
    regs AS (
        SELECT event_type,
               CAST(_h % {_HLL_M} AS BIGINT) AS _idx,
               CAST(MAX(CASE WHEN _h // {_HLL_M} = 0 THEN 55
                    ELSE 55 - length(bin(_h // {_HLL_M})) END)
                    AS BIGINT) AS _reg
        FROM hashed GROUP BY event_type, _h % {_HLL_M}
    ),
    per AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS f_hit_regs,
               CAST(SUM(CAST(1 AS BIGINT) << CAST(55 - _reg AS INTEGER))
                    + ({_HLL_M} - COUNT(*))
                      * CAST({_HLL_2P55} AS BIGINT) AS BIGINT) AS f_regsum
        FROM regs GROUP BY event_type
    ),
    scored AS (
        SELECT event_type, f_hit_regs, f_regsum,
               CAST(CAST({_HLL_ALPHA_NUM} AS HUGEINT) * {_HLL_M * _HLL_M}
                    * CAST({_HLL_2P55} AS HUGEINT)
                    // (CAST({_HLL_ALPHA_DEN} AS HUGEINT) * f_regsum)
                    AS BIGINT) AS f_raw_est
        FROM per
    ),
    exact AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS f_exact
        FROM events WHERE user_id IS NOT NULL GROUP BY event_type
    )
    SELECT s.event_type, s.f_hit_regs, s.f_regsum, s.f_raw_est, e.f_exact,
           CAST(ABS(s.f_raw_est - e.f_exact) AS BIGINT) AS f_abs_err
    FROM scored s JOIN exact e ON s.event_type = e.event_type
"""
QUERIES["q_hll_portable"] = q_hll_portable
