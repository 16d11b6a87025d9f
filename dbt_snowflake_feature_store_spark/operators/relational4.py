"""Relational query surface, part 4 — round-8 second wave.

Same contract as ``relational*.py``: DataFrame-first Spark
implementations with DuckDB oracle twins (identical aliases both sides,
decimal-exact double aggregation, deterministic output — CLAUDE.md
invariants). This wave covers the remaining large-pipeline shapes the
reference's arbitrary-SELECT feature-view bodies imply
(/root/reference/macros/materializations/feature_view.sql:126):

- KMV distinct sketches + sketch-based Jaccard set overlap — the
  portable, set-operation-capable twin of the HLL family
  (functions/sketches.py kmv_*).
- Calendar gap-fill + forward-fill — the daily-feature densification
  every point-in-time training table needs.
- Sketch-driven distribution drift (total-variation + chi²) between
  time periods — feature monitoring off materialized HDR sketches,
  never raw history.
- Salted skew join (functions/skew.salted_left_join) hash-checked
  against the plain join it must be equivalent to.
- Document co-occurrence lift (the exp of PMI) — association mining
  over the token stream in exact integer/IEEE arithmetic.

Every key here avoids transcendental functions entirely (lift ratio
instead of ln-PMI, TVD/chi² instead of ln-PSI): all arithmetic is
BIGINT-exact or single correctly-rounded IEEE ops, so the DuckDB replay
is bit-identical and every key is hash-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_DEC = "decimal(28,6)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.tables import read_table

    return read_table(spark, sf_dir, name)


QUERIES: dict = {}
ORACLE: dict[str, str] = {}


# ---------------------------------------------------------------------------
# KMV distinct sketches
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_SPACE = 1 << 32


def q_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KMV distinct-count sketches (functions/sketches.py
    kmv_*), ORACLE-GATED: distinct users per event type read off
    per-(type, day) k-minimum-hash sketches MERGED across days — the
    incremental distinct recipe with a portable estimator (unlike the
    opaque-binary HLL key q_approx_distinct_sketch, every step here is
    md5-substring + BIGINT arithmetic, so DuckDB replays the identical
    sketch and the merge-exactness is hash-checked, not just
    pytest-asserted; the oracle skips the day stage — min-k of a union
    is the min-k of the min-ks, additive-exact by construction).

    Scale: the daily stage bounds state at k rows per (type, day); the
    merge re-windows ≤ k·days rows per type. The kmv_kmin helper's
    two-stage window (sub-bucketed min-k first) keeps every window
    partition bounded — no data-sized sort anywhere. The merge skips
    the pre-distinct exchange (per-(type, h) multiplicity ≤ #days by
    construction — dense_rank staging, the r15 de-creep), and the
    estimate + k/kth-hash stats come from ONE aggregate over the
    merged sketch instead of two groupBys + a join."""
    from ..functions import sketches as SK

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    daily = SK.kmv_sketch_by_key(
        ev.withColumn("_fs_day", F.to_date("ts")),
        ["event_type", "_fs_day"],
        "user_id",
        k=_KMV_K,
    )
    merged = SK.kmv_kmin(
        daily.select("event_type", "h"),
        ["event_type"],
        k=_KMV_K,
        pre_distinct=False,
    )
    stats = merged.groupBy("event_type").agg(
        F.count("*").cast("long").alias("f_k"),
        F.max("h").cast("long").alias("f_kth_hash"),
    )
    est = F.when(F.col("f_k") < _KMV_K, F.col("f_k")).otherwise(
        F.expr(
            f"CAST(({_KMV_K} - 1) * {_KMV_SPACE}"
            " DIV greatest(f_kth_hash, 1) AS BIGINT)"
        )
    )
    return stats.select(
        "event_type",
        "f_k",
        "f_kth_hash",
        est.cast("long").alias("f_est_distinct"),
    )


ORACLE["q_kmv_sketch"] = f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    merged AS (
        SELECT event_type, h FROM (
            SELECT event_type, h,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM h
        ) WHERE rn <= {_KMV_K}
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS f_k,
           CAST(MAX(h) AS BIGINT) AS f_kth_hash,
           CAST(CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*)
                ELSE ({_KMV_K} - 1) * {_KMV_SPACE} // GREATEST(MAX(h), 1)
                END AS BIGINT) AS f_est_distinct
    FROM merged GROUP BY event_type
"""


def q_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV SET OPERATIONS, oracle-gated: estimated Jaccard similarity
    of the user sets behind every event-type pair, computed ONLY from
    the per-type k-minimum-hash sketches — the k smallest hashes of
    A ∪ B are a uniform sample of the union, so the fraction of them
    present in both sketches estimates |A∩B| / |A∪B| directly
    (Bar-Yossef et al. 2002). This is the shard-overlap / audience-
    overlap measure a pipeline answers WITHOUT joining raw keys.

    Scale: each sketch is ≤ k rows, so the pair stage is (#groups²/2)
    × 2k rows — group-count-sized, never data-sized; the only
    data-scale pass is building the sketches (one distinct + bounded
    windows). Jaccard is exact integer ppm: both/denom in BIGINT."""
    from ..functions import sketches as SK

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    sk = SK.kmv_sketch_by_key(ev, ["event_type"], "user_id", k=_KMV_K)

    types = sk.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("f_a"),
            F.col("b.event_type").alias("f_b"),
        )
    )
    u = (
        F.broadcast(pairs)
        .join(
            sk,
            (F.col("event_type") == F.col("f_a"))
            | (F.col("event_type") == F.col("f_b")),
        )
        .groupBy("f_a", "f_b", "h")
        .agg(
            F.max((F.col("event_type") == F.col("f_a")).cast("int")).alias("in_a"),
            F.max((F.col("event_type") == F.col("f_b")).cast("int")).alias("in_b"),
        )
    )
    w = Window.partitionBy("f_a", "f_b").orderBy("h")
    kk = u.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= _KMV_K
    )
    return kk.groupBy("f_a", "f_b").agg(
        F.count("*").cast("long").alias("f_denom"),
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long"))
        .cast("long")
        .alias("f_both"),
        F.expr(
            "CAST(CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)"
            " AS BIGINT) * 1000000 DIV COUNT(*) AS BIGINT)"
        ).alias("f_jaccard_ppm"),
    )


ORACLE["q_kmv_jaccard"] = f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    sk AS (
        SELECT event_type, h FROM (
            SELECT event_type, h,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM h
        ) WHERE rn <= {_KMV_K}
    ),
    types AS (SELECT DISTINCT event_type FROM sk),
    pairs AS (
        SELECT a.event_type AS f_a, b.event_type AS f_b
        FROM types a JOIN types b ON a.event_type < b.event_type
    ),
    u AS (
        SELECT p.f_a, p.f_b, s.h,
               MAX(CASE WHEN s.event_type = p.f_a THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN s.event_type = p.f_b THEN 1 ELSE 0 END) AS in_b
        FROM pairs p JOIN sk s
          ON s.event_type = p.f_a OR s.event_type = p.f_b
        GROUP BY p.f_a, p.f_b, s.h
    ),
    kk AS (
        SELECT f_a, f_b, in_a, in_b,
               ROW_NUMBER() OVER (PARTITION BY f_a, f_b ORDER BY h) AS rn
        FROM u
    )
    SELECT f_a, f_b,
           CAST(COUNT(*) AS BIGINT) AS f_denom,
           CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS f_both,
           CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS f_jaccard_ppm
    FROM kk WHERE rn <= {_KMV_K}
    GROUP BY f_a, f_b
"""


# ---------------------------------------------------------------------------
# Calendar gap-fill + forward fill
# ---------------------------------------------------------------------------


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification, oracle-gated: per-user daily spend on
    a COMPLETE calendar — every day from the user's first activity to
    the corpus-wide last day exists in the output, missing days
    forward-filled from the last observed value and flagged. The
    feature-store shape behind every daily snapshot table: a
    point-in-time join against a gappy aggregate silently drops
    entities; densify-then-fill is the standard fix.

    Scale: the daily aggregate is one map-side-combinable exchange; the
    calendar explode is generated per entity (rows = entities × days,
    the OUTPUT size — no data-sized intermediate); the forward-fill
    window is per user over calendar-bounded rows (days, not events).
    The global max day is a 1-row broadcast, not a driver collect."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("f_day")
    ).agg(F.sum(F.col("value").cast(_DEC)).alias("_spend"))
    bounds = daily.groupBy("user_id").agg(F.min("f_day").alias("_lo"))
    gmax = daily.agg(F.max("f_day").alias("_hi"))
    cal = (
        bounds.crossJoin(F.broadcast(gmax))
        .select(
            "user_id",
            F.explode(F.sequence("_lo", "_hi")).alias("f_day"),
        )
    )
    joined = cal.join(daily, ["user_id", "f_day"], "left")
    w = Window.partitionBy("user_id").orderBy("f_day")
    return joined.select(
        "user_id",
        "f_day",
        F.last("_spend", ignorenulls=True)
        .over(w)
        .cast("double")
        .alias("f_spend"),
        F.col("_spend").isNull().cast("long").alias("f_gap"),
    )


ORACLE["q_gap_fill"] = """
    WITH daily AS (
        SELECT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS d,
               SUM(CAST(value AS DECIMAL(28,6))) AS spend
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, MIN(d) AS lo FROM daily GROUP BY 1),
    gmax AS (SELECT MAX(d) AS hi FROM daily),
    cal AS (
        SELECT b.user_id, CAST(u.d AS DATE) AS f_day
        FROM bounds b, gmax g,
             LATERAL (SELECT unnest(generate_series(CAST(b.lo AS TIMESTAMP),
                                                    CAST(g.hi AS TIMESTAMP),
                                                    INTERVAL 1 DAY)) AS d) u
    )
    SELECT c.user_id, c.f_day,
           CAST(LAST_VALUE(dd.spend IGNORE NULLS) OVER (
                PARTITION BY c.user_id ORDER BY c.f_day) AS DOUBLE) AS f_spend,
           CAST(CASE WHEN dd.spend IS NULL THEN 1 ELSE 0 END AS BIGINT) AS f_gap
    FROM cal c LEFT JOIN daily dd
      ON dd.user_id = c.user_id AND dd.d = c.f_day
"""


# ---------------------------------------------------------------------------
# Sketch-driven distribution drift
# ---------------------------------------------------------------------------

_DRIFT_SPLIT = "2024-01-16"


def q_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift per event type between two periods
    (Jan 1–15 vs Jan 16–30), oracle-gated — computed ENTIRELY from
    HDR-sketch bucket counts (functions/sketches.py hdr_bucket), the
    way a monitoring job reads materialized per-period sketches instead
    of re-scanning raw history. Two metrics, both transcendental-free
    so the DuckDB replay is bit-identical: total-variation distance
    ½·Σ|p−q| and the chi-square divergence Σ(p−q)²/q, with add-one
    smoothing over the union bucket set (q > 0 guaranteed). Per-bucket
    terms are floor-rounded to ppb (BIGINT) before summing — the sum
    is then order-independent and exact cross-engine (a raw DOUBLE sum
    would be reduction-order-dependent).

    The ln-based PSI is deliberately NOT the spelling: ln is not
    correctly-rounded in every runtime, and chi² is a first-order
    equivalent drift signal with exact arithmetic.

    Scale: one map-side-combinable exchange to (type, period, bucket)
    counts — bucket universe ≤ ~1000 rows per type regardless of data
    size; the per-type totals window runs over those bounded rows."""
    ev = _t(spark, sf_dir, "events")
    mv = F.round(F.col("value").cast("double") * F.lit(1000000.0)).cast("long")
    from ..functions.sketches import hdr_bucket

    d = ev.select(
        "event_type",
        (F.col("ts") >= F.lit(_DRIFT_SPLIT).cast("timestamp"))
        .cast("int")
        .alias("_p"),
        mv.alias("_mv"),
    ).select("event_type", "_p", hdr_bucket("_mv").alias("bucket"))
    bc = d.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("_p") == 0, 1).otherwise(0)).cast("long").alias("c0"),
        F.sum(F.when(F.col("_p") == 1, 1).otherwise(0)).cast("long").alias("c1"),
    )
    w = Window.partitionBy("event_type")
    t = (
        bc.withColumn("nb", F.count("*").over(w))
        .withColumn("n0", F.sum("c0").over(w))
        .withColumn("n1", F.sum("c1").over(w))
    )
    # identical literal SQL on both engines: every step is one
    # correctly-rounded IEEE op, then floor to ppb BIGINT per term
    t = t.withColumn(
        "pp",
        F.expr("CAST(c0 + 1 AS DOUBLE) / CAST(n0 + nb AS DOUBLE)"),
    ).withColumn(
        "qq",
        F.expr("CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE)"),
    )
    t = t.withColumn(
        "tvd_term",
        F.expr("CAST(floor(abs(pp - qq) / 2 * 1000000000.0 + 0.5) AS BIGINT)"),
    ).withColumn(
        "chi_term",
        F.expr(
            "CAST(floor((pp - qq) * (pp - qq) / qq * 1000000000.0 + 0.5)"
            " AS BIGINT)"
        ),
    )
    return t.groupBy("event_type").agg(
        F.max("n0").cast("long").alias("f_n0"),
        F.max("n1").cast("long").alias("f_n1"),
        F.max("nb").cast("long").alias("f_buckets"),
        F.sum("tvd_term").cast("long").alias("f_tvd_ppb"),
        F.sum("chi_term").cast("long").alias("f_chi_ppb"),
    )


ORACLE["q_feature_drift"] = f"""
    WITH v AS (
        SELECT event_type,
               CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}' THEN 1 ELSE 0 END AS p,
               CAST(ROUND(CAST(value AS DOUBLE) * 1000000.0) AS BIGINT) AS mv
        FROM events
    ),
    b AS (
        SELECT event_type, p,
               CASE WHEN mv < 16 THEN mv
                    ELSE (CAST(length(bin(mv)) AS BIGINT) - 4) * 16
                         + (mv >> (CAST(length(bin(mv)) AS INT) - 5)) - 16
               END AS bucket
        FROM v
    ),
    bc AS (
        SELECT event_type, bucket,
               CAST(SUM(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        FROM b GROUP BY event_type, bucket
    ),
    t AS (
        SELECT event_type, c0, c1,
               COUNT(*) OVER (PARTITION BY event_type) AS nb,
               SUM(c0) OVER (PARTITION BY event_type) AS n0,
               SUM(c1) OVER (PARTITION BY event_type) AS n1
        FROM bc
    ),
    pq AS (
        SELECT event_type, n0, n1, nb,
               CAST(c0 + 1 AS DOUBLE) / CAST(n0 + nb AS DOUBLE) AS pp,
               CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE) AS qq
        FROM t
    )
    SELECT event_type,
           CAST(MAX(n0) AS BIGINT) AS f_n0,
           CAST(MAX(n1) AS BIGINT) AS f_n1,
           CAST(MAX(nb) AS BIGINT) AS f_buckets,
           CAST(SUM(CAST(floor(abs(pp - qq) / 2 * 1000000000.0 + 0.5)
                AS BIGINT)) AS BIGINT) AS f_tvd_ppb,
           CAST(SUM(CAST(floor((pp - qq) * (pp - qq) / qq * 1000000000.0 + 0.5)
                AS BIGINT)) AS BIGINT) AS f_chi_ppb
    FROM pq GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Salted skew join
# ---------------------------------------------------------------------------


def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit salt-and-replicate skew join (functions/skew.
    salted_left_join), ORACLE-GATED against the plain left join it must
    be indistinguishable from: the fact side gets a deterministic
    16-way salt, the dim side replicates 16×, the join key becomes
    (suppkey, salt) — a hot supplier's rows spread over 16 reducers
    instead of one. The oracle is the UNSALTED join: the hash-match IS
    the proof that salting never changes results (dim unique per key ⇒
    replication cancels).

    Scale: this is the fallback for fact⋈dim skew AQE's skew-join
    splitting can't reach (broadcast-disabled dims, one key = 30% of a
    100 TB fact). At sf0.01 Spark will happily broadcast the 100-row
    supplier dim — the salted plan shape (join keys include __fs_salt)
    is what tests/test_scale_plans.py pins."""
    from ..functions.skew import salted_left_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_quantity"
    )
    dim = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("s_nationkey"),
    )
    out = salted_left_join(li, dim, on=["l_suppkey"], num_salts=16)
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.col("s_nationkey").cast("long").alias("f_supp_nation"),
        F.col("l_quantity").alias("f_qty"),
    )


ORACLE["q_join_skew_salted"] = """
    SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey,
           CAST(s.s_nationkey AS BIGINT) AS f_supp_nation,
           l.l_quantity AS f_qty
    FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
"""


# ---------------------------------------------------------------------------
# Document co-occurrence lift (exp-PMI)
# ---------------------------------------------------------------------------


def q_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token association mining, oracle-gated: for every token pair
    co-occurring in ≥ 10 documents (df ≥ 5 each), the LIFT ratio
    N·df(a,b) / (df(a)·df(b)) — the exp of pointwise mutual
    information, monotone-equivalent to PMI for ranking but computable
    in exact arithmetic (BIGINT products < 2^53, one correctly-rounded
    IEEE division, floor to ppm) where ln is not correctly-rounded in
    every runtime. Top-50 by lift with a full (lift, a, b) tiebreak.

    Scale: the pair stage is the quadratic step — it is bounded by
    restricting to the df-thresholded vocabulary (broadcast semi-join)
    BEFORE the per-document self-join, the standard co-occurrence
    guard; doc-frequency aggregates are map-side combinable; the
    corpus size joins in as a 1-row broadcast."""
    from ..plans import inspect as plan_inspect

    def _cut(df: DataFrame) -> DataFrame:
        plan_inspect.register_subplan(df)
        return df.localCheckpoint(eager=False)

    d = _t(spark, sf_dir, "documents")
    # r18: toks fans into dfreq AND the vocabulary-restricted stream,
    # and vocab fans into the semi-join + BOTH marginal broadcasts —
    # without a lineage cut the corpus explode+distinct executed FOUR
    # times per run (the q_pagerank discipline). ONE cut on toks: the
    # corpus pass runs once; vocab stays an Aggregate over the
    # checkpointed stream (three cheap re-aggregations of materialized
    # rows) so its broadcast sides keep the `reduced(...)` label — a
    # checkpointed vocab would be a LogicalRDD the forced-broadcast
    # sweep cannot prove bounded.
    toks = _cut(
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
                "tok"
            ),
        )
        .filter(F.length("tok") > 0)
        .distinct()
    )
    dfreq = toks.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    vocab = dfreq.filter(F.col("df") >= 5)
    vt = toks.join(F.broadcast(vocab.select("tok")), "tok", "left_semi")
    # r18 (the q_graph_triangles r17 treatment): the per-document token
    # self-join (two sorted exchanges + SMJ) becomes ONE doc-keyed
    # collect_list shuffle with the (i < j) pair expansion ROW-LOCAL —
    # per-doc tokens are DISTINCT (toks is distinct), so sorted-array
    # position order i < j is exactly the x.tok < y.tok strict pair set
    # under the same UTF8-binary comparator.
    byd = vt.groupBy("doc_id").agg(
        F.expr("array_sort(collect_list(tok))").alias("_ts")
    )
    pairs = (
        byd.select(
            F.explode(
                F.expr(
                    "flatten(transform(_ts, (x, i) ->"
                    " transform(slice(_ts, i + 2, size(_ts)),"
                    " y -> struct(x AS a, y AS b))))"
                )
            ).alias("_pr")
        )
        .groupBy(F.col("_pr.a").alias("f_a"), F.col("_pr.b").alias("f_b"))
        .agg(F.count("*").cast("long").alias("f_docs_both"))
        .filter(F.col("f_docs_both") >= 10)
    )
    n = d.agg(F.count("*").cast("long").alias("_n"))
    out = (
        pairs.join(
            F.broadcast(vocab.select(F.col("tok").alias("f_a"), F.col("df").alias("f_docs_a"))),
            "f_a",
        )
        .join(
            F.broadcast(vocab.select(F.col("tok").alias("f_b"), F.col("df").alias("f_docs_b"))),
            "f_b",
        )
        .crossJoin(F.broadcast(n))
        .withColumn(
            "f_lift_ppm",
            F.expr(
                "CAST(floor(CAST(_n * f_docs_both AS DOUBLE)"
                " / CAST(f_docs_a * f_docs_b AS DOUBLE)"
                " * 1000000.0 + 0.5) AS BIGINT)"
            ),
        )
    )
    return (
        out.select(
            "f_a", "f_b", "f_docs_both", "f_docs_a", "f_docs_b", "f_lift_ppm"
        )
        .orderBy(F.col("f_lift_ppm").desc(), "f_a", "f_b")
        .limit(50)
    )


ORACLE["q_token_pmi"] = """
    WITH toks AS (
        SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
            FROM documents
        ) WHERE length(tok) > 0
    ),
    dfreq AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
        FROM toks GROUP BY tok
    ),
    vocab AS (SELECT tok, df FROM dfreq WHERE df >= 5),
    vt AS (SELECT t.doc_id, t.tok FROM toks t
           WHERE t.tok IN (SELECT tok FROM vocab)),
    pairs AS (
        SELECT x.tok AS f_a, y.tok AS f_b,
               CAST(COUNT(*) AS BIGINT) AS f_docs_both
        FROM vt x JOIN vt y
          ON x.doc_id = y.doc_id AND x.tok < y.tok
        GROUP BY x.tok, y.tok
        HAVING COUNT(*) >= 10
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS _n FROM documents)
    SELECT p.f_a, p.f_b, p.f_docs_both,
           va.df AS f_docs_a, vb.df AS f_docs_b,
           CAST(floor(CAST(n._n * p.f_docs_both AS DOUBLE)
                / CAST(va.df * vb.df AS DOUBLE)
                * 1000000.0 + 0.5) AS BIGINT) AS f_lift_ppm
    FROM pairs p
    JOIN vocab va ON va.tok = p.f_a
    JOIN vocab vb ON vb.tok = p.f_b, n
    ORDER BY f_lift_ppm DESC, f_a ASC, f_b ASC
    LIMIT 50
"""


# ---------------------------------------------------------------------------
# BPE segmentation with a frozen merge table
# ---------------------------------------------------------------------------


def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION with a frozen merge table
    (functions/bpe.FIXED_MERGES), ORACLE-GATED — the production shape:
    segmentation ships a fixed vocab artifact, so unlike the
    data-dependent q_bpe_train (rows-only by design, 20 learned
    iterations), the apply step IS SQL-replayable: DuckDB re-runs the
    exact rank-sequential greedy fold as a recursive CTE over the
    distinct-word dictionary and the full token sequence of every
    document is hash-checked (sequence order included — f_tokens is
    the '|'-joined stream).

    Scale: the Spark side is ``bpe_segment_by_key`` — the DICTIONARY
    TRICK both engines share (fold each DISTINCT word once on the
    vocab-sized frame, broadcast the word→symbols map onto the
    positional word stream, reassemble per doc): the nested native
    fold runs |vocab| times, not |corpus| times — the same
    vocab-not-corpus insight bpe_train uses (37 s → ~1 s at sf0.1 vs
    the per-instance fold). Zero Python in any row path. Large merge
    tables take the ``bpe_segment_fast`` pandas_udf trie instead
    (equivalence pytest-pinned on this corpus and table)."""
    from ..functions.bpe import bpe_segment_by_key, fixed_merge_table

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    seg = bpe_segment_by_key(d, fixed_merge_table())
    return seg.select(
        "doc_id",
        F.size("bpe_tokens").cast("long").alias("f_n_tokens"),
        F.array_join("bpe_tokens", "|").alias("f_tokens"),
    )


def _bpe_segment_oracle() -> str:
    from ..functions.bpe import END_MARK, FIXED_MERGES, fixed_merge_values_sql

    n = len(FIXED_MERGES)
    return f"""
    WITH RECURSIVE m(rank, l, r) AS (VALUES {fixed_merge_values_sql()}),
    words AS (
        SELECT doc_id, arr, i, arr[i] AS word
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(text), '\\s+') AS arr
              FROM documents),
             LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i) u
    ),
    w(word) AS (SELECT DISTINCT word FROM words),
    init AS (
        SELECT word,
               list_append(string_split(word, ''), '{END_MARK}') AS syms
        FROM w
    ),
    fold(word, rank, pos, syms, acc) AS (
        SELECT word, 0, 1, syms, CAST([] AS VARCHAR[]) FROM init
        UNION ALL
        SELECT f.word,
               CASE WHEN f.pos > len(f.syms) THEN f.rank + 1 ELSE f.rank END,
               CASE WHEN f.pos > len(f.syms) THEN 1 ELSE f.pos + 1 END,
               CASE WHEN f.pos > len(f.syms) THEN f.acc ELSE f.syms END,
               CASE WHEN f.pos > len(f.syms) THEN CAST([] AS VARCHAR[])
                    WHEN len(f.acc) > 0 AND f.acc[-1] = m.l
                         AND f.syms[f.pos] = m.r
                    THEN list_append(f.acc[1:len(f.acc) - 1], m.l || m.r)
                    ELSE list_append(f.acc, f.syms[f.pos]) END
        FROM fold f JOIN m ON m.rank = f.rank
        WHERE f.rank < {n}
    ),
    seg AS (SELECT word, syms FROM fold WHERE rank = {n}),
    flat AS (
        SELECT ws.doc_id,
               flatten(list(s.syms ORDER BY ws.i)) AS toks
        FROM words ws JOIN seg s ON s.word = ws.word
        GROUP BY ws.doc_id
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS f_n_tokens,
           array_to_string(toks, '|') AS f_tokens
    FROM flat
"""


ORACLE["q_bpe_segment"] = _bpe_segment_oracle()


# ---------------------------------------------------------------------------
# Batch exponential time-decay features
# ---------------------------------------------------------------------------


def q_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed spend per user as of the corpus max
    day (half-life = 1 day, horizon 20 days), ORACLE-GATED — the batch
    twin of the streaming ``decayed_value_tws`` operator (rows-only by
    design there; HERE the decay math is hash-checked cross-engine).
    Transcendental-free by construction: half-life-1 weights are exact
    powers of two, so the whole computation is BIGINT — daily micro
    spend × 2^(20−age), summed, shifted back down by 20 bits. Terms
    older than the 20-day horizon carry weight < 2⁻²⁰ ≈ 1e-6 of the
    newest — below the output's micro resolution — and are cut off
    exactly (documented semantics, not an approximation knob).

    Scale: one map-side-combinable exchange to (user, day) daily
    sums — calendar-bounded rows per user after that; the anchor day
    is a 1-row broadcast. No window, no second data-scale pass.
    Overflow headroom: term ≤ spend_micro·2²⁰; a user needs > 8·10¹²
    micro-units (8 million spend units) PER DAY before the 30-term sum
    approaches int64 — the oracle replays SUM in HUGEINT and the cast
    would fail loudly, not wrap."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("_d")
    ).agg(
        (F.sum(F.col("value").cast(_DEC)) * 1000000)
        .cast("long")
        .alias("_spend_micro")
    )
    gmax = daily.agg(F.max("_d").alias("_gmax"))
    t = daily.crossJoin(F.broadcast(gmax)).withColumn(
        "_k", F.datediff("_gmax", "_d")
    )
    term = F.expr(
        "CASE WHEN _k <= 20 THEN"
        " _spend_micro * shiftleft(CAST(1 AS BIGINT), CAST(20 - _k AS INT))"
        " ELSE CAST(0 AS BIGINT) END"
    )
    return t.groupBy("user_id").agg(
        F.max("_d").alias("f_last_day"),
        F.shiftright(F.sum(term).cast("long"), 20)
        .cast("long")
        .alias("f_ewma_micro"),
    )


ORACLE["q_ewma_decay"] = """
    WITH daily AS (
        SELECT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS d,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) * 1000000 AS BIGINT)
                   AS spend_micro
        FROM events GROUP BY 1, 2
    ),
    gmax AS (SELECT MAX(d) AS g FROM daily),
    t AS (
        SELECT user_id, d, spend_micro,
               date_diff('day', d, g.g) AS k
        FROM daily, gmax g
    )
    SELECT user_id,
           MAX(d) AS f_last_day,
           CAST(CAST(SUM(CASE WHEN k <= 20
                THEN spend_micro * (CAST(1 AS BIGINT) << (20 - k))
                ELSE CAST(0 AS BIGINT) END) AS BIGINT) >> 20
                AS BIGINT) AS f_ewma_micro
    FROM t GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Pairwise Pearson correlation of per-type daily series
# ---------------------------------------------------------------------------


def q_event_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between event types' daily-total
    series, ORACLE-GATED — the cross-feature co-movement matrix a
    feature platform reports. Transcendental-free exact arithmetic:
    daily totals round half-up to whole BIGINT units (corr is
    scale-invariant, and whole units keep every sum of products below
    2⁵³ so the one DOUBLE division chain at the end is bit-identical
    cross-engine); variance/covariance use the n·Σxy − Σx·Σy integer
    form; square roots take the repo's portable micro-sqrt spelling
    floor(sqrt(v)·1e6 + 0.5) (IEEE sqrt is correctly rounded —
    deterministic, unlike ln).

    Scale: the series aggregate is one map-side-combinable exchange to
    (type, day) — calendar-bounded output; the pair join runs on that
    bounded table (types × days), never on raw events; the moment
    aggregation is again map-side combinable on the tiny pair key."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("_d")).agg(
        F.expr(
            "CAST(floor(SUM(CAST(value AS DECIMAL(28,6))) + 0.5) AS BIGINT)"
        ).alias("_x")
    )
    j = (
        daily.alias("a")
        .join(
            daily.alias("b"),
            (F.col("a._d") == F.col("b._d"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .select(
            F.col("a.event_type").alias("f_a"),
            F.col("b.event_type").alias("f_b"),
            F.col("a._x").alias("x"),
            F.col("b._x").alias("y"),
        )
    )
    m = j.groupBy("f_a", "f_b").agg(
        F.count("*").cast("long").alias("f_n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("x * y")).cast("long").alias("sxy"),
        F.sum(F.expr("x * x")).cast("long").alias("sxx"),
        F.sum(F.expr("y * y")).cast("long").alias("syy"),
    )
    m = (
        m.withColumn("num", F.expr("f_n * sxy - sx * sy"))
        .withColumn("va", F.expr("f_n * sxx - sx * sx"))
        .withColumn("vb", F.expr("f_n * syy - sy * sy"))
        .filter("va > 0 AND vb > 0")
        .withColumn(
            "sa",
            F.expr(
                "CAST(floor(sqrt(CAST(va AS DOUBLE)) * 1000000.0 + 0.5)"
                " AS BIGINT)"
            ),
        )
        .withColumn(
            "sb",
            F.expr(
                "CAST(floor(sqrt(CAST(vb AS DOUBLE)) * 1000000.0 + 0.5)"
                " AS BIGINT)"
            ),
        )
    )
    return m.select(
        "f_a",
        "f_b",
        "f_n",
        F.expr(
            "CAST(floor(CAST(num AS DOUBLE) * 1000000000000.0"
            " / CAST(sa AS DOUBLE) / CAST(sb AS DOUBLE)"
            " * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("f_corr_ppm"),
    )


ORACLE["q_event_corr"] = """
    WITH daily AS (
        SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS d,
               CAST(floor(SUM(CAST(value AS DECIMAL(28,6))) + 0.5) AS BIGINT)
                   AS x
        FROM events GROUP BY 1, 2
    ),
    j AS (
        SELECT a.event_type AS f_a, b.event_type AS f_b,
               a.x AS x, b.x AS y
        FROM daily a JOIN daily b
          ON a.d = b.d AND a.event_type < b.event_type
    ),
    m AS (
        SELECT f_a, f_b,
               CAST(COUNT(*) AS BIGINT) AS f_n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM j GROUP BY f_a, f_b
    ),
    v AS (
        SELECT f_a, f_b, f_n,
               f_n * sxy - sx * sy AS num,
               f_n * sxx - sx * sx AS va,
               f_n * syy - sy * sy AS vb
        FROM m
    ),
    s AS (
        SELECT f_a, f_b, f_n, num,
               CAST(floor(sqrt(CAST(va AS DOUBLE)) * 1000000.0 + 0.5)
                    AS BIGINT) AS sa,
               CAST(floor(sqrt(CAST(vb AS DOUBLE)) * 1000000.0 + 0.5)
                    AS BIGINT) AS sb
        FROM v WHERE va > 0 AND vb > 0
    )
    SELECT f_a, f_b, f_n,
           CAST(floor(CAST(num AS DOUBLE) * 1000000000000.0
                / CAST(sa AS DOUBLE) / CAST(sb AS DOUBLE)
                * 1000000.0 + 0.5) AS BIGINT) AS f_corr_ppm
    FROM s
"""


# ---------------------------------------------------------------------------
# Integer PageRank over the nation trade graph
# ---------------------------------------------------------------------------

_PR_ITERS = 10
_PR_SCALE = 10**9


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (10 iterations, d=0.85) over the nation trade
    graph — edge (customer nation → supplier nation) weighted by line
    count — ORACLE-GATED: functions/graph.pagerank_integer runs in
    ppb-integer arithmetic (per-edge floor-divided contributions,
    integer damping), so the fixed-iteration result is bit-identical
    to DuckDB replaying the SAME recurrence as ten unrolled CTE
    stages. An ITERATIVE GRAPH ALGORITHM under the hash gate — the
    family (alongside connected components, whose oracle is a
    recursive CTE) that double-precision implementations can never
    gate, because float contribution sums are reduction-order-
    dependent.

    Scale: the edge build is the data-scale part (two fact joins and
    one map-side-combinable agg to the nation-pair key); customer and
    supplier are SF-proportional, so their joins carry NO broadcast
    hint — AQE size-checks them at runtime instead of a forced hint
    that would be honored at 100 TB; only the 25-row nation name join
    is hinted. PageRank then iterates on the GRAPH-sized frame (nodes
    + edges, not events) with one shuffle per round, lineage cut per
    round."""
    from ..functions.graph import pagerank_integer

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count("*").cast("long").alias("w"))
    )
    r = pagerank_integer(
        edges, iterations=_PR_ITERS, scale=_PR_SCALE, damping_pct=85
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return r.join(F.broadcast(n), r.node == n.n_nationkey).select(
        F.col("n_name").alias("f_nation"),
        F.col("r").alias("f_rank_ppb"),
    )


def _pagerank_oracle() -> str:
    stages = []
    for i in range(1, _PR_ITERS + 1):
        stages.append(
            f"""
    it{i} AS (
        SELECT n.node,
               CAST((CAST(15 AS BIGINT) * {_PR_SCALE}) // (nn.n * 100)
                    + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
        FROM nodes n CROSS JOIN nn
        LEFT JOIN (
            SELECT e.dst AS node, SUM((p.r * e.w) // e.ow) AS s
            FROM it{i - 1} p JOIN e ON e.src = p.node
            GROUP BY e.dst
        ) c ON c.node = n.node
    )"""
        )
    return f"""
    WITH edges AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src),
    e AS (SELECT edges.src, edges.dst, edges.w, outw.ow
          FROM edges JOIN outw USING (src)),
    nodes AS (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges
            UNION SELECT dst AS node FROM edges
        )
    ),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    it0 AS (SELECT node, CAST({_PR_SCALE} // nn.n AS BIGINT) AS r
            FROM nodes, nn),{",".join(stages)}
    SELECT na.n_name AS f_nation, p.r AS f_rank_ppb
    FROM it{_PR_ITERS} p JOIN nation na ON na.n_nationkey = p.node
"""


ORACLE["q_pagerank"] = _pagerank_oracle()


QUERIES.update(
    {
        "q_kmv_sketch": q_kmv_sketch,
        "q_kmv_jaccard": q_kmv_jaccard,
        "q_gap_fill": q_gap_fill,
        "q_feature_drift": q_feature_drift,
        "q_join_skew_salted": q_join_skew_salted,
        "q_token_pmi": q_token_pmi,
        "q_bpe_segment": q_bpe_segment,
        "q_ewma_decay": q_ewma_decay,
        "q_event_corr": q_event_corr,
        "q_pagerank": q_pagerank,
    }
)
