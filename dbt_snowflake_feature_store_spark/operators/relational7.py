"""Relational query surface, part 7 — round-11 wave.

Same contract as ``relational.py``..``relational6.py``: DataFrame-first
Spark implementations with DuckDB oracle twins (identical aliases both
sides, exact integer/decimal arithmetic, deterministic output). This
wave adds distribution-drift and model-prep statistics a training-data
pipeline runs between ingestion and training:

- exact two-sample Kolmogorov–Smirnov drift statistic (the
  distribution-shift monitor beside q_chi2_assoc's categorical test) —
  integer cross-multiplied ECDF gap, no IEEE division until nothing is
  compared anymore;
- best Gini split point of a numeric feature against a binary label
  (the 1-node decision-stump scan feature selection uses) in scaled
  integer arithmetic;
- token-weighted median document length per language (robust corpus
  sizing — the weighted twin of q_median_mad's unweighted location);
- churn LABEL GENERATION from the events stream (active this month,
  gone the next — the canonical supervised-label builder);
- per-language source-mix entropy in integer octave bits (the
  q_doc_surprisal ``length(bin(N DIV c)) − 1`` trick — IEEE log2 is
  never correctly-rounded cross-engine);
- stratified k-fold assignment over the embedding corpus by portable
  md5 (per-(label, fold) counts + share — the label-balanced
  counterpart of q_group_kfold / q_time_split).

Reference frame: the reference's feature-view bodies are arbitrary
SELECTs over sources (/root/reference/macros/materializations/
feature_view.sql:126); these keys pin the statistics those bodies
compute when the FV feeds a training pipeline.
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
    """Register-then-checkpoint (the relational5/6 discipline): lineage
    cut for a multiply-referenced frame, with the pre-cut plan
    registered so PLANS.md audits still see its exchanges."""
    from ..plans import inspect as plan_inspect

    plan_inspect.register_subplan(df)
    return df.localCheckpoint(eager=False)


# ---------------------------------------------------------------------------
# Exact two-sample Kolmogorov–Smirnov drift statistic
# ---------------------------------------------------------------------------


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KOLMOGOROV–SMIRNOV statistic between the
    o_totalprice distributions of fulfilled ('F') and non-fulfilled
    orders, ORACLE-GATED — the numeric-feature drift monitor beside
    q_chi2_assoc's categorical test and q_feature_drift's moment
    deltas. D = sup_v |F1(v) − F2(v)| evaluated exactly on the pooled
    step points: per distinct price (half-up integer cents) the two
    cumulative counts, and the gap as the INTEGER cross-multiplication
    |cum1·n2 − cum2·n1| (DECIMAL(38,0)/HUGEINT — exact to n1·n2·1e6 <
    1e38, i.e. n ≈ 3e15 rows; the chi2-key precedent). Output: group
    sizes and D in ppm.

    Scale: the distinct-value frame pre-shrinks the fact scan; BOTH
    cumulative masses ride ONE ranks.global_running_sum range exchange
    (P parallel tasks, never an unpartitioned window); the final max
    is a map-side-combinable 1-row aggregate."""
    o = _t(spark, sf_dir, "orders")
    cents = F.expr(
        "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
    ).alias("v")
    pts = o.select(
        cents,
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("_a"),
        F.when(F.col("o_orderstatus") != "F", 1).otherwise(0).alias("_b"),
    ).groupBy("v").agg(
        F.sum("_a").cast("long").alias("c1"),
        F.sum("_b").cast("long").alias("c2"),
    )
    return ks_from_points(pts)


def ks_from_points(pts: DataFrame) -> DataFrame:
    """Exact two-sample KS (ppm) from a PER-DISTINCT-VALUE count frame
    ``(v, c1, c2)`` — the mergeable drift state: the point frame is a
    keyed SUM aggregate, so a streaming FV maintains it exactly via the
    foreachBatch-MERGE path and drift monitors read the maintained
    table instead of rescanning raw history
    (tests/test_streaming.py TestStreamingDrift parity)."""
    from ..functions.ranks import global_running_sum

    # pts feeds the running sums AND the totals — checkpoint so the
    # upstream (fact scan or maintained-table read) runs ONCE (the
    # q_chi2_assoc discipline)
    pts = _ckpt(pts)
    cum = global_running_sum(
        pts, ["v"], ["c1", "c2"], rank_col="_r", sum_col=["_cum1", "_cum2"]
    )
    tot = pts.agg(
        F.sum("c1").cast("long").alias("f_n1"),
        F.sum("c2").cast("long").alias("f_n2"),
    )
    gap = cum.crossJoin(F.broadcast(tot)).select(
        F.expr(
            "ABS(CAST(_cum1 AS DECIMAL(18,0)) * CAST(f_n2 AS DECIMAL(18,0))"
            " - CAST(_cum2 AS DECIMAL(18,0)) * CAST(f_n1 AS DECIMAL(18,0)))"
        ).alias("_gap")
    )
    d = gap.agg(F.max("_gap").alias("_D"))
    return d.crossJoin(F.broadcast(tot)).select(
        "f_n1",
        "f_n2",
        # GREATEST(·,1): an empty group makes n1·n2 = 0 — Spark DIV
        # would NULL where DuckDB // hard-errors (ADVICE-r11; the
        # q_confusion_metrics denominator discipline)
        F.expr(
            "CAST(_D * 1000000 DIV GREATEST(CAST(f_n1 AS DECIMAL(18,0))"
            " * CAST(f_n2 AS DECIMAL(18,0)), 1) AS BIGINT)"
        ).alias("f_ks_ppm"),
    )


ORACLE["q_ks_drift"] = """
    WITH pts AS (
        SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c2
        FROM orders GROUP BY 1
    ),
    cum AS (
        SELECT v,
               CAST(SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum1,
               CAST(SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum2
        FROM pts
    ),
    tot AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS f_n1,
               CAST(SUM(c2) AS BIGINT) AS f_n2
        FROM pts
    ),
    d AS (
        SELECT MAX(ABS(CAST(cum1 AS HUGEINT) * f_n2
                       - CAST(cum2 AS HUGEINT) * f_n1)) AS _D
        FROM cum CROSS JOIN tot
    )
    SELECT f_n1, f_n2,
           CAST(_D * 1000000
                // GREATEST(CAST(f_n1 AS HUGEINT) * f_n2, 1)
                AS BIGINT) AS f_ks_ppm
    FROM d CROSS JOIN tot
"""
QUERIES["q_ks_drift"] = q_ks_drift


# ---------------------------------------------------------------------------
# Best Gini split point (decision-stump feature scan)
# ---------------------------------------------------------------------------

_GINI_SCALE = 1_000_000_000  # 1e9: exact argmax to N ≈ 3e9 (chi2 precedent)


def q_best_split_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best GINI SPLIT of o_totalprice (half-up integer cents) against
    the binary label o_orderstatus=='F', ORACLE-GATED — the 1-node
    decision-stump scan that ranks numeric features before training.
    For every candidate threshold v (rows with value ≤ v go left),
    minimizing weighted Gini impurity ⟺ maximizing
    (A·R + B·L) / (L·R) with A = Lp² + (L−Lp)², B = Rp² + (R−Rp)² —
    computed as a SCALED INTEGER (· 1e9, truncating DIV: both engines
    truncate identically, so the argmax is portable; exact to
    N³·1e9 < 1e38, N ≈ 3e9 — the chi2-key bound discipline). Ties
    break to the LOWEST threshold. Output: the winning threshold, its
    scaled score, corpus size and positive count.

    Scale: distinct-value pre-aggregate, both cumulative masses on ONE
    ranks.global_running_sum range exchange, and the argmax is
    TakeOrderedAndProject — never a global sort."""
    from ..functions.ranks import global_running_sum

    o = _t(spark, sf_dir, "orders")
    pts = o.select(
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("_p"),
    ).groupBy("v").agg(
        F.count("*").cast("long").alias("ct"),
        F.sum("_p").cast("long").alias("cp"),
    )
    pts = _ckpt(pts)
    cum = global_running_sum(
        pts, ["v"], ["ct", "cp"], rank_col="_r", sum_col=["_cumt", "_cump"]
    )
    tot = pts.agg(
        F.sum("ct").cast("long").alias("f_n"),
        F.sum("cp").cast("long").alias("f_pos"),
    )
    scored = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("_cumt") < F.col("f_n"))  # right side non-empty
        .select(
            "v",
            "f_n",
            "f_pos",
            F.expr(
                f"""CAST((
                    (CAST(_cump AS DECIMAL(38,0)) * _cump
                     + CAST(_cumt - _cump AS DECIMAL(38,0)) * (_cumt - _cump))
                    * (f_n - _cumt)
                    + (CAST(f_pos - _cump AS DECIMAL(38,0)) * (f_pos - _cump)
                       + CAST((f_n - _cumt) - (f_pos - _cump) AS DECIMAL(38,0))
                         * ((f_n - _cumt) - (f_pos - _cump)))
                    * _cumt
                ) * {_GINI_SCALE}
                DIV (CAST(_cumt AS DECIMAL(38,0)) * (f_n - _cumt))
                AS BIGINT)"""
            ).alias("f_score"),
        )
    )
    return (
        scored.orderBy(F.col("f_score").desc(), F.col("v").asc())
        .limit(1)
        .select(
            F.col("v").alias("f_split_cents"), "f_score", "f_n", "f_pos"
        )
    )


ORACLE["q_best_split_gini"] = f"""
    WITH pts AS (
        SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS ct,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS cp
        FROM orders GROUP BY 1
    ),
    cum AS (
        SELECT v,
               CAST(SUM(ct) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cumt,
               CAST(SUM(cp) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cump
        FROM pts
    ),
    tot AS (
        SELECT CAST(SUM(ct) AS BIGINT) AS f_n,
               CAST(SUM(cp) AS BIGINT) AS f_pos
        FROM pts
    ),
    scored AS (
        SELECT v, f_n, f_pos,
               CAST((
                   (CAST(cump AS HUGEINT) * cump
                    + CAST(cumt - cump AS HUGEINT) * (cumt - cump))
                   * (f_n - cumt)
                   + (CAST(f_pos - cump AS HUGEINT) * (f_pos - cump)
                      + CAST((f_n - cumt) - (f_pos - cump) AS HUGEINT)
                        * ((f_n - cumt) - (f_pos - cump)))
                   * cumt
               ) * {_GINI_SCALE}
               // (CAST(cumt AS HUGEINT) * (f_n - cumt)) AS BIGINT)
                   AS f_score
        FROM cum CROSS JOIN tot
        WHERE cumt < f_n
    )
    SELECT v AS f_split_cents, f_score, f_n, f_pos
    FROM scored
    ORDER BY f_score DESC, v ASC
    LIMIT 1
"""
QUERIES["q_best_split_gini"] = q_best_split_gini


# ---------------------------------------------------------------------------
# Token-weighted median document length per language
# ---------------------------------------------------------------------------


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-WEIGHTED median document length (n_chars) per language,
    ORACLE-GATED — robust corpus sizing where each document counts by
    its token mass, not once (the weighted twin of q_median_mad's
    unweighted location): the smallest length whose cumulative token
    weight reaches half the language total (lower weighted median —
    2·cum ≥ total, a pure-integer rule both engines spell identically).

    Scale: the (lang, n_chars) pre-aggregate shrinks the corpus to the
    bounded length DOMAIN before any window; the cumulative window
    partitions by lang over that domain-sized frame (the
    q_vocab_coverage pre-shrink discipline); the median pick is one
    map-side-combinable min per lang."""
    from ..functions.text import ws_token_count

    d = _t(spark, sf_dir, "documents")
    w = d.select(
        "lang",
        "n_chars",
        ws_token_count(F.col("text")).cast("long").alias("_w"),
    ).groupBy("lang", "n_chars").agg(F.sum("_w").cast("long").alias("w"))
    win = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = w.groupBy("lang").agg(F.sum("w").cast("long").alias("_tot"))
    cum = w.withColumn("_cum", F.sum("w").over(win).cast("long")).join(
        F.broadcast(tot), "lang"
    )
    return (
        cum.filter(F.col("_cum") * 2 >= F.col("_tot"))
        .groupBy("lang")
        .agg(
            F.min("n_chars").cast("long").alias("f_median_chars"),
            F.min("_tot").cast("long").alias("f_total_tokens"),
        )
    )


ORACLE["q_weighted_median"] = None  # set below (needs _WS_COUNT)
QUERIES["q_weighted_median"] = q_weighted_median


# ---------------------------------------------------------------------------
# Churn label generation from the events stream
# ---------------------------------------------------------------------------


def q_label_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHURN LABEL GENERATION, ORACLE-GATED — the canonical supervised
    label a retention model trains on: per (user, active ISO week), 1
    when the user has NO event in the following week (both engines
    truncate weeks to ISO Monday). The corpus's last week is excluded
    (its 'next week' is unobserved — labeling it would leak the dataset
    boundary into the target). NULL timestamps are filtered on BOTH
    engines (events.ts carries nulls — the q_event_transitions
    precedent).

    Scale: distinct (user, week) shrinks the events scan to the
    activity grid; the label is an equi-self-join on (user, week+7d) —
    AQE-planned, no window; the max-week exclusion is a 1-row
    broadcast."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # the activity grid feeds the label join, its own next-week image,
    # AND the max-week scalar — checkpoint so events scans ONCE
    act = _ckpt(
        ev.select(
            "user_id", F.date_trunc("week", F.col("ts")).alias("f_week")
        ).distinct()
    )
    nxt = act.select(
        F.col("user_id").alias("_u"),
        F.col("f_week").alias("_w1"),
    )
    last = act.agg(F.max("f_week").alias("_last"))
    lab = (
        act.crossJoin(F.broadcast(last))
        .filter(F.col("f_week") < F.col("_last"))
        .join(
            nxt,
            (F.col("user_id") == F.col("_u"))
            & (
                F.col("f_week") + F.expr("INTERVAL 7 DAYS")
                == F.col("_w1")
            ),
            "left",
        )
    )
    return lab.select(
        "user_id",
        "f_week",
        F.when(F.col("_u").isNull(), 1).otherwise(0).cast("int").alias(
            "f_churned"
        ),
    )


ORACLE["q_label_churn"] = """
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS f_week
        FROM events WHERE ts IS NOT NULL
    ),
    last AS (SELECT MAX(f_week) AS _last FROM act)
    SELECT a.user_id, a.f_week,
           CAST(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END AS INT)
               AS f_churned
    FROM act a
    CROSS JOIN last
    LEFT JOIN act b
      ON a.user_id = b.user_id
     AND a.f_week + INTERVAL 7 DAY = b.f_week
    WHERE a.f_week < last._last
"""
QUERIES["q_label_churn"] = q_label_churn


# ---------------------------------------------------------------------------
# Source-mix entropy per language (integer octave bits)
# ---------------------------------------------------------------------------


def q_entropy_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOURCE-MIX ENTROPY per language in integer OCTAVE BITS,
    ORACLE-GATED — how concentrated each language's corpus is on its
    sources (the diversity dial a data-mixing pipeline monitors; 0 =
    single-source, higher = balanced mix). Each source's information
    content is ⌊log2⌊N_lang / c⌋⌋ bits (the q_doc_surprisal
    ``length(bin(N DIV c)) − 1`` spelling — IEEE log2 is never
    correctly-rounded cross-engine), the entropy is the count-weighted
    sum, reported per-document in milli-bits (integer DIV).

    Scale: one map-side-combinable (lang, source) aggregate; the lang
    marginal aggregates THAT bounded frame; everything downstream is
    category-domain-sized."""
    d = _t(spark, sf_dir, "documents")
    cell = d.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("_c")
    )
    lang = cell.groupBy("lang").agg(F.sum("_c").cast("long").alias("_N"))
    return (
        cell.join(F.broadcast(lang), "lang")
        .withColumn(
            "_bits",
            F.expr("CAST(length(bin(_N DIV _c)) - 1 AS BIGINT)"),
        )
        .groupBy("lang")
        .agg(
            F.min("_N").cast("long").alias("f_docs"),
            F.sum(F.col("_c") * F.col("_bits")).cast("long").alias("_num"),
        )
        .select(
            "lang",
            "f_docs",
            F.expr("CAST(_num * 1000 DIV f_docs AS BIGINT)").alias(
                "f_entropy_mbits"
            ),
        )
    )


ORACLE["q_entropy_mix"] = """
    WITH cell AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS _c
        FROM documents GROUP BY lang, source
    ),
    l AS (SELECT lang, CAST(SUM(_c) AS BIGINT) AS _N FROM cell GROUP BY lang)
    SELECT cell.lang,
           CAST(MIN(_N) AS BIGINT) AS f_docs,
           CAST(CAST(SUM(_c * (length(bin(_N // _c)) - 1)) AS BIGINT)
                * 1000 // MIN(_N) AS BIGINT) AS f_entropy_mbits
    FROM cell JOIN l ON cell.lang = l.lang
    GROUP BY cell.lang
"""
QUERIES["q_entropy_mix"] = q_entropy_mix


# ---------------------------------------------------------------------------
# Stratified k-fold assignment (label-balanced CV splits)
# ---------------------------------------------------------------------------

_SKF_K = 5


def q_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRATIFIED K-FOLD assignment over the embedding corpus,
    ORACLE-GATED — the label-balanced CV splitter beside q_group_kfold
    (leakage-free by group) and q_time_split (leakage-free by time):
    fold = portable-md5(vec_id) mod 5, reported as per-(label, fold)
    counts plus each fold's share of its label in ppm — the balance
    audit that catches a skewed splitter before a model trains on it.
    Hash-stable: a vector's fold never changes as the corpus grows.

    Scale: one map-side-combinable (label, fold) aggregate over a
    hash projection; the label marginal aggregates the bounded
    (label × 5) frame."""
    e = _t(spark, sf_dir, "embeddings")
    fold = F.expr(
        "CAST(conv(substr(md5(concat('skf_', CAST(vec_id AS STRING))),"
        " 1, 15), 16, 10) AS BIGINT) % 5"
    )
    cell = e.select(
        F.col("label").cast("long").alias("f_label"),
        fold.cast("long").alias("f_fold"),
    ).groupBy("f_label", "f_fold").agg(
        F.count("*").cast("long").alias("f_n")
    )
    tot = cell.groupBy("f_label").agg(F.sum("f_n").cast("long").alias("_t"))
    return cell.join(F.broadcast(tot), "f_label").select(
        "f_label",
        "f_fold",
        "f_n",
        F.expr("CAST(f_n * 1000000 DIV _t AS BIGINT)").alias("f_share_ppm"),
    )


ORACLE["q_stratified_kfold"] = """
    WITH cell AS (
        SELECT CAST(label AS BIGINT) AS f_label,
               CAST(('0x' || substr(md5('skf_' || CAST(vec_id AS VARCHAR)),
                                    1, 15))::BIGINT % 5 AS BIGINT) AS f_fold,
               CAST(COUNT(*) AS BIGINT) AS f_n
        FROM embeddings GROUP BY 1, 2
    ),
    tot AS (SELECT f_label, CAST(SUM(f_n) AS BIGINT) AS _t
            FROM cell GROUP BY f_label)
    SELECT cell.f_label, cell.f_fold, cell.f_n,
           CAST(cell.f_n * 1000000 // tot._t AS BIGINT) AS f_share_ppm
    FROM cell JOIN tot ON cell.f_label = tot.f_label
"""
QUERIES["q_stratified_kfold"] = q_stratified_kfold


# the weighted-median oracle needs the shared whitespace-token-count SQL
# spelling (single source of truth in ext_text)
from .ext_text import _WS_COUNT as _WS_COUNT_SQL  # noqa: E402

ORACLE["q_weighted_median"] = f"""
    WITH w AS (
        SELECT lang, n_chars,
               CAST(SUM(CAST({_WS_COUNT_SQL} AS BIGINT)) AS BIGINT) AS w
        FROM documents GROUP BY lang, n_chars
    ),
    cum AS (
        SELECT lang, n_chars, w,
               CAST(SUM(w) OVER (PARTITION BY lang ORDER BY n_chars
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cum
        FROM w
    ),
    tot AS (SELECT lang, CAST(SUM(w) AS BIGINT) AS _tot FROM w GROUP BY lang)
    SELECT cum.lang,
           CAST(MIN(n_chars) AS BIGINT) AS f_median_chars,
           CAST(MIN(_tot) AS BIGINT) AS f_total_tokens
    FROM cum JOIN tot ON cum.lang = tot.lang
    WHERE _cum * 2 >= _tot
    GROUP BY cum.lang
"""


# ---------------------------------------------------------------------------
# Lexical diversity (type/token accounting per document)
# ---------------------------------------------------------------------------


def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEXICAL DIVERSITY per document, ORACLE-GATED — the
    type-token-ratio family of quality signals (templated/boilerplate
    text scores LOW TTR, word salad HIGH): token count, distinct-type
    count, TTR in ppm, hapax (frequency-1) count and hapax share in ppm
    — all exact integers (integer DIV both engines).

    Scale: the per-(doc, token) pre-aggregate shrinks the exploded
    stream before the per-doc rollup; both aggs map-side combine; no
    window, no join, linear in corpus tokens."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    per = toks.groupBy("doc_id", "tok").agg(
        F.count("*").cast("long").alias("_c")
    )
    return per.groupBy("doc_id").agg(
        F.sum("_c").cast("long").alias("f_tokens"),
        F.count("*").cast("long").alias("f_types"),
        F.expr(
            "CAST(COUNT(*) * 1000000 DIV SUM(_c) AS BIGINT)"
        ).alias("f_ttr_ppm"),
        F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)).cast("long").alias(
            "f_hapax"
        ),
        F.expr(
            "CAST(SUM(CASE WHEN _c = 1 THEN 1 ELSE 0 END) * 1000000"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("f_hapax_ppm"),
    )


ORACLE["q_lexical_diversity"] = """
    WITH toks AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
            FROM documents
        ) WHERE length(tok) > 0
    ),
    per AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS _c
        FROM toks GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(SUM(_c) AS BIGINT) AS f_tokens,
           CAST(COUNT(*) AS BIGINT) AS f_types,
           CAST(COUNT(*) * 1000000 // SUM(_c) AS BIGINT) AS f_ttr_ppm,
           CAST(SUM(CASE WHEN _c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f_hapax,
           CAST(SUM(CASE WHEN _c = 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS f_hapax_ppm
    FROM per GROUP BY doc_id
"""
QUERIES["q_lexical_diversity"] = q_lexical_diversity


# ---------------------------------------------------------------------------
# Token burstiness (variance-to-mean dispersion across documents)
# ---------------------------------------------------------------------------

_BURST_MIN_DF = 20
_BURST_TOPK = 20


def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token BURSTINESS — the variance-to-mean dispersion index of a
    token's per-document counts (zeros included), ORACLE-GATED: bursty
    tokens (topical words that pile into few docs) score HIGH, function
    words ~1, which is how a pipeline separates content terms from glue
    without a stopword list. Exact rational spelling over N docs:
    VMR = (N·Σx² − (Σx)²) · 1e6 DIV (N·Σx) in DECIMAL(38,0)/HUGEINT —
    zeros enter through N, never materialized. Top-20 by VMR (df ≥ 20
    support floor; ties → token asc).

    Scale: per-(doc, token) pre-agg → per-token sufficient statistics
    (Σx, Σx², df) in ONE combinable agg; N is a 1-row broadcast; the
    ranking is TakeOrderedAndProject. Linear in corpus tokens."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    per = toks.groupBy("doc_id", "tok").agg(
        F.count("*").cast("long").alias("_c")
    )
    stats = per.groupBy("tok").agg(
        F.sum("_c").cast("long").alias("_sx"),
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("_sx2"),
        F.count("*").cast("long").alias("f_df"),
    ).filter(F.col("f_df") >= _BURST_MIN_DF)
    n = d.agg(F.count("*").cast("long").alias("_N"))
    return (
        stats.crossJoin(F.broadcast(n))
        .select(
            "tok",
            "f_df",
            F.col("_sx").alias("f_tf"),
            F.expr(
                "CAST((CAST(_N AS DECIMAL(38,0)) * _sx2"
                " - CAST(_sx AS DECIMAL(38,0)) * _sx) * 1000000"
                " DIV (CAST(_N AS DECIMAL(38,0)) * _sx) AS BIGINT)"
            ).alias("f_vmr_ppm"),
        )
        .orderBy(F.col("f_vmr_ppm").desc(), F.col("tok").asc())
        .limit(_BURST_TOPK)
    )


ORACLE["q_burstiness"] = f"""
    WITH toks AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
            FROM documents
        ) WHERE length(tok) > 0
    ),
    per AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS _c
        FROM toks GROUP BY doc_id, tok
    ),
    stats AS (
        SELECT tok,
               CAST(SUM(_c) AS BIGINT) AS _sx,
               CAST(SUM(_c * _c) AS BIGINT) AS _sx2,
               CAST(COUNT(*) AS BIGINT) AS f_df
        FROM per GROUP BY tok
        HAVING COUNT(*) >= {_BURST_MIN_DF}
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS _N FROM documents)
    SELECT tok, f_df, _sx AS f_tf,
           CAST((CAST(_N AS HUGEINT) * _sx2 - CAST(_sx AS HUGEINT) * _sx)
                * 1000000 // (CAST(_N AS HUGEINT) * _sx) AS BIGINT)
               AS f_vmr_ppm
    FROM stats CROSS JOIN n
    ORDER BY f_vmr_ppm DESC, tok ASC
    LIMIT {_BURST_TOPK}
"""
QUERIES["q_burstiness"] = q_burstiness


# ---------------------------------------------------------------------------
# Zipf tail diagnostic (frequency-octave type/mass spectrum)
# ---------------------------------------------------------------------------


def q_zipf_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF TAIL diagnostic, ORACLE-GATED — the frequency-OCTAVE
    spectrum of the corpus vocabulary: per octave ⌊log2 tf⌋ (the
    q_doc_surprisal ``length(bin(tf)) − 1`` spelling), how many types
    land there and how much token mass they carry (ppm). A healthy
    natural-language corpus halves its type count per octave; a
    template-heavy or synthetic corpus shows a bulge — the
    corpus-health dial beside q_vocab_coverage's head-mass cuts.

    Scale: one corpus token-frequency agg (map-side combinable) →
    octave rollup over the VOCAB-sized frame → ~30 output rows (int64
    tf caps the octave domain BY CONSTRUCTION); total mass is a 1-row
    broadcast."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.length("tok") > 0)
    freq = toks.groupBy("tok").agg(F.count("*").cast("long").alias("_tf"))
    octv = freq.select(
        F.expr("CAST(length(bin(_tf)) - 1 AS BIGINT)").alias("f_octave"),
        "_tf",
    ).groupBy("f_octave").agg(
        F.count("*").cast("long").alias("f_types"),
        F.sum("_tf").cast("long").alias("f_mass"),
    )
    tot = freq.agg(F.sum("_tf").cast("long").alias("_T"))
    return octv.crossJoin(F.broadcast(tot)).select(
        "f_octave",
        "f_types",
        "f_mass",
        F.expr("CAST(f_mass * 1000000 DIV _T AS BIGINT)").alias(
            "f_mass_ppm"
        ),
    )


ORACLE["q_zipf_tail"] = """
    WITH toks AS (
        SELECT tok FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
            FROM documents
        ) WHERE length(tok) > 0
    ),
    freq AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS _tf FROM toks GROUP BY tok
    ),
    octv AS (
        SELECT CAST(length(bin(_tf)) - 1 AS BIGINT) AS f_octave,
               CAST(COUNT(*) AS BIGINT) AS f_types,
               CAST(SUM(_tf) AS BIGINT) AS f_mass
        FROM freq GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(_tf) AS BIGINT) AS _T FROM freq)
    SELECT f_octave, f_types, f_mass,
           CAST(f_mass * 1000000 // _T AS BIGINT) AS f_mass_ppm
    FROM octv CROSS JOIN tot
"""
QUERIES["q_zipf_tail"] = q_zipf_tail


# ---------------------------------------------------------------------------
# Total-variation distance drift (doc-length octave distributions)
# ---------------------------------------------------------------------------


def q_tvd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOTAL-VARIATION distance between the doc-length (n_chars octave)
    distributions of English vs non-English documents, ORACLE-GATED —
    the binned drift metric beside q_ks_drift's exact-ECDF form (TVD is
    what a pipeline computes when the feature is already histogrammed):
    TVD = ½ Σ_bins |p − q| spelled exactly as
    Σ|c1·N2 − c2·N1| · 1e6 DIV (2·N1·N2) in DECIMAL(38,0)/HUGEINT.
    Output: one row — group sizes, number of occupied bins, TVD ppm.

    Scale: one combinable (octave, group) agg over a projection; the
    octave domain is int64-bounded BY CONSTRUCTION (~60 bins max);
    everything downstream is bin-count-sized."""
    return tvd_from_cells(doc_octave_cells(spark, sf_dir))


def doc_octave_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (octave, c1, c2) en/non-en doc-length cell frame SHARED by
    q_tvd_drift and q_psi_bits (relational8) — one builder so the two
    drift keys' binning cannot drift apart. Mirrored in SQL by
    :data:`DOC_OCTAVE_CELLS_SQL`."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.expr("CAST(length(bin(n_chars)) - 1 AS BIGINT)").alias("_o"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("_a"),
        F.when(F.col("lang") != "en", 1).otherwise(0).alias("_b"),
    ).groupBy("_o").agg(
        F.sum("_a").cast("long").alias("c1"),
        F.sum("_b").cast("long").alias("c2"),
    )


# the DuckDB twin of doc_octave_cells — interpolated into the
# q_tvd_drift (here) and q_psi_bits (relational8) oracles
DOC_OCTAVE_CELLS_SQL = """
        SELECT CAST(length(bin(n_chars)) - 1 AS BIGINT) AS _o,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS c1,
               CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS c2
        FROM documents GROUP BY 1
"""


def tvd_from_cells(cell: DataFrame) -> DataFrame:
    """Binned total-variation distance (ppm) from a PER-BIN count frame
    ``(_o, c1, c2)`` — like :func:`ks_from_points`, the bin frame is a
    keyed SUM aggregate (mergeable), so a streaming FV maintains it
    exactly and TVD monitors read the maintained table
    (tests/test_streaming.py TestStreamingDrift parity)."""
    cell = _ckpt(cell)
    tot = cell.agg(
        F.sum("c1").cast("long").alias("f_n1"),
        F.sum("c2").cast("long").alias("f_n2"),
        F.count("*").cast("long").alias("f_bins"),
    )
    gap = cell.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.expr(
                "ABS(CAST(c1 AS DECIMAL(18,0)) * f_n2"
                " - CAST(c2 AS DECIMAL(18,0)) * f_n1)"
            )
        ).alias("_D")
    )
    return gap.crossJoin(F.broadcast(tot)).select(
        "f_n1",
        "f_n2",
        "f_bins",
        # GREATEST(·,1): empty group → n1·n2 = 0; Spark DIV nulls
        # where DuckDB // hard-errors (ADVICE-r11 guard)
        F.expr(
            "CAST(_D * 1000000"
            " DIV GREATEST(CAST(f_n1 AS DECIMAL(18,0)) * f_n2 * 2, 1)"
            " AS BIGINT)"
        ).alias("f_tvd_ppm"),
    )


ORACLE["q_tvd_drift"] = f"""
    WITH cell AS ({DOC_OCTAVE_CELLS_SQL}),
    tot AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS f_n1,
               CAST(SUM(c2) AS BIGINT) AS f_n2,
               CAST(COUNT(*) AS BIGINT) AS f_bins
        FROM cell
    ),
    gap AS (
        SELECT SUM(ABS(CAST(c1 AS HUGEINT) * f_n2
                       - CAST(c2 AS HUGEINT) * f_n1)) AS _D
        FROM cell CROSS JOIN tot
    )
    SELECT f_n1, f_n2, f_bins,
           CAST(_D * 1000000
                // GREATEST(CAST(f_n1 AS HUGEINT) * f_n2 * 2, 1)
                AS BIGINT) AS f_tvd_ppm
    FROM gap CROSS JOIN tot
"""
QUERIES["q_tvd_drift"] = q_tvd_drift


# ---------------------------------------------------------------------------
# Per-user session features (the behavioral rollup retention models eat)
# ---------------------------------------------------------------------------


def q_user_session_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-USER session features, ORACLE-GATED — the user-grain rollup a
    retention/engagement model actually consumes (q_sessionize stops at
    the session grain): session count, total events, events-per-session
    in ppk, total and mean session duration in seconds — all exact
    integers (duration from unix_timestamp; means via integer DIV both
    engines; NULL ts filtered both engines, the q_event_transitions
    precedent).

    Scale: one shuffle on user_id; the gap/cumsum windows and both
    rollups reuse the same partitioning (the q_sessionize plan), and
    the user-grain agg map-side combines."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap = F.unix_timestamp(F.col("ts")) - F.lag(
        F.unix_timestamp(F.col("ts"))
    ).over(w)
    sess = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("_new"),
    ).withColumn(
        "_sess",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
    per_sess = sess.groupBy("user_id", "_sess").agg(
        F.count("*").cast("long").alias("_n"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).cast("long").alias("_dur"),
    )
    return per_sess.groupBy("user_id").agg(
        F.count("*").cast("long").alias("f_sessions"),
        F.sum("_n").cast("long").alias("f_events"),
        F.expr(
            "CAST(SUM(_n) * 1000 DIV COUNT(*) AS BIGINT)"
        ).alias("f_events_per_sess_ppk"),
        F.sum("_dur").cast("long").alias("f_total_dur_s"),
        F.expr(
            "CAST(SUM(_dur) DIV COUNT(*) AS BIGINT)"
        ).alias("f_avg_dur_s"),
    )


ORACLE["q_user_session_features"] = """
    WITH gaps AS (
        SELECT event_id, user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                            - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT)
                            > 1800
                    THEN 1 ELSE 0 END AS new_sess
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sess AS (
        SELECT *,
               CAST(SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS _sess
        FROM gaps
    ),
    per_sess AS (
        SELECT user_id, _sess,
               CAST(COUNT(*) AS BIGINT) AS _n,
               CAST(FLOOR(epoch(MAX(ts))) AS BIGINT)
                   - CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS _dur
        FROM sess GROUP BY user_id, _sess
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS f_sessions,
           CAST(SUM(_n) AS BIGINT) AS f_events,
           CAST(SUM(_n) * 1000 // COUNT(*) AS BIGINT)
               AS f_events_per_sess_ppk,
           CAST(SUM(_dur) AS BIGINT) AS f_total_dur_s,
           CAST(SUM(_dur) // COUNT(*) AS BIGINT) AS f_avg_dur_s
    FROM per_sess GROUP BY user_id
"""
QUERIES["q_user_session_features"] = q_user_session_features
