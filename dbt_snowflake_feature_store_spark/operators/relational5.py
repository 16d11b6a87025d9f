"""Relational query surface, part 5 — round-9 capability wave.

Same contract as ``relational.py``..``relational4.py``: DataFrame-first
Spark implementations with DuckDB oracle twins (identical aliases both
sides, decimal-exact double aggregation, deterministic output). This
wave adds the classic large-pipeline support operators still missing
from SURVEY.md §2's LLM-data-pipeline families:

- a RELATIONAL Bloom filter (build = bit_or agg to a words table,
  probe = broadcast join) — the semi-join prefilter a 100 TB
  contamination / membership pass runs before any exact join;
- Markov event-transition matrices and first/last-touch attribution —
  the sequence features a behavioral feature store serves;
- integer SURPRISAL scoring (bits-per-token under the corpus unigram
  model) — the exact-arithmetic cousin of perplexity filtering;
- vocabulary coverage cut points — the tokenizer-design query;
- KMV set-operation estimates (union / difference / containment)
  completing the q_kmv_jaccard family.

Reference frame: the reference's feature-view bodies are arbitrary
SELECTs over sources (/root/reference/macros/materializations/
feature_view.sql:126); these keys pin the plan shapes those bodies
imply at warehouse scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.literal import literal_df

_DEC = "decimal(28,6)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.tables import read_table

    return read_table(spark, sf_dir, name)


def _ckpt(df: DataFrame) -> DataFrame:
    """Register-then-checkpoint: lineage cut for a multiply-referenced
    frame, with the pre-cut plan registered so PLANS.md audits see its
    exchanges (the ranks._ranked / graph.py discipline)."""
    from ..plans import inspect as plan_inspect

    plan_inspect.register_subplan(df)
    return df.localCheckpoint(eager=False)


QUERIES: dict = {}
ORACLE: dict[str, str] = {}


# ---------------------------------------------------------------------------
# Relational Bloom filter — build (bit_or agg) + probe (broadcast join)
# ---------------------------------------------------------------------------

_BLOOM_BITS = 16384
_BLOOM_WORD = 32  # bits per word: max shift 31 — DuckDB << overflows at 63
_BLOOM_D = 3


def q_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership in PURE RELATIONAL form, ORACLE-GATED:
    build a 16384-bit / 3-hash Bloom filter over the distinct word-8-
    grams of the benchmark slice (``doc_id % 10 == 0`` — the
    q_contamination holdout convention), probe every distinct 8-gram of
    the REST of the corpus against it, and report the confusion
    counts — including ``f_missed``, which the Bloom guarantee pins to
    0 (no false negatives, hash-checked, not just asserted). True
    members exist (the corpus carries cross-slice near-dups) and so do
    false positives (the filter is sized for a measurable FPR), so
    every output cell is informative.

    The filter is a (word, bits) table: bit position = salted-md5 hash
    mod 16384, split into 512 × 32-bit words (32-bit words because a
    ``1 << 63`` overflows DuckDB's BIGINT shift — NOTES invariant),
    built with a map-side-combinable ``bit_or`` aggregation. The probe
    joins the 512-row sketch BROADCAST and checks all 3 bits.

    Scale: this is the semi-join prefilter a decontamination pass runs
    BEFORE q_contamination's exact gram join — at 100 TB the benchmark
    scan reduces to a KB-scale bitmask that ships to every executor,
    and the exact join runs only on Bloom positives (the FPR is the
    wasted-work rate, reported as data). Build and probe are each one
    pass, no data-scale shuffle beyond the distinct."""
    d = _t(spark, sf_dir, "documents")
    toks8 = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    # the <8-token gate rides INSIDE the gram expression (empty array ->
    # explode emits nothing — identical rows to a filter): a standalone
    # filter(size(t) >= 8) is predicate-pushed below the Project and
    # re-evaluates the split per row (r18 §4.4-class fix)
    grams = toks8.select(
        "doc_id",
        F.explode(
            F.expr(
                "IF(size(t) >= 8,"
                " array_distinct(transform(sequence(0, size(t) - 8),"
                " i -> array_join(slice(t, i + 1, 8), ' '))),"
                " array())"
            )
        ).alias("tok"),
    )
    member = grams.filter(F.col("doc_id") % 10 == 0).select("tok").distinct()
    cand = grams.filter(F.col("doc_id") % 10 != 0).select("tok").distinct()
    salts = literal_df(spark, [(i,) for i in range(_BLOOM_D)], "s INT")

    bitpos = F.expr(
        "CAST(conv(substring(md5(concat('bloom', CAST(s AS STRING), ':',"
        f" tok)), 1, 8), 16, 10) AS BIGINT) % {_BLOOM_BITS}"
    )

    def hashed(df: DataFrame) -> DataFrame:
        # _bit is spelled NON-NULLABLE (r18): a nullable _bit makes the
        # probe join infer isnotnull on the derived word column, and
        # the pushed constraint re-evaluates the md5 chain per
        # (tok, salt) row. tok is never NULL by construction (grams are
        # concats of split output), so the 0 arm is dead.
        return (
            df.crossJoin(F.broadcast(salts))
            .withColumn("_bit", F.coalesce(bitpos, F.lit(0)))
            .select(
                "tok",
                "s",
                # word/mask coalesced non-nullable too: Divide and %
                # are always nullable in Catalyst, so an inferred
                # isnotnull(word) would re-run the md5 chain per row
                F.coalesce(
                    (F.col("_bit") / _BLOOM_WORD).cast("long"), F.lit(0)
                ).alias("word"),
                F.coalesce(
                    F.expr(
                        "shiftleft(CAST(1 AS BIGINT),"
                        f" CAST(_bit % {_BLOOM_WORD} AS INT))"
                    ),
                    F.lit(0),
                ).alias("mask"),
            )
        )

    bloom = hashed(member).groupBy("word").agg(
        F.expr("bit_or(mask)").alias("bw")
    )
    probe = (
        hashed(cand)
        .join(F.broadcast(bloom), "word", "left")
        .groupBy("tok")
        .agg(
            F.min(
                (
                    F.coalesce(F.col("bw"), F.lit(0)).bitwiseAND(F.col("mask"))
                    == F.col("mask")
                ).cast("int")
            ).alias("_pos")
        )
    )
    truth = member.select(F.col("tok"), F.lit(1).alias("_mem"))
    joined = probe.join(truth, "tok", "left").select(
        "tok", "_pos", F.coalesce(F.col("_mem"), F.lit(0)).alias("_mem")
    )
    return joined.agg(
        F.count("*").cast("long").alias("f_candidates"),
        F.sum("_mem").cast("long").alias("f_true_members"),
        F.sum("_pos").cast("long").alias("f_bloom_positives"),
        F.sum(
            F.when((F.col("_pos") == 1) & (F.col("_mem") == 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("f_false_positives"),
        F.sum(
            F.when((F.col("_pos") == 0) & (F.col("_mem") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("f_missed"),
    )


ORACLE["q_bloom_filter"] = f"""
    WITH tokd AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, len(t) - 6),
                   i -> array_to_string(list_slice(t, i, i + 7), ' ')
               ))) AS tok
        FROM tokd WHERE len(t) >= 8
    ),
    member AS (SELECT DISTINCT tok FROM g WHERE doc_id % 10 = 0),
    cand AS (SELECT DISTINCT tok FROM g WHERE doc_id % 10 <> 0),
    salts(s) AS (VALUES (0), (1), (2)),
    mh AS (
        SELECT tok, s,
               ('0x' || substr(md5('bloom' || CAST(s AS VARCHAR) || ':' || tok),
                               1, 8))::BIGINT % {_BLOOM_BITS} AS bit
        FROM member, salts
    ),
    bloom AS (
        SELECT bit // {_BLOOM_WORD} AS word,
               bit_or(1::BIGINT << CAST(bit % {_BLOOM_WORD} AS INT)) AS bw
        FROM mh GROUP BY bit // {_BLOOM_WORD}
    ),
    ch AS (
        SELECT tok, s,
               ('0x' || substr(md5('bloom' || CAST(s AS VARCHAR) || ':' || tok),
                               1, 8))::BIGINT % {_BLOOM_BITS} AS bit
        FROM cand, salts
    ),
    probe AS (
        SELECT ch.tok,
               MIN(CASE WHEN (COALESCE(b.bw, 0)
                              & (1::BIGINT << CAST(ch.bit % {_BLOOM_WORD} AS INT)))
                             = (1::BIGINT << CAST(ch.bit % {_BLOOM_WORD} AS INT))
                        THEN 1 ELSE 0 END) AS _pos
        FROM ch LEFT JOIN bloom b ON ch.bit // {_BLOOM_WORD} = b.word
        GROUP BY ch.tok
    ),
    joined AS (
        SELECT p.tok, p._pos,
               CASE WHEN m.tok IS NULL THEN 0 ELSE 1 END AS _mem
        FROM probe p LEFT JOIN member m ON p.tok = m.tok
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS f_candidates,
           CAST(SUM(_mem) AS BIGINT) AS f_true_members,
           CAST(SUM(_pos) AS BIGINT) AS f_bloom_positives,
           CAST(SUM(CASE WHEN _pos = 1 AND _mem = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS f_false_positives,
           CAST(SUM(CASE WHEN _pos = 0 AND _mem = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS f_missed
    FROM joined
"""
QUERIES["q_bloom_filter"] = q_bloom_filter


# ---------------------------------------------------------------------------
# Markov event-transition matrix
# ---------------------------------------------------------------------------


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts + probabilities over each
    user's time-ordered event stream — the behavioral sequence feature
    (next-action prediction priors, funnel leak detection). Total order
    inside a user: (ts, event_id) — event_id is unique, so the lead is
    deterministic and the key hash-gates.

    Scale: ONE window partitioned by user_id (per-user history is
    bounded; never an unpartitioned window) + a map-side-combinable agg
    to the (src, dst) key (≤ |event_type|² groups). The probability is
    a final double division of exact BIGINT counts.

    NULL-ts rows are filtered on BOTH sides before the window: Spark
    orders ASC NULLS FIRST, DuckDB NULLS LAST — without the filter a
    future ts-layout drift introducing NULLs would silently diverge
    the lead() pairing between engines."""
    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .filter(F.col("ts").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    pairs = (
        ev.withColumn("_nxt", F.lead("event_type").over(w))
        .filter(F.col("_nxt").isNotNull())
        .groupBy(
            F.col("event_type").alias("f_src"), F.col("_nxt").alias("f_dst")
        )
        .agg(F.count("*").cast("long").alias("f_cnt"))
    )
    tot = pairs.groupBy("f_src").agg(F.sum("f_cnt").cast("long").alias("_tot"))
    return pairs.join(tot, "f_src").select(
        "f_src",
        "f_dst",
        "f_cnt",
        (F.col("f_cnt").cast("double") / F.col("_tot").cast("double")).alias(
            "f_prob"
        ),
    )


ORACLE["q_event_transitions"] = """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS _nxt
        FROM events WHERE ts IS NOT NULL
    ),
    pairs AS (
        SELECT event_type AS f_src, _nxt AS f_dst,
               CAST(COUNT(*) AS BIGINT) AS f_cnt
        FROM seq WHERE _nxt IS NOT NULL
        GROUP BY event_type, _nxt
    ),
    tot AS (
        SELECT f_src, CAST(SUM(f_cnt) AS BIGINT) AS _tot
        FROM pairs GROUP BY f_src
    )
    SELECT p.f_src, p.f_dst, p.f_cnt,
           CAST(p.f_cnt AS DOUBLE) / CAST(t._tot AS DOUBLE) AS f_prob
    FROM pairs p JOIN tot t ON p.f_src = t.f_src
"""
QUERIES["q_event_transitions"] = q_event_transitions


# ---------------------------------------------------------------------------
# First/last-touch attribution
# ---------------------------------------------------------------------------


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style conversion attribution: every purchase is
    attributed to the user's FIRST and LAST non-purchase touch inside
    the preceding 7 days; output is the (first_touch, last_touch) →
    (conversions, value) matrix. Purchases with no touch in the window
    attribute to '(none)'. Deterministic: the touch order inside a
    purchase is the total order (ts, event_id).

    Scale: the touch join shuffles BOTH sides on user_id once and the
    range predicate evaluates inside the join — per-user histories are
    bounded, so the pair set is bounded per user; the two row_number
    windows partition by purchase event_id (per-purchase candidate
    sets — 7 days of one user's events, never data-sized). The value
    sum runs through DECIMAL(28,6) (exactness invariant)."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("_pid"),
        F.col("user_id").alias("_pu"),
        F.col("ts").alias("_pts"),
        F.col("value").alias("_pval"),
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("_tu"),
        F.col("ts").alias("_tts"),
        F.col("event_id").alias("_tid"),
        F.col("event_type").alias("_ttype"),
    )
    cand = p.join(
        t,
        (F.col("_pu") == F.col("_tu"))
        & (F.col("_tts") < F.col("_pts"))
        & (F.col("_tts") >= F.expr("_pts - INTERVAL 7 DAYS")),
    )
    wf = Window.partitionBy("_pid").orderBy(
        F.col("_tts").asc(), F.col("_tid").asc()
    )
    wl = Window.partitionBy("_pid").orderBy(
        F.col("_tts").desc(), F.col("_tid").desc()
    )
    fl = (
        cand.withColumn("_rf", F.row_number().over(wf))
        .withColumn("_rl", F.row_number().over(wl))
        .filter((F.col("_rf") == 1) | (F.col("_rl") == 1))
        .groupBy("_pid")
        .agg(
            F.max(F.when(F.col("_rf") == 1, F.col("_ttype"))).alias("_first"),
            F.max(F.when(F.col("_rl") == 1, F.col("_ttype"))).alias("_last"),
        )
    )
    attributed = p.join(fl, "_pid", "left").select(
        F.coalesce(F.col("_first"), F.lit("(none)")).alias("f_first_touch"),
        F.coalesce(F.col("_last"), F.lit("(none)")).alias("f_last_touch"),
        F.col("_pval"),
    )
    return attributed.groupBy("f_first_touch", "f_last_touch").agg(
        F.count("*").cast("long").alias("f_conversions"),
        F.sum(F.col("_pval").cast(_DEC)).cast("double").alias("f_value"),
    )


ORACLE["q_attribution"] = """
    WITH p AS (
        SELECT event_id AS _pid, user_id AS _pu, ts AS _pts, value AS _pval
        FROM events WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT user_id AS _tu, ts AS _tts, event_id AS _tid,
               event_type AS _ttype
        FROM events WHERE event_type <> 'purchase'
    ),
    cand AS (
        SELECT p._pid, t._tts, t._tid, t._ttype,
               ROW_NUMBER() OVER (PARTITION BY p._pid
                                  ORDER BY t._tts ASC, t._tid ASC) AS _rf,
               ROW_NUMBER() OVER (PARTITION BY p._pid
                                  ORDER BY t._tts DESC, t._tid DESC) AS _rl
        FROM p JOIN t
          ON p._pu = t._tu
         AND t._tts < p._pts
         AND t._tts >= p._pts - INTERVAL 7 DAY
    ),
    fl AS (
        SELECT _pid,
               MAX(CASE WHEN _rf = 1 THEN _ttype END) AS _first,
               MAX(CASE WHEN _rl = 1 THEN _ttype END) AS _last
        FROM cand WHERE _rf = 1 OR _rl = 1
        GROUP BY _pid
    )
    SELECT COALESCE(fl._first, '(none)') AS f_first_touch,
           COALESCE(fl._last, '(none)') AS f_last_touch,
           CAST(COUNT(*) AS BIGINT) AS f_conversions,
           CAST(SUM(CAST(p._pval AS DECIMAL(28,6))) AS DOUBLE) AS f_value
    FROM p LEFT JOIN fl ON p._pid = fl._pid
    GROUP BY COALESCE(fl._first, '(none)'), COALESCE(fl._last, '(none)')
"""
QUERIES["q_attribution"] = q_attribution


# ---------------------------------------------------------------------------
# Integer surprisal scoring (bits-per-token quality signal)
# ---------------------------------------------------------------------------


def q_doc_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram SURPRISAL quality score, ORACLE-GATED: each token's
    information content is approximated by ⌊log2⌊N/c⌋⌋ bits (N = corpus
    token count, c = the token's corpus frequency) — the pure-integer
    spelling ``length(bin(N DIV c)) − 1`` both engines share (the HDR
    octave trick; IEEE log2 is never correctly-rounded cross-engine,
    so real log-prob perplexity can only be rows-only). Per document:
    total bits, token count, bits-per-token — rare-vocab/gibberish
    documents score HIGH, templated/boilerplate docs LOW; the CCNet-
    style quality-filter signal with a hash-checkable estimator.

    Scale: the frequency dictionary is |vocab|-sized and BROADCASTS
    into the token stream (the skewed token key never shuffles —
    q_token_rarity's discipline); N is a 1-row broadcast; the per-doc
    agg is map-side combinable."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    freq = toks.groupBy("tok").agg(F.count("*").cast("long").alias("tf"))
    n = freq.agg(F.sum("tf").cast("long").alias("_N"))
    scored = (
        toks.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "_bits", F.expr("CAST(length(bin(_N DIV tf)) - 1 AS BIGINT)")
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("f_n_toks"),
        F.sum("_bits").cast("long").alias("f_bits"),
        (F.sum("_bits").cast("double") / F.count("*").cast("double")).alias(
            "f_bits_per_tok"
        ),
    )


ORACLE["q_doc_surprisal"] = """
    WITH toks AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
            FROM documents
        ) WHERE length(tok) > 0
    ),
    freq AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY tok
    ),
    n AS (SELECT CAST(SUM(tf) AS BIGINT) AS _N FROM freq)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS f_n_toks,
           CAST(SUM(length(bin(n._N // f.tf)) - 1) AS BIGINT) AS f_bits,
           CAST(SUM(length(bin(n._N // f.tf)) - 1) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS f_bits_per_tok
    FROM toks t JOIN freq f ON t.tok = f.tok CROSS JOIN n
    GROUP BY t.doc_id
"""
QUERIES["q_doc_surprisal"] = q_doc_surprisal


# ---------------------------------------------------------------------------
# Vocabulary coverage cut points
# ---------------------------------------------------------------------------


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-design query, ORACLE-GATED: the smallest frequency-
    ranked vocabulary covering 50% / 90% / 99% of corpus token mass
    (rank order: count desc, token asc — total, so the cumulative sums
    hash-gate). The coverage test is INTEGER (cum·100 ≥ pct·N): no
    float threshold ever feeds the row selection (CLAUDE.md
    invariant).

    Scale note: a whitespace-token vocabulary over a web-scale corpus
    is 10⁸–10⁹ rows — NOT a bounded universe — so the rank + running
    sum go through ``ranks.global_running_sum`` (range exchange →
    parallel per-range local sorts → prefix-sum offsets from one
    bounded P-row collect; the only window is PARTITIONED by the range
    id). No unpartitioned window node anywhere (plan-asserted in
    tests/test_scale_plans.py); the corpus-scale work is one
    map-side-combinable token count."""
    from ..functions.ranks import global_running_sum

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.length("tok") > 0)
    freq = toks.groupBy("tok").agg(F.count("*").cast("long").alias("cnt"))
    ranked = global_running_sum(
        freq,
        [F.col("cnt").desc(), F.col("tok").asc()],
        value_col="cnt",
        rank_col="_rank",
        sum_col="_cum",
    ).select("tok", "cnt", "_rank", "_cum")
    tot = freq.agg(F.sum("cnt").cast("long").alias("_N"))
    pcts = literal_df(spark, [(50,), (90,), (99,)], "f_pct LONG")
    cut = (
        ranked.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(pcts))
        .filter(F.col("_cum") * 100 >= F.col("f_pct") * F.col("_N"))
        .groupBy("f_pct")
        .agg(F.min("_rank").alias("f_vocab_size"))
    )
    return cut.join(
        ranked.select(F.col("_rank").alias("f_vocab_size"), "_cum"),
        "f_vocab_size",
    ).select(
        "f_pct", "f_vocab_size", F.col("_cum").alias("f_tokens_covered")
    )


ORACLE["q_vocab_coverage"] = """
    WITH toks AS (
        SELECT tok FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
            FROM documents
        ) WHERE length(tok) > 0
    ),
    freq AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok
    ),
    ranked AS (
        SELECT tok, cnt,
               CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC)
                    AS BIGINT) AS _rank,
               CAST(SUM(cnt) OVER (ORDER BY cnt DESC, tok ASC
                                   ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS _cum
        FROM freq
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS _N FROM freq),
    pcts(f_pct) AS (VALUES (CAST(50 AS BIGINT)), (90), (99)),
    cut AS (
        SELECT p.f_pct, MIN(r._rank) AS f_vocab_size
        FROM ranked r CROSS JOIN tot CROSS JOIN pcts p
        WHERE r._cum * 100 >= p.f_pct * tot._N
        GROUP BY p.f_pct
    )
    SELECT c.f_pct, c.f_vocab_size, r._cum AS f_tokens_covered
    FROM cut c JOIN ranked r ON c.f_vocab_size = r._rank
"""
QUERIES["q_vocab_coverage"] = q_vocab_coverage


# ---------------------------------------------------------------------------
# KMV set-operation estimates (union / difference / containment)
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_SPACE = 1 << 32


def q_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV SET ALGEBRA, oracle-gated — completes q_kmv_jaccard: per
    event-type pair, estimated |A∪B| (the KMV estimator over the
    merged k-min set), |A∩B| (union estimate × the in-both fraction of
    the union sample), |A\\\\B| (inclusion–exclusion against the
    per-type estimate), and the CONTAINMENT |A∩B|/|A| in ppm — the
    asymmetric 'is shard A inside shard B' signal exact Jaccard can't
    give. Every estimator step is BIGINT multiply + DIV (the
    q_kmv_jaccard discipline), so DuckDB replays it bit-for-bit.

    Scale: sketches are ≤ k rows per type; the pair stage is group-
    count-sized. The only data-scale pass builds the per-type sketches
    (one distinct + bounded two-stage windows)."""
    from ..functions import sketches as SK

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    sk = SK.kmv_sketch_by_key(ev, ["event_type"], "user_id", k=_KMV_K)
    est = SK.kmv_estimate(sk, ["event_type"], k=_KMV_K, out_col="_est")

    types = sk.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(types.alias("b"), F.col("a.event_type") < F.col("b.event_type"))
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
    agg = kk.groupBy("f_a", "f_b").agg(
        F.count("*").cast("long").alias("_denom"),
        F.max("h").cast("long").alias("_hk"),
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long"))
        .cast("long")
        .alias("_both"),
    )
    union_est = F.when(F.col("_denom") < _KMV_K, F.col("_denom")).otherwise(
        F.expr(
            f"CAST(({_KMV_K} - 1) * {_KMV_SPACE} DIV greatest(_hk, 1)"
            " AS BIGINT)"
        )
    )
    ea = est.select(F.col("event_type").alias("f_a"), F.col("_est").alias("_ea"))
    eb = est.select(F.col("event_type").alias("f_b"), F.col("_est").alias("_eb"))
    scored = (
        agg.withColumn("f_union_est", union_est.cast("long"))
        .withColumn(
            "f_inter_est",
            F.expr("CAST(f_union_est * _both DIV _denom AS BIGINT)"),
        )
        .join(F.broadcast(ea), "f_a")
        .join(F.broadcast(eb), "f_b")
    )
    return scored.select(
        "f_a",
        "f_b",
        "f_union_est",
        "f_inter_est",
        F.expr(
            "CAST(greatest(f_union_est - _eb, CAST(0 AS BIGINT)) AS BIGINT)"
        ).alias("f_diff_ab_est"),
        F.expr(
            "CAST(f_inter_est * 1000000 DIV greatest(_ea, 1) AS BIGINT)"
        ).alias("f_containment_a_ppm"),
    )


ORACLE["q_kmv_setops"] = f"""
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
    est AS (
        SELECT event_type,
               CAST(CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*)
                    ELSE ({_KMV_K} - 1) * {_KMV_SPACE} // GREATEST(MAX(h), 1)
                    END AS BIGINT) AS _est
        FROM sk GROUP BY event_type
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
        SELECT f_a, f_b, h, in_a, in_b,
               ROW_NUMBER() OVER (PARTITION BY f_a, f_b ORDER BY h) AS rn
        FROM u
    ),
    agg AS (
        SELECT f_a, f_b,
               CAST(COUNT(*) AS BIGINT) AS _denom,
               CAST(MAX(h) AS BIGINT) AS _hk,
               CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS _both
        FROM kk WHERE rn <= {_KMV_K}
        GROUP BY f_a, f_b
    ),
    scored AS (
        SELECT f_a, f_b, _denom, _both,
               CAST(CASE WHEN _denom < {_KMV_K} THEN _denom
                    ELSE ({_KMV_K} - 1) * {_KMV_SPACE} // GREATEST(_hk, 1)
                    END AS BIGINT) AS f_union_est
        FROM agg
    )
    SELECT s.f_a, s.f_b, s.f_union_est,
           CAST(s.f_union_est * s._both // s._denom AS BIGINT) AS f_inter_est,
           CAST(GREATEST(s.f_union_est - eb._est, 0) AS BIGINT)
               AS f_diff_ab_est,
           CAST((s.f_union_est * s._both // s._denom) * 1000000
                // GREATEST(ea._est, 1) AS BIGINT) AS f_containment_a_ppm
    FROM scored s
    JOIN est ea ON ea.event_type = s.f_a
    JOIN est eb ON eb.event_type = s.f_b
"""
QUERIES["q_kmv_setops"] = q_kmv_setops


# ---------------------------------------------------------------------------
# TF-IDF top terms (integer-exact keyword extraction)
# ---------------------------------------------------------------------------

_TFIDF_TOPK = 5


def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TOP-5 keywords by tf·⌊log2⌊N/df⌋⌋, ORACLE-GATED —
    keyword extraction / topic tagging over the corpus. IDF uses the
    pure-integer bit-length spelling ``length(bin(N DIV df)) − 1``
    (the q_doc_surprisal / HDR octave trick: IEEE log is never
    correctly-rounded cross-engine, integer bits are), so the score is
    an exact BIGINT and the key hash-gates.

    Scale: tf is one map-side-combinable (doc, tok) count; df is one
    (tok) count OVER the tf table (each (doc, tok) row is distinct, so
    COUNT(*) per tok IS the document frequency — no countDistinct
    shuffle of raw tokens); the score join shuffles on tok with NO
    forced broadcast (a web-scale vocabulary is unbounded — the
    q_vocab_coverage lesson — so AQE decides, and skewed stop-words
    are exactly the keys IDF zeroes out); the top-5 window partitions
    by doc_id (per-doc group, bounded)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count("*").cast("long").alias("f_tf")
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").cast("long").alias("f_df"))
    ndocs = tf.groupBy().agg(
        F.countDistinct("doc_id").cast("long").alias("_N")
    )
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "f_score",
            (
                F.col("f_tf")
                * F.expr("CAST(length(bin(_N DIV f_df)) - 1 AS BIGINT)")
            ).cast("long"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("f_score").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("f_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("f_rank") <= _TFIDF_TOPK)
        .select("doc_id", "f_rank", "tok", "f_tf", "f_df", "f_score")
    )


ORACLE["q_tfidf_topterms"] = f"""
    WITH toks AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
            FROM documents
        ) WHERE length(tok) > 0
    ),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS f_tf
        FROM toks GROUP BY doc_id, tok
    ),
    dfreq AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS f_df FROM tf GROUP BY tok
    ),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS _N FROM tf),
    scored AS (
        SELECT tf.doc_id, tf.tok, tf.f_tf, dfreq.f_df,
               CAST(tf.f_tf * (length(bin(n._N // dfreq.f_df)) - 1)
                    AS BIGINT) AS f_score
        FROM tf JOIN dfreq ON tf.tok = dfreq.tok CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, tok, f_tf, f_df, f_score,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY f_score DESC, tok ASC
               ) AS BIGINT) AS f_rank
        FROM scored
    )
    SELECT doc_id, f_rank, tok, f_tf, f_df, f_score
    FROM ranked WHERE f_rank <= {_TFIDF_TOPK}
"""
QUERIES["q_tfidf_topterms"] = q_tfidf_topterms


# ---------------------------------------------------------------------------
# Exact Gini coefficient of spend (distributed global rank, no window)
# ---------------------------------------------------------------------------


def q_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Gini concentration of order spend, ORACLE-GATED: G =
    Σ(2·rank − n − 1)·xᵢ / (n·Σx) over cents-integer order totals
    ranked ascending — the inequality/concentration feature (revenue
    concentration, data-source dominance) whose textbook form needs a
    GLOBAL sort. The rank comes from ranks.global_row_number (range
    exchange + prefix-sum offsets — NO unpartitioned window, the
    q_vocab_coverage discipline); the weighted sum is DECIMAL(38,0)-
    exact on both engines (each term ≤ 10¹⁴·|…| — far past 2⁵³, so
    BIGINT-in-double would silently round); ties in cents contribute a
    permutation-invariant rank-sum, so the o_orderkey tiebreak affects
    no digit of the result. Cents via floor(x·100 + 0.5) both sides
    (CLAUDE.md half-up spelling)."""
    from ..functions.ranks import global_row_number

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
        ).alias("_cents"),
    )
    ranked = global_row_number(
        o, [F.col("_cents").asc(), F.col("o_orderkey").asc()], "_r"
    )
    stats = o.groupBy().agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("_cents").cast("long").alias("_total"),
    )
    num = (
        ranked.crossJoin(F.broadcast(stats))
        .select(
            (
                (F.lit(2) * F.col("_r") - F.col("_n") - F.lit(1)).cast(
                    "decimal(19,0)"
                )
                * F.col("_cents").cast("decimal(19,0)")
            ).alias("_w")
        )
        .agg(F.sum("_w").alias("_num"))
    )
    return num.crossJoin(F.broadcast(stats)).select(
        F.col("_n").alias("f_n"),
        F.col("_total").alias("f_total_cents"),
        # the division by the 1e6 literal happens COLUMN-side (Python
        # float → DOUBLE literal): inside an F.expr string "1000000.0"
        # parses as DECIMAL and would silently retype f_gini
        (
            F.expr(
                "floor(CAST(_num AS DOUBLE)"
                " / (CAST(_n AS DOUBLE) * CAST(_total AS DOUBLE))"
                " * 1000000 + 0.5)"
            )
            / 1000000.0
        ).alias("f_gini"),
    )


ORACLE["q_gini_spend"] = """
    WITH o AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS _cents
        FROM orders
    ),
    ranked AS (
        SELECT _cents,
               CAST(ROW_NUMBER() OVER (ORDER BY _cents ASC, o_orderkey ASC)
                    AS BIGINT) AS _r
        FROM o
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS _n,
               CAST(SUM(_cents) AS BIGINT) AS _total
        FROM o
    ),
    num AS (
        SELECT SUM(CAST(2 * r._r - s._n - 1 AS DECIMAL(19,0))
                   * CAST(r._cents AS DECIMAL(19,0))) AS _num
        FROM ranked r CROSS JOIN stats s
    )
    SELECT s._n AS f_n, s._total AS f_total_cents,
           floor(CAST(n._num AS DOUBLE)
                 / (CAST(s._n AS DOUBLE) * CAST(s._total AS DOUBLE))
                 * 1000000 + 0.5) / 1000000.0 AS f_gini
    FROM num n CROSS JOIN stats s
"""
QUERIES["q_gini_spend"] = q_gini_spend


# ---------------------------------------------------------------------------
# Normalization-robust exact dedup
# ---------------------------------------------------------------------------


def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the NORMALIZED 100-char PREFIX, ORACLE-GATED:
    lowercase → strip non-alphanumerics → collapse whitespace runs →
    trim → first 100 chars, then md5-group — catches the re-cased /
    re-punctuated / re-wrapped AND truncated/extended variants that
    raw-byte exact dedup misses (the C4/CCNet normalize-then-hash
    recipe; the prefix grain is what makes it non-vacuous on corpora
    whose duplicates share heads but diverge in tails). Output: one
    row per duplicate CLUSTER (hash, kept min doc_id, size ≥ 2).

    Cross-engine regex discipline: explicit ASCII classes only —
    Java's \\s includes \\x0B where RE2's does not, so the pattern
    spells [ \\t\\r\\n] literally; DuckDB regexp_replace needs the 'g'
    flag to match Spark's replace-all. Scale: one map-side-combinable
    hash-group; normalization is per-row codegen, no shuffle added."""
    d = _t(spark, sf_dir, "documents")
    norm = F.substring(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.lower(F.col("text")), "[^a-z0-9 \t\r\n]", ""
                ),
                "[ \t\r\n]+",
                " ",
            )
        ),
        1,
        100,
    )
    # r18: normalize ONCE into a materialized column and gate via an
    # explode of a guarded 1-element array (the q_dedup_edit shape) —
    # the standalone filter(length(norm) > 0) was predicate-pushed
    # below the Project and re-evaluated the two-regexp chain per row.
    # Identical surviving rows: length > 0 emits exactly one hash,
    # else none; NULL text yields a NULL guard -> none.
    nrm = d.select("doc_id", norm.alias("_fs_nrm"))
    docs = nrm.select(
        "doc_id",
        F.explode(
            F.expr(
                "IF(length(_fs_nrm) > 0, array(md5(_fs_nrm)), array())"
            )
        ).alias("f_norm_hash"),
    )
    return (
        docs.groupBy("f_norm_hash")
        .agg(
            F.min("doc_id").cast("long").alias("f_keep_id"),
            F.count("*").cast("long").alias("f_n_dups"),
        )
        .filter(F.col("f_n_dups") >= 2)
    )


ORACLE["q_dedup_normalized"] = """
    WITH docs AS (
        SELECT doc_id,
               substr(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 \t\r\n]', '', 'g'),
                   '[ \t\r\n]+', ' ', 'g')), 1, 100) AS _norm
        FROM documents
    )
    SELECT md5(_norm) AS f_norm_hash,
           CAST(MIN(doc_id) AS BIGINT) AS f_keep_id,
           CAST(COUNT(*) AS BIGINT) AS f_n_dups
    FROM docs WHERE length(_norm) > 0
    GROUP BY md5(_norm)
    HAVING COUNT(*) >= 2
"""
QUERIES["q_dedup_normalized"] = q_dedup_normalized


# ---------------------------------------------------------------------------
# BM25 ranked keyword search (exact-rational scoring, integer division)
# ---------------------------------------------------------------------------

_BM25_TERMS = ("window", "merge", "stream")
_BM25_TOPK = 15
_BM25_SCALE = 10000   # fixed-point score scale (4 decimal digits)
_BM25_TFCAP = 30      # tf saturation cap keeps every product < 2^63


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked keyword search over ``documents``, ORACLE-GATED —
    the ranked-retrieval upgrade of q_text_search's occurrence-count
    relevance. Standard BM25 shape (k1 = 6/5, b = 3/4) with one
    documented deviation: the IDF factor is the exact rational
    (2(N−df)+1)/(2df+1) — i.e. the classic (N−df+0.5)/(df+0.5) WITHOUT
    the log wrapper, because IEEE log is not correctly-rounded
    cross-engine (the q_tfidf_topterms lesson; same monotone ordering
    per term). Clearing every denominator turns the per-term score
    into one BIGINT ratio:

        s_t = 44·TT·(2(N−df)+1)·tf·SCALE
              DIV (2df+1)·(20·TT·tf + 6·TT + 18·dl·N)

    (TT = corpus token count, dl = doc length, avgdl = TT/N folded in;
    44 = 20·(k1+1), 6 = 20·k1·(1−b), 18 = 20·k1·b·… after ×20·TT).
    Integer division truncates toward zero identically in both engines
    (all operands positive), so the summed fixed-point score is exact
    and the key hash-gates. Bounds: tf ≤ 30 (saturation cap), TT ≤ 10⁶
    at sf0.1, idf numerator ≤ 2N ≈ 10⁴ → worst product ≈ 10¹⁷ < 2⁶³.
    At a true 100 TB corpus the scoring moves to doubles (ordering
    only needs per-engine consistency there) — this key pins the
    semantics at oracle scale.

    Scale shape: ONE narrow projection computes dl and the three tf
    columns per doc (no explode, no token shuffle — the term list is a
    query parameter); the corpus stats (N, TT, df per term) are one
    map-side-combinable global agg broadcast back as a 1-row frame;
    the final ranking is TakeOrdered top-15. Single pass over text."""
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.trim(F.col("text")).alias("_tt"),
        F.split(F.trim(F.col("text")), r"\s+").alias("_toks"),
    )
    def _tf_col(term: str, i: int):
        # single-arg lambda ONLY: a second parameter makes F.filter pass
        # the array INDEX as that argument (PySpark arity dispatch)
        return (
            F.least(
                F.size(F.filter(F.col("_toks"), lambda t: t == F.lit(term))),
                F.lit(_BM25_TFCAP),
            )
            .cast("long")
            .alias(f"_tf{i}")
        )

    tf_cols = [_tf_col(term, i) for i, term in enumerate(_BM25_TERMS)]
    # _dl is spelled NON-NULLABLE (coalesce with 0, r18): the final
    # f_score_scaled > 0 filter makes Catalyst infer isnotnull(_dl) and
    # push it below the Project, where it re-evaluated the split per
    # row (plan-verified). A NULL text row had _dl NULL before and 0
    # now — it contributes identically to SUM(_dl), and its score stays
    # NULL (the tf columns are untouched), so it is still dropped.
    per = base.select(
        "doc_id",
        F.coalesce(
            F.when(F.length("_tt") == 0, F.lit(0)).otherwise(
                F.size("_toks")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("_dl"),
        *tf_cols,
    )
    g = per.groupBy().agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("_dl").cast("long").alias("_ttl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long"))
            .cast("long")
            .alias(f"_df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    # integer division via SQL DIV on materialized numerator/denominator
    # columns (positive operands → identical truncation both engines)
    work = per.crossJoin(F.broadcast(g))
    for i in range(len(_BM25_TERMS)):
        num = (
            F.lit(44).cast("long")
            * F.col("_ttl")
            * (F.lit(2).cast("long") * (F.col("_n") - F.col(f"_df{i}")) + 1)
            * F.col(f"_tf{i}")
            * F.lit(_BM25_SCALE).cast("long")
        )
        den = (F.lit(2).cast("long") * F.col(f"_df{i}") + 1) * (
            F.lit(20).cast("long") * F.col("_ttl") * F.col(f"_tf{i}")
            + F.lit(6).cast("long") * F.col("_ttl")
            + F.lit(18).cast("long") * F.col("_dl") * F.col("_n")
        )
        work = work.withColumn(f"_num{i}", num).withColumn(f"_den{i}", den)
        work = work.withColumn(
            f"_s{i}", F.expr(f"_num{i} DIV _den{i}").cast("long")
        )
    total = sum(F.col(f"_s{i}") for i in range(len(_BM25_TERMS)))
    return (
        work.withColumn("f_score_scaled", total.cast("long"))
        .filter(F.col("f_score_scaled") > 0)
        .select(
            "doc_id",
            F.col("_dl").alias("f_dl"),
            *[
                F.col(f"_tf{i}").alias(f"f_tf_{t}")
                for i, t in enumerate(_BM25_TERMS)
            ],
            "f_score_scaled",
            (F.col("f_score_scaled").cast("double") / _BM25_SCALE).alias(
                "f_score"
            ),
        )
        .orderBy(F.col("f_score_scaled").desc(), F.col("doc_id").asc())
        .limit(_BM25_TOPK)
    )


def _bm25_oracle() -> str:
    tf_exprs = ", ".join(
        "LEAST(CAST(len(list_filter(regexp_split_to_array(trim(text),"
        f" '\\s+'), t -> t = '{term}')) AS BIGINT), {_BM25_TFCAP})"
        f" AS tf{i}"
        for i, term in enumerate(_BM25_TERMS)
    )
    df_exprs = ", ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    s_exprs = " + ".join(
        f"((44 * ttl * (2 * (n - df{i}) + 1) * tf{i} * {_BM25_SCALE})"
        f" // ((2 * df{i} + 1)"
        f" * (20 * ttl * tf{i} + 6 * ttl + 18 * dl * n)))"
        for i in range(len(_BM25_TERMS))
    )
    tf_out = ", ".join(
        f"tf{i} AS f_tf_{t}" for i, t in enumerate(_BM25_TERMS)
    )
    return f"""
    WITH per AS (
        SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                    END AS BIGINT) AS dl,
               {tf_exprs}
        FROM documents
    ),
    g AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(dl) AS BIGINT) AS ttl,
               {df_exprs}
        FROM per
    ),
    scored AS (
        SELECT per.doc_id, per.dl, {', '.join(f'per.tf{i}' for i in range(len(_BM25_TERMS)))},
               CAST({s_exprs} AS BIGINT) AS f_score_scaled
        FROM per CROSS JOIN g
    )
    SELECT doc_id, dl AS f_dl, {tf_out}, f_score_scaled,
           CAST(f_score_scaled AS DOUBLE) / {_BM25_SCALE} AS f_score
    FROM scored WHERE f_score_scaled > 0
    ORDER BY f_score_scaled DESC, doc_id ASC
    LIMIT {_BM25_TOPK}
"""


ORACLE["q_bm25_topk"] = _bm25_oracle()
QUERIES["q_bm25_topk"] = q_bm25_topk


# ---------------------------------------------------------------------------
# Edit-distance near-dup (prefix-blocked Levenshtein, exact integers)
# ---------------------------------------------------------------------------

_EDIT_BLOCK_CHARS = 20   # blocking prefix (normalized)
_EDIT_CMP_CHARS = 200    # comparison window
_EDIT_MAX_LEV = 40       # near-dup threshold
_EDIT_BLOCK_CAP = 64     # max block size admitted to the pair join


def q_dedup_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup detection, ORACLE-GATED — the fuzzy-dedup
    family member MinHash/SimHash can't express: pairs whose NORMALIZED
    200-char heads are within Levenshtein distance 40, candidate-blocked
    on the normalized 20-char prefix (a pair with edits inside the
    first 20 chars is out of blocking scope — standard
    blocked-entity-resolution honesty, same contract as q_dedup_ngram's
    shingle blocks). Levenshtein is an exact integer in BOTH engines
    (dynamic-programming edit distance, no floats anywhere), so the key
    hash-gates. Normalization reuses the q_dedup_normalized spelling
    (explicit ASCII classes, DuckDB 'g' flag).

    Scale shape: the block key is a hash-shuffle key (ONE shuffle —
    r17: the block-size gate is a count window over that same exchange
    instead of a separate agg + join, and the self-join's two legs are
    ReusedExchange reads of it); blocks larger than 64 rows are
    EXCLUDED before the self-join (the Σ block² ≤ cap·n bound of
    q_dedup_ngram — mega-blocks mean the prefix is boilerplate and
    belong to the MinHash path, not O(b²) pair scoring); the
    Levenshtein DP runs per surviving pair only, THRESHOLD-BOUNDED
    (r17: the banded O(cmp·lev_max) DP — exact distance for every kept
    pair, −1 past the bound, identical kept rows) in codegen. No
    Python in any row path."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 \t\r\n]", ""),
            "[ \t\r\n]+",
            " ",
        )
    )
    # r18: normalize ONCE into a materialized column and gate via an
    # explode of a guarded 1-element array — the old standalone
    # filter(length(norm) >= 20) was predicate-pushed below the Project
    # and re-evaluated the two-regexp normalize chain per row on both
    # self-join legs (plan-verified); a Generate is a pushdown barrier,
    # and _nrm is an attribute read (free) inside the guard. Identical
    # surviving rows: length >= 20 emits exactly one struct, else none.
    nrm = d.select("doc_id", norm.alias("_nrm"))
    docs = nrm.select(
        "doc_id",
        F.explode(
            F.expr(
                f"IF(length(_nrm) >= {_EDIT_BLOCK_CHARS},"
                f" array(struct("
                f" substring(_nrm, 1, {_EDIT_CMP_CHARS}) AS _head,"
                f" substring(_nrm, 1, {_EDIT_BLOCK_CHARS}) AS _bkey)),"
                f" array())"
            )
        ).alias("_hb"),
    ).select(
        "doc_id",
        F.col("_hb._head").alias("_head"),
        F.col("_hb._bkey").alias("_bkey"),
    )
    blocked = docs.withColumn(
        "_bn", F.count("*").over(Window.partitionBy("_bkey"))
    ).filter(F.col("_bn") <= _EDIT_BLOCK_CAP)
    a = blocked.select(
        F.col("_bkey"),
        F.col("doc_id").alias("f_id_a"),
        F.col("_head").alias("_ha"),
    )
    b = blocked.select(
        F.col("_bkey"),
        F.col("doc_id").alias("f_id_b"),
        F.col("_head").alias("_hb"),
    )
    pairs = (
        a.join(b, "_bkey")
        .filter(F.col("f_id_a") < F.col("f_id_b"))
        .withColumn(
            "f_lev",
            F.levenshtein(
                F.col("_ha"), F.col("_hb"), threshold=_EDIT_MAX_LEV
            ).cast("long"),
        )
        # thresholded levenshtein returns -1 ABOVE the bound and never
        # exceeds it otherwise, so `>= 0` ALONE is the exact kept-pair
        # predicate (range [-1] ∪ [0, _EDIT_MAX_LEV]). A second
        # `<= _EDIT_MAX_LEV` clause is redundant — and costly: pushdown
        # inlines f_lev into the join condition, so each extra clause
        # is one more banded-DP evaluation per candidate pair (r18:
        # the clause drop cut the in-join levenshtein count 2 -> 1).
        .filter(F.col("f_lev") >= 0)
    )
    return pairs.select("f_id_a", "f_id_b", "f_lev").orderBy(
        F.col("f_lev").asc(), F.col("f_id_a").asc(), F.col("f_id_b").asc()
    )


ORACLE["q_dedup_edit"] = f"""
    WITH docs AS (
        SELECT doc_id,
               substr(nrm, 1, {_EDIT_CMP_CHARS}) AS head,
               substr(nrm, 1, {_EDIT_BLOCK_CHARS}) AS bkey
        FROM (
            SELECT doc_id,
                   trim(regexp_replace(
                       regexp_replace(lower(text), '[^a-z0-9 \t\r\n]', '',
                                      'g'),
                       '[ \t\r\n]+', ' ', 'g')) AS nrm
            FROM documents
        ) WHERE length(nrm) >= {_EDIT_BLOCK_CHARS}
    ),
    ok AS (
        SELECT bkey FROM docs GROUP BY bkey
        HAVING COUNT(*) <= {_EDIT_BLOCK_CAP}
    ),
    blocked AS (SELECT docs.* FROM docs JOIN ok ON docs.bkey = ok.bkey),
    pairs AS (
        SELECT a.doc_id AS f_id_a, b.doc_id AS f_id_b,
               CAST(levenshtein(a.head, b.head) AS BIGINT) AS f_lev
        FROM blocked a JOIN blocked b
          ON a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT f_id_a, f_id_b, f_lev FROM pairs
    WHERE f_lev <= {_EDIT_MAX_LEV}
    ORDER BY f_lev ASC, f_id_a ASC, f_id_b ASC
"""
QUERIES["q_dedup_edit"] = q_dedup_edit


# ---------------------------------------------------------------------------
# Triangle counting (degree-oriented compact-forward, exact integers)
# ---------------------------------------------------------------------------

_TRI_MIN_W = 2    # co-occurrence support threshold for an edge
_TRI_TOPK = 10


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the part co-purchase graph, ORACLE-GATED —
    the local-clustering graph feature (community density, link-spam
    signals) alongside q_pagerank's global ranking. Edges = part pairs
    co-occurring in ≥ 2 orders (the support threshold that prunes the
    quadratic co-occurrence tail); the count runs the degree-oriented
    COMPACT-FORWARD algorithm: orient every edge from the lower-degree
    endpoint (ties by id) so the graph becomes a DAG whose out-degrees
    are O(√m), then count s→t→w paths closed by s→w. Each triangle is
    counted exactly once; everything is integer, so the key hash-gates.
    Output: top-10 nodes by triangle membership (each triangle credits
    all 3 corners), count-desc / id-asc.

    Scale shape: the co-occurrence build is the data-scale part — ONE
    shuffle on the order key (distinct parts per order via collect_set)
    with the per-order pair expansion ROW-LOCAL in codegen (r17: was a
    distinct projection + self-equi-join on the order key — two more
    sorted exchanges + SMJ for the identical pair stream; per-order
    part counts are schema-bounded (~4-7 parts/order at every TPC-H
    SF), so the per-row array is bounded BY THE SCHEMA), aggregated
    map-side-combinably to the pair key with the support HAVING pushed
    into the aggregate; the triangle phase runs on the SUPPORT-PRUNED
    edge list with two hash-equi-joins on node keys (the degree
    orientation is exactly what bounds the wedge fan-out on hub nodes —
    the textbook O(m^1.5) bound). No window over unbounded data, no
    cartesian join, no Python."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    # lazy checkpoints cut the lineage of the two multiply-referenced
    # frames (pairs feeds deg + the orientation; oe feeds THREE join
    # legs) — without them every leg re-executes the whole co-occurrence
    # build (the q_pagerank per-round discipline)
    byo = li.groupBy("o").agg(
        F.array_sort(F.collect_set("p")).alias("_ps")
    )
    pairs = (
        byo.select(
            F.explode(
                F.expr(
                    "flatten(transform(_ps, (x, i) ->"
                    " transform(slice(_ps, i + 2, size(_ps)),"
                    " y -> struct(x AS u, y AS v))))"
                )
            ).alias("_pr")
        )
        .groupBy(F.col("_pr.u").alias("u"), F.col("_pr.v").alias("v"))
        .agg(F.count("*").alias("_w"))
        .filter(F.col("_w") >= _TRI_MIN_W)
        .select("u", "v")
    )
    pairs = _ckpt(pairs)
    deg = (
        pairs.select(F.col("u").alias("n"))
        .unionAll(pairs.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("_d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("_d").alias("_du"))
    dv = deg.select(F.col("n").alias("v"), F.col("_d").alias("_dv"))
    fwd = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    oe = (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    oe = _ckpt(oe)
    a = oe.select(F.col("s").alias("x"), F.col("t").alias("y"))
    b = oe.select(F.col("s").alias("y"), F.col("t").alias("z"))
    c = oe.select(F.col("s").alias("x"), F.col("t").alias("z"))
    tri = a.join(b, "y").join(c, ["x", "z"]).select("x", "y", "z")
    corners = (
        tri.select(F.col("x").alias("f_part"))
        .unionAll(tri.select(F.col("y").alias("f_part")))
        .unionAll(tri.select(F.col("z").alias("f_part")))
    )
    return (
        corners.groupBy("f_part")
        .agg(F.count("*").cast("long").alias("f_triangles"))
        .orderBy(F.col("f_triangles").desc(), F.col("f_part").asc())
        .limit(_TRI_TOPK)
        .select(F.col("f_part").cast("long").alias("f_part"), "f_triangles")
    )


ORACLE["q_graph_triangles"] = f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    e AS (
        SELECT a.p AS u, b.p AS v
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p HAVING COUNT(*) >= {_TRI_MIN_W}
    ),
    deg AS (
        SELECT n, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e)
        GROUP BY n
    ),
    oe AS (
        SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                    THEN e.u ELSE e.v END AS s,
               CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                    THEN e.v ELSE e.u END AS t
        FROM e JOIN deg du ON e.u = du.n JOIN deg dv ON e.v = dv.n
    ),
    tri AS (
        SELECT a.s AS x, a.t AS y, b.t AS z
        FROM oe a
        JOIN oe b ON a.t = b.s
        JOIN oe c ON c.s = a.s AND c.t = b.t
    ),
    corners AS (
        SELECT x AS f_part FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
    )
    SELECT CAST(f_part AS BIGINT) AS f_part,
           CAST(COUNT(*) AS BIGINT) AS f_triangles
    FROM corners
    GROUP BY f_part
    ORDER BY f_triangles DESC, f_part ASC
    LIMIT {_TRI_TOPK}
"""
QUERIES["q_graph_triangles"] = q_graph_triangles


# ---------------------------------------------------------------------------
# Bigram conditional surprisal (integer bits, oracle-gated)
# ---------------------------------------------------------------------------


def q_surprisal_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIGRAM-conditional surprisal quality score, ORACLE-GATED — the
    context-aware upgrade of q_doc_surprisal's unigram model: each
    token's information content given its predecessor is
    ⌊log2⌊c(prev)/c(prev,tok)⌋⌋ bits, where c(prev,tok) is the corpus
    bigram count and c(prev) = Σ_tok c(prev,tok) (the context's
    outgoing mass, so the conditional model normalizes exactly). The
    integer bit-length spelling keeps the estimator hash-checkable
    (IEEE log2 never is). Per document: bigram count, total bits,
    bits-per-bigram — word-salad scores HIGH (unseen transitions),
    templated text LOW. Documents with < 2 tokens contribute no rows
    (no transitions to score), identically in both engines.

    Scale: bigrams explode once off the SAME filtered token array
    (element_at indexing, no self-join on position); the bigram
    dictionary is vocab²-sized and therefore NEVER force-broadcast
    (the q_tfidf_topterms lesson — AQE decides); the context table
    derives from the bigram table by one more combinable agg, not a
    second corpus pass."""
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.expr(
            "filter(split(trim(text), '\\\\s+'), x -> length(x) > 0)"
        ).alias("_t"),
    )
    # <2-token gate inside the bigram expression (empty array -> explode
    # emits nothing — identical rows to the old filter, and the guard
    # also keeps ANSI element_at from ever seeing an invalid index): a
    # standalone filter(size(_t) >= 2) is pushed below the Project and
    # re-evaluates the split+filter chain per row (r18 §4.4 fix)
    grams = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "IF(size(_t) >= 2,"
                " transform(sequence(2, size(_t)), i ->"
                " concat(element_at(_t, i - 1), ' ', element_at(_t, i))),"
                " array())"
            )
        ).alias("gram"),
    )
    freq_bi = grams.groupBy("gram").agg(
        F.count("*").cast("long").alias("bf")
    )
    ctx = (
        freq_bi.withColumn("prev", F.split(F.col("gram"), " ").getItem(0))
        .groupBy("prev")
        .agg(F.sum("bf").cast("long").alias("cf"))
    )
    scored = (
        grams.join(freq_bi, "gram")
        .withColumn("prev", F.split(F.col("gram"), " ").getItem(0))
        .join(ctx, "prev")
        .withColumn(
            "_bits", F.expr("CAST(length(bin(cf DIV bf)) - 1 AS BIGINT)")
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("f_n_bigrams"),
        F.sum("_bits").cast("long").alias("f_bits"),
        (F.sum("_bits").cast("double") / F.count("*").cast("double")).alias(
            "f_bits_per_bigram"
        ),
    )


ORACLE["q_surprisal_bigram"] = """
    WITH base AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           x -> length(x) > 0) AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(2, len(t) + 1),
                                     i -> t[i-1] || ' ' || t[i])) AS gram
        FROM base WHERE len(t) >= 2
    ),
    freq_bi AS (
        SELECT gram, CAST(COUNT(*) AS BIGINT) AS bf FROM grams GROUP BY gram
    ),
    ctx AS (
        SELECT string_split(gram, ' ')[1] AS prev,
               CAST(SUM(bf) AS BIGINT) AS cf
        FROM freq_bi GROUP BY string_split(gram, ' ')[1]
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS f_n_bigrams,
           CAST(SUM(length(bin(c.cf // f.bf)) - 1) AS BIGINT) AS f_bits,
           CAST(SUM(length(bin(c.cf // f.bf)) - 1) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS f_bits_per_bigram
    FROM grams g
    JOIN freq_bi f ON g.gram = f.gram
    JOIN ctx c ON string_split(g.gram, ' ')[1] = c.prev
    GROUP BY g.doc_id
"""
QUERIES["q_surprisal_bigram"] = q_surprisal_bigram
