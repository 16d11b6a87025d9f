"""Query-key registry: maps SURVEY.md §2 query keys to (spark_fn, oracle_sql).

Each module in this package contributes entries via ``QUERIES`` (dict of
key → callable(spark, sf_dir) -> DataFrame) and ``ORACLE`` (dict of key →
DuckDB SQL string, omitted for non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import relational, relational2

# Module merge order determines registry iteration order, which determines
# which keys the driver's 50-entry CORRECTNESS record covers. High-value
# keys first: feature-store machinery (generate_dataset, FV reads/chain),
# then the EXT similarity/text families, then relational2; the plain
# relational keys (lowest risk, all green in CORRECTNESS_r01) come last
# and absorb the cap.
_MODULES = [relational2, relational]

# Rotation policy (round 4+): the 50-entry cap left 26 relational keys with
# no driver-dated record for two rounds, and round 3 proved the blind spot
# bites (q_sessionize rotted unseen). Keys least-recently recorded by the
# driver are promoted to the FRONT of the registry for one round; update
# this tuple each round to whatever CORRECTNESS_r{N}.json did NOT cover.
# Full coverage every round regardless: CORRECTNESS_LOCAL_r{N}.json
# (written by .claude/skills/verify/drive_verify.py) records all keys.
# STANDING TWO-ROUND CYCLE (round 8+): 132 keys > 2× the 50-key driver
# cap, so the record rotates in halves — each round promotes (a) every
# key whose code changed this round, (b) every key whose latest driver
# record is ≥2 rounds old, oldest first. NOTES.md tracks the per-key
# latest-record round; no key's record may age past two rounds.
_PRIORITY_KEYS: tuple[str, ...] = (
    # round 8, part 1: keys whose code paths changed THIS round —
    # q_rfm's exact ntile rerouted through ranks.global_ntile (de-weak),
    # and the ranks.py layout-guard touches the global ordering keys
    "q_rfm", "q_global_rank", "q_global_ntile",
    "q_multimodal_decode", "q_multimodal_meta",
    # part 2: the 9 keys whose latest driver record is r4 (oldest)
    "q_agg_approx", "q_percentile", "q_funnel", "q_hopping",
    "q_retention", "q_scd2_multi", "q_text_repetition",
    "q_fingerprint_winnow",
    # part 3: the r5-dated keys (9 trivial scalar/projection keys —
    # q_arith_expr, q_case_when, q_cross_join, q_distinct,
    # q_filter_false, q_scan_project, q_null_handling, q_num_fns,
    # q_unpivot — were DEMOTED to make room for the second-wave keys
    # below; r9 MUST promote them, they will be 4 rounds stale)
    "q_agg_multi", "q_array_agg",
    "q_dedup_simhash",
    "q_filter_pred", "q_fingerprint", "q_groupby_agg", "q_grouping_sets",
    "q_join_equi", "q_join_full", "q_lang_id", "q_lang_id_conf",
    "q_multimodal_frames", "q_multimodal_resize",
    "q_scd2_history", "q_stats_moments",
    "q_tpch_q10like", "q_tpch_q4like",
    # part 4: new round-8 keys land here (keep total ≤ 50); the
    # remaining slots absorb r6-dated keys next round per the cycle
    "q_dedup_embed_portable",
    "q_tpch_q6like", "q_tpch_q12like", "q_tpch_q15like", "q_tpch_q18like",
    "q_tpch_q19like", "q_tpch_q21like", "q_quantile_sketch",
    "q_heavy_hitters_sketch", "q_epoch_shuffle",
    # part 5: round-8 second wave (relational4.py — all new, never
    # driver-recorded)
    "q_kmv_sketch", "q_kmv_jaccard", "q_gap_fill", "q_feature_drift",
    "q_join_skew_salted", "q_token_pmi", "q_bpe_segment",
    "q_ewma_decay", "q_event_corr", "q_pagerank",
)


def _rotate(out: dict) -> dict:
    front = {k: out[k] for k in _PRIORITY_KEYS if k in out}
    front.update((k, v) for k, v in out.items() if k not in front)
    return front


def _try_ext_modules() -> None:
    global _MODULES
    ordered = []
    try:
        from . import feature_queries

        ordered.append(feature_queries)
    except ImportError:
        pass
    try:
        from . import ext_similarity

        ordered.append(ext_similarity)
    except ImportError:
        pass
    try:
        from . import ext_text

        ordered.append(ext_text)
    except ImportError:
        pass
    try:
        from . import relational3

        ordered.append(relational3)
    except ImportError:
        pass
    try:
        from . import relational4

        ordered.append(relational4)
    except ImportError:
        pass
    _MODULES = ordered + [m for m in [relational2, relational] if m not in ordered]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _try_ext_modules()
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(getattr(m, "QUERIES", {}))
    return _rotate(out)


def oracle_sql() -> dict[str, str]:
    _try_ext_modules()
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(getattr(m, "ORACLE", {}))
    return _rotate(out)
