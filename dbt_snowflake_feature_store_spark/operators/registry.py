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
_PRIORITY_KEYS: tuple[str, ...] = (
    # new/changed this round — need a driver-dated record
    "q_scd2_multi", "q_fingerprint_winnow", "q_dedup_near_portable",
    "q_dedup_simhash_portable", "q_dedup_clusters", "q_corpus_dedup_stats",
    "q_text_repetition",
    "q_funnel", "q_retention", "q_hopping", "q_knn_join", "q_sim_topk",
    "q_sample_stratified", "q_rfm", "q_token_rarity", "q_dedup_embed",
    # least-recently recorded by the driver (not in CORRECTNESS_r03)
    "q_join_left", "q_join_multi_fv", "q_join_asof", "q_semi_anti",
    "q_union_all", "q_window_rank", "q_window_frame", "q_sort_limit",
    "q_scalar_str", "q_scalar_date", "q_scalar_json", "q_agg_having",
    "q_cte_pipeline", "q_rollup", "q_set_ops", "q_pivot", "q_join_range",
    "q_sessionize", "q_percentile", "q_agg_approx", "q_window_range",
    "q_scalar_subquery", "q_explode_tokens", "q_tpch_q1like",
    "q_tpch_q3like", "q_tpch_q5like",
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
