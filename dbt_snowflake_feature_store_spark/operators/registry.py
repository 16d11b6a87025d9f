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
    # round 7, part 1: keys whose code paths changed THIS round — the
    # connected-components rewrite (auto default, lazy checkpoints,
    # star exact-confirm) and the pair-cache eviction feed these three
    "q_dedup_clusters", "q_corpus_dedup_stats", "q_dedup_near_portable",
    # the multimodal decode path gained a real PNG codec this round
    "q_multimodal_decode",
    # NEW round-7 keys (relational3 TPC-H shapes + ngram novelty)
    "q_tpch_q7like", "q_tpch_q8like", "q_tpch_q14like", "q_tpch_q22like",
    "q_ngram_novelty", "q_embed_covariance", "q_window_percentile",
    "q_approx_distinct_sketch", "q_global_rank", "q_global_ntile", "q_bpe_train", "q_chunk_overlap", "q_join_asof_near", "q_cube", "q_k_anonymity", "q_sim_pq", "q_sim_ivfpq", "q_negative_sample", "q_zorder_key", "q_set_ops_all", "q_histogram", "q_lateral_topn",
    # part 2: 31 of the 33 keys whose latest driver record is r04
    # (VERDICT r6 item 1) — relational.py/pit.py-adjacent ones first
    # (those files changed in r6 after the r4 record). q_agg_approx
    # (rows-only — a driver record adds little), q_percentile,
    # q_text_repetition, q_scd2_multi, q_rfm, q_retention, q_hopping,
    # q_funnel and q_fingerprint_winnow (unchanged since r1/r4) are the
    # names squeezed out by the 50-key cap; all are covered by
    # CORRECTNESS_LOCAL_r07's full sweep.
    "q_sessionize", "q_join_left", "q_join_multi_fv", "q_join_range",
    "q_window_frame", "q_window_range", "q_window_rank", "q_semi_anti",
    "q_union_all", "q_agg_having", "q_cte_pipeline", "q_explode_tokens",
    "q_pivot", "q_rollup", "q_set_ops", "q_sort_limit",
    "q_scalar_date", "q_scalar_json", "q_scalar_str", "q_scalar_subquery",
    "q_tpch_q1like", "q_tpch_q3like", "q_tpch_q5like",
    "q_dedup_simhash_portable",
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
