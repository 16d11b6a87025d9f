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
    # round 6: the r5 driver-RED key, fixed this round — MUST re-record
    "q_sample_temperature",
    # the 11 keys with no r4/r5 driver-dated record (VERDICT r5 item 2)
    "q_session_window", "q_sim_ann_lsh", "q_sim_ivf", "q_stats_moments",
    "q_text_quality", "q_text_search", "q_text_stats", "q_token_count",
    "q_tpch_q13like", "q_tpch_q17like", "q_window_nav",
    # keys whose code or oracle changed this round (advice fixes)
    "q_sample_to_mix", "q_join_asof", "q_join_asof_fwd", "q_event_dedup",
    "q_dedup_chunks", "q_dedup_cross_source", "q_generate_dataset",
    "q_fv_latest_snapshot",
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
