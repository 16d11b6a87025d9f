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
    return out


def oracle_sql() -> dict[str, str]:
    _try_ext_modules()
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(getattr(m, "ORACLE", {}))
    return out
