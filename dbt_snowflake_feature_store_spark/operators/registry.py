"""Query-key registry: maps SURVEY.md §2 query keys to (spark_fn, oracle_sql).

Each module in this package contributes entries via ``QUERIES`` (dict of
key → callable(spark, sf_dir) -> DataFrame) and ``ORACLE`` (dict of key →
DuckDB SQL string, omitted for non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import relational, relational2

_MODULES = [relational, relational2]


def _try_ext_modules() -> None:
    global _MODULES
    try:
        from . import ext_text

        if ext_text not in _MODULES:
            _MODULES.append(ext_text)
    except ImportError:
        pass
    try:
        from . import ext_similarity

        if ext_similarity not in _MODULES:
            _MODULES.append(ext_similarity)
    except ImportError:
        pass
    try:
        from . import feature_queries

        if feature_queries not in _MODULES:
            _MODULES.append(feature_queries)
    except ImportError:
        pass


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
