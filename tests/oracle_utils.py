"""Local replica of the driver's t2 DuckDB-oracle comparison: row count +
order-insensitive canonicalized value comparison. Strict by default —
floats must match exactly (the queries are engineered for exact equality
via decimal-sum aggregation)."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from dbt_snowflake_feature_store_spark.sources import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def rows_canon(rows, colnames) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare_query(spark, sf_dir: str, spark_df, sql: str) -> None:
    con = duckdb_conn(sf_dir)
    oracle = con.execute(sql)
    o_cols = [d[0] for d in oracle.description]
    o_rows = oracle.fetchall()

    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(c.lower() for c in s_cols) == sorted(
        c.lower() for c in o_cols
    ), f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )

    s_canon = rows_canon(s_rows, [c.lower() for c in s_cols])
    o_canon = rows_canon(o_rows, [c.lower() for c in o_cols])
    mismatches = [
        (a, b) for a, b in zip(s_canon, o_canon) if a != b
    ]
    assert not mismatches, f"value mismatch (first 3): {mismatches[:3]}"
