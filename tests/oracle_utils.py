"""Local replica of the driver's t2 DuckDB-oracle comparison: row count +
order-insensitive canonicalized value comparison. Strict by default —
floats must match exactly (the queries are engineered for exact equality
via decimal-sum aggregation).

Type-aware since round 4: the driver's canonicalization is sensitive to
the PHYSICAL result type, not just the printed value — DuckDB ``HUGEINT``
(``SUM(BIGINT)``) and scale-bearing ``DECIMAL`` results hash differently
from Spark ``BIGINT``/``DOUBLE`` even when the numbers are equal. We fetch
the oracle result as Arrow and require each output column's Arrow type to
be canon-equivalent to the Spark dtype (``types_compatible``), which
reproduces the driver's round-2 HUGEINT failures locally instead of
discovering them one round later."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import pyarrow as pa

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


# Spark integer dtypes: any width pairing with an Arrow integer is canon-
# safe (exact values, identical str()). HUGEINT is NOT an Arrow integer —
# DuckDB exports it as decimal128(38,0), so it fails here, exactly like
# the driver's hash.
_INT_SPARK = {"tinyint", "smallint", "int", "bigint"}


def types_compatible(spark_dt: str, arrow_t: pa.DataType) -> bool:
    """Is a DuckDB Arrow result type canon-equivalent to a Spark dtype?

    Equivalence = "both engines canonicalize values of this type to the
    same string for every representable value". Integer widths are
    interchangeable; float widths, decimal scales, and numeric classes
    (int vs decimal vs float) are not."""
    spark_dt = spark_dt.lower()
    if spark_dt in _INT_SPARK:
        return pa.types.is_integer(arrow_t)
    if spark_dt == "double":
        return pa.types.is_float64(arrow_t)
    if spark_dt == "float":
        return pa.types.is_float32(arrow_t)
    if spark_dt == "boolean":
        return pa.types.is_boolean(arrow_t)
    if spark_dt == "string":
        return pa.types.is_string(arrow_t) or pa.types.is_large_string(arrow_t)
    if spark_dt == "binary":
        return pa.types.is_binary(arrow_t) or pa.types.is_large_binary(arrow_t)
    if spark_dt == "date":
        return pa.types.is_date(arrow_t)
    if spark_dt in ("timestamp", "timestamp_ntz"):
        # canon strips tz and prints µs isoformat; any Arrow timestamp
        # unit/tz canonicalizes identically for µs-grained data
        return pa.types.is_timestamp(arrow_t)
    if spark_dt.startswith("decimal"):
        if not (pa.types.is_decimal(arrow_t)):
            return False
        # scale drives Decimal's string form ('1.50' vs '1.5'); precision
        # is display-only
        scale = int(spark_dt.rstrip(")").split(",")[1])
        return arrow_t.scale == scale
    if spark_dt.startswith("array<"):
        if not (pa.types.is_list(arrow_t) or pa.types.is_large_list(arrow_t)):
            return False
        return types_compatible(spark_dt[6:-1], arrow_t.value_type)
    # unknown/rare types (struct, map, interval): don't block locally
    return True


def check_types(spark_df, arrow_schema: pa.Schema) -> list[str]:
    """Return a list of per-column type-mismatch descriptions."""
    s_types = {c.lower(): t for c, t in spark_df.dtypes}
    problems = []
    for field in arrow_schema:
        sdt = s_types.get(field.name.lower())
        if sdt is None:
            continue  # column-set mismatch reported separately
        if not types_compatible(sdt, field.type):
            problems.append(
                f"{field.name}: spark {sdt} vs oracle arrow {field.type}"
            )
    return problems


def compare_query(spark, sf_dir: str, spark_df, sql: str) -> None:
    con = duckdb_conn(sf_dir)
    o_arrow = con.execute(sql).fetch_arrow_table()
    o_cols = list(o_arrow.column_names)
    o_rows = con.execute(sql).fetchall()

    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(c.lower() for c in s_cols) == sorted(
        c.lower() for c in o_cols
    ), f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"

    type_problems = check_types(spark_df, o_arrow.schema)
    assert not type_problems, f"type mismatch: {type_problems}"

    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )

    s_canon = rows_canon(s_rows, [c.lower() for c in s_cols])
    o_canon = rows_canon(o_rows, [c.lower() for c in o_cols])
    mismatches = [
        (a, b) for a, b in zip(s_canon, o_canon) if a != b
    ]
    assert not mismatches, f"value mismatch (first 3): {mismatches[:3]}"
