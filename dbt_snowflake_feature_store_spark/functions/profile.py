"""One-pass column profiling — the data-quality report a feature-store
owner runs before trusting a feature view (null fractions, cardinality,
ranges, moments).

The reference has no profiling surface (its macros delegate everything to
Snowflake), but every `snowflake-ml-python` workflow it certifies starts
from "is this feature populated and sane" — the implicit operator behind
the reference's own data checks (e.g. the all-rows-have-features
assertions, /root/reference/integration_tests/python_tests/
test_feature_store_workflows.py:178-183).

Scale design: ONE aggregation job over the input regardless of column
count — every per-column statistic is an aggregate expression in the same
`agg()`, so Spark computes them in a single pass with map-side partial
aggregation and a 1-row result. Distinct counts use HLL++
(`approx_count_distinct`) so no per-column shuffle of the value space
exists anywhere. The 1-row result is collected and pivoted driver-side
(bounded by the column count, never by data size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_ORDERED = _NUMERIC + (
    T.StringType, T.TimestampType, T.TimestampNTZType, T.DateType,
    T.BooleanType,
)

PROFILE_SCHEMA = (
    "column string, dtype string, n_rows long, n_nulls long, "
    "null_frac double, approx_distinct long, min string, max string, "
    "mean double, stddev double"
)


def _agg_frame(
    df: DataFrame, columns: list[str], rsd: float
) -> DataFrame:
    """The single-pass 1-row aggregate every statistic is read from —
    exposed separately so tests can assert the plan shape (exactly one
    Exchange feeding a final HashAggregate)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        dt = fields[c]
        col = F.col(c)
        aggs.append(F.count(col).alias(f"__nn_{c}"))
        aggs.append(F.approx_count_distinct(col, rsd).alias(f"__ad_{c}"))
        if isinstance(dt, _ORDERED):
            aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
            aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.avg(col.cast("double")).alias(f"__mean_{c}"))
            aggs.append(F.stddev(col.cast("double")).alias(f"__sd_{c}"))
    return df.agg(*aggs)


def profile(df: DataFrame, columns: list[str] | None = None, rsd: float = 0.05) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in ONE aggregation
    pass; returns a small DataFrame with one row per column
    (``PROFILE_SCHEMA``).

    ``mean``/``stddev`` are populated for numeric columns only;
    ``min``/``max`` for any orderable type (rendered as strings so the
    report schema is column-type-independent); ``approx_distinct`` is
    HLL++ with relative error ``rsd``.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = list(fields)
    missing = [c for c in columns if c not in fields]
    if missing:
        raise ValueError(f"profile: unknown columns {missing}")

    row = _agg_frame(df, columns, rsd).head()
    n = row["__n"]
    out = []
    for c in columns:
        dt = fields[c]
        nn = row[f"__nn_{c}"]
        out.append(
            (
                c,
                dt.simpleString(),
                n,
                n - nn,
                (float(n - nn) / n) if n else 0.0,
                row[f"__ad_{c}"],
                row[f"__min_{c}"] if isinstance(dt, _ORDERED) else None,
                row[f"__max_{c}"] if isinstance(dt, _ORDERED) else None,
                row[f"__mean_{c}"] if isinstance(dt, _NUMERIC) else None,
                row[f"__sd_{c}"] if isinstance(dt, _NUMERIC) else None,
            )
        )
    return df.sparkSession.createDataFrame(out, PROFILE_SCHEMA)
