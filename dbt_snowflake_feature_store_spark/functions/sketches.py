"""Mergeable distinct-count sketches (Apache DataSketches HLL via the
Spark 3.5+ ``hll_*`` built-ins — JVM-side, no UDF anywhere).

Why a feature store needs this: COUNT(DISTINCT user) per slice is the
one aggregate a 100 TB incremental pipeline cannot maintain by
re-aggregation — distinct counts don't add. The mergeable form does:
materialize one HLL SKETCH per (key, day) at refresh time (each refresh
touches only new days), then answer any date-range/any-rollup distinct
query by UNIONING sketches — kilobytes per slice instead of a rescan of
raw events. This is the engine-side analog of Snowflake's
HLL/APPROX_COUNT_DISTINCT + HLL_COMBINE family, which the reference's
arbitrary-SELECT FV bodies can call
(/root/reference/macros/materializations/feature_view.sql:126).

Determinism: DataSketches HLL is hash-based — the same input SET yields
the same sketch regardless of row order or partitioning, and union is
commutative/associative/idempotent, so estimates are reproducible
across runs and cluster layouts (asserted in tests/test_sketches.py).
No DuckDB oracle (different sketch impl) — pytest gates exactness
bounds and merge algebra instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # 2^12 registers ≈ 0.8% relative standard error


def hll_sketch_by_key(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """One HLL sketch per key group over ``col`` — the MATERIALIZATION
    step. Map-side combinable (partial sketches merge in the shuffle),
    one exchange on the key. Output: keys + a binary sketch column."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias(sketch_col)
    )


def hll_rollup(
    df: DataFrame,
    keys: Sequence[str],
    sketch_col: str = "hll_sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Merge already-materialized sketches up to a coarser key set and
    estimate — the QUERY step: any rollup of a (key, day) sketch table
    without touching raw data. Shuffles only sketch bytes."""
    merged = df.groupBy(*keys).agg(
        F.hll_union_agg(F.col(sketch_col), F.lit(True)).alias(sketch_col)
    )
    return merged.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col)).cast("long")
    )


def hll_estimate(col: Column | str) -> Column:
    """Estimate a single sketch column (no merge)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.hll_sketch_estimate(c).cast("long")


def distinct_over_time(
    events: DataFrame,
    key: str,
    value_col: str,
    ts_col: str = "ts",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """The canonical incremental recipe: per-(key, day) sketches of
    ``value_col``. Refresh materializes this with a day-partitioned
    sink (only new days recompute); any date-range distinct query is a
    filter + ``hll_rollup`` over it."""
    return hll_sketch_by_key(
        events.withColumn("_fs_day", F.to_date(F.col(ts_col))),
        [key, "_fs_day"],
        value_col,
        lg_k=lg_k,
    )
