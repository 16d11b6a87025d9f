"""Source-table access for the driver testdata (TESTDATA.md).

The reference reads sources via dbt ``{{ source(...) }}`` bindings
(/root/reference/integration_tests/models/sources.yml:4-9); our equivalent
is plain Parquet scans registered as temp views, so FV SQL bodies resolve
the same names. Parquet scans get predicate pushdown, column pruning and
(where partitioned) partition pruning from Catalyst for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Event-time columns per table that must come out as session-TZ (UTC)
# TIMESTAMP regardless of the physical parquet layout. The driver's
# testdata has shipped two layouts across rounds:
#   * TIMESTAMP(NANOS): Spark has no ns type — read as int64 nanos
#     (spark.sql.legacy.parquet.nanosAsLong) and truncate ns→µs, the
#     same truncation DuckDB applies.
#   * timestamp[us] (current): Spark infers TIMESTAMP_NTZ, which is
#     poison downstream — TIMESTAMP_NTZ → BIGINT casts throw
#     AnalysisException. Cast to TIMESTAMP under the UTC session TZ
#     (identical wall-clock values, so the DuckDB oracle agrees).
# Normalizing HERE, not per-operator, is the 100 TB posture: source
# type drift must not take down every downstream query.
# The bigint-nanos repair is driven by the parquet FOOTER: a column
# that reads as bigint only because nanosAsLong is set still declares a
# timestamp logical type in the file schema, so _footer_ts_cols
# identifies it for ANY table — no silent bigint timestamps outside a
# static allowlist. The allowlist remains as a fallback for the case
# where footer probing fails (e.g. an exotic filesystem). The NTZ
# repair is safe for EVERY timestamp column of EVERY table, so it runs
# unconditionally — if the driver rotates another table's timestamps to
# timestamp[us] (as events.ts did in round 3), nothing downstream
# notices.
_EVENT_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def _footer_ts_cols(path: str) -> set[str] | None:
    """Column names the parquet footer declares as timestamps (any
    unit). Returns None when the footer cannot be probed — callers fall
    back to the static allowlist. One footer read per read_table call:
    metadata-only, no row data."""
    try:
        import glob

        import pyarrow as pa
        import pyarrow.parquet as pq

        if os.path.isfile(path):
            probe = path
        else:
            parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not parts:
                return None
            probe = parts[0]
        schema = pq.ParquetFile(probe).schema_arrow
        return {f.name for f in schema if pa.types.is_timestamp(f.type)}
    except Exception:
        return None


def normalize_frame(
    df: DataFrame,
    path: str | None = None,
    ns_allowlist: tuple[str, ...] = (),
    table: str = "?",
) -> DataFrame:
    """Apply read_table's timestamp-layout normalization to an
    already-loaded frame: TIMESTAMP_NTZ → session-TZ TIMESTAMP (every
    column, every table), and bigint columns the parquet footer declares
    as timestamps (the nanosAsLong layout) → µs-truncated TIMESTAMP.
    ``path`` enables the footer probe; without it only ``ns_allowlist``
    repairs bigint-nanos columns. Shared by read_table and the
    FeatureStore registered-source read path (ADVICE-r13: freshness and
    model reads must see the same normalized types as every operator)."""
    ns_cols = set(ns_allowlist)
    if path is not None:
        footer_ts = _footer_ts_cols(path)
        if footer_ts is not None:
            ns_cols = footer_ts
    for c, dt in df.dtypes:
        if dt == "timestamp_ntz":  # timestamp[us] layout, any table
            df = df.withColumn(c, F.col(c).cast("timestamp"))
        elif dt == "bigint" and c in ns_cols:  # TIMESTAMP(NANOS) layout
            if c not in ns_allowlist:
                import logging

                logging.getLogger(__name__).info(
                    "normalize_frame(%s): footer-detected nanos timestamp "
                    "column '%s' (not in the static allowlist) — repairing",
                    table,
                    c,
                )
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


# (applicationId, session id, path, file signature) → resolved source
# PLAN. This is a METADATA cache, not a result cache: the cached object
# is the analyzed DataFrame (logical plan + parquet file index +
# footer-driven timestamp normalization) — every action against it still
# scans the parquet inputs. It is the session-scoped equivalent of
# Spark's own file-listing cache
# (spark.sql.hive.filesourcePartitionFileCacheSize — the guide-§6
# posture: re-listing/re-inferring the same immutable source on every
# operator call is pure driver latency, ~0.1 s per call here, paid
# inside every benched query). Freshness is guaranteed by the file
# signature (name, mtime_ns, size of every parquet part, RECURSIVE over
# subdirectories so a partitioned layout's nested part rewrite changes
# the key — ADVICE r17): any rewrite of the path produces a new key, so
# in-session test fixtures that overwrite their tmp tables never see a
# stale plan. The key carries the SESSION identity (ADVICE r17: the
# app_id-only key handed a sibling session in the same application a
# frame bound to another session); the value holds a strong session ref
# so the id can never be reused while the entry lives. Entries from
# dead applications are evicted on every lookup (the _PAIR_CACHE
# discipline).
#
# Shared-lineage caveat (documented per ADVICE r17): two read_table
# calls for the same (session, path) return the SAME analyzed frame —
# identical plan/attribute ids — so an operator joining two reads of
# one table is a self-join of one plan. That is the CLAUDE.md
# duplicate-name discipline (select via frame["col"] into fresh names
# before any expr() referencing them), which every operator already
# follows for genuinely shared lineage; test_scale_plans pins that the
# plain `join(..., on="key")` spelling stays resolvable.
_READ_CACHE: dict[tuple, tuple] = {}


def _path_signature(path: str):
    try:
        if os.path.isfile(path):
            st = os.stat(path)
            return ((os.path.basename(path), st.st_mtime_ns, st.st_size),)
        entries = []
        for root, dirs, files in os.walk(path):
            dirs.sort()  # deterministic walk order
            rel = os.path.relpath(root, path)
            for fn in sorted(files):
                st = os.stat(os.path.join(root, fn))
                entries.append(
                    (os.path.join(rel, fn), st.st_mtime_ns, st.st_size)
                )
        return tuple(entries)
    except OSError:
        return None


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one source table; normalizes event-time columns to UTC
    TIMESTAMP whether the file stores ns-int64 or timestamp[us]/NTZ.

    Pins the session timezone to UTC: parquet timestamps are UTC
    instants and the DuckDB oracle compares naive-UTC values — a host
    session left on a local timezone would shift every collected
    timestamp and break value comparison."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    app_id = spark.sparkContext.applicationId
    for k in [k for k in _READ_CACHE if k[0] != app_id]:
        del _READ_CACHE[k]
    sig = _path_signature(path)
    key = (app_id, id(spark), path, sig)
    if sig is not None:
        cached = _READ_CACHE.get(key)
        # identity check is belt-and-braces: the strong ref in the value
        # pins id(spark) against reuse, so a hit is always this session
        if cached is not None and cached[0] is spark:
            return cached[1]
    df = spark.read.parquet(path)
    df = normalize_frame(
        df, path=path, ns_allowlist=_EVENT_TS_COLS.get(name, ()), table=name
    )
    if sig is not None:
        # drop superseded signatures of the same (session, path) before
        # inserting
        for k in [
            k
            for k in _READ_CACHE
            if k[0] == app_id and k[1] == id(spark) and k[2] == path
        ]:
            del _READ_CACHE[k]
        _READ_CACHE[key] = (spark, df)
    return df


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ONLY when the scan produced fewer partitions than the
    cluster has cores (single-row-group local files). At real scale inputs
    already have >= cores partitions and this is a no-op — we never pay an
    all-to-all of a large corpus. Use before CPU-heavy per-row operators
    (shingling, hashing, Pandas UDFs), not scan-bound queries."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        # metadata-only estimate: number of input files lower-bounds the
        # scan partitions. df.rdd.getNumPartitions() would be exact but
        # costs a full plan→RDD conversion (~1 s of driver time per call).
        n = len(df.inputFiles())
    except Exception:
        n = df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load each parquet table as a DataFrame."""
    return {t: read_table(spark, sf_dir, t) for t in tables}


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load and register each table as a temp view (name = table name)."""
    dfs = load_tables(spark, sf_dir, tables)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
