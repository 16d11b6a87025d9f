"""MERGE-style maintenance without a Delta/Iceberg runtime.

The reference's INCREMENTAL Dynamic Tables imply keyed upserts; with
Delta jars absent (environment note in README) we emulate ``MERGE INTO``
with the classic anti-join + union snapshot pattern, plus an SCD2 helper:

- ``merge_upsert``: new snapshot = (target ⟕anti updates on keys) ∪ updates
  — written to a fresh snapshot directory and atomically swapped in, the
  same copy-on-write shape Delta itself uses underneath.
- ``scd2_apply``: slowly-changing-dimension type 2 — close current rows
  whose attributes changed (set ``valid_to``), append the new versions.

Scale: both are one shuffle on the merge keys; the anti-join broadcast's
the updates side when small (Catalyst decides). At 100 TB the swap is a
metadata pointer flip on the table format; here it is a directory rename.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
) -> int:
    """Upsert ``updates`` into the parquet table at ``target_path`` by
    ``keys`` (last-writer-wins per key). Returns the new row count.

    Delegates to the storage layer's copy-on-write MERGE emulation: the
    merged snapshot is fully written + commit-marked before a crash-safe
    directory swap, and interrupted swaps are auto-repaired on the next
    read (storage.ParquetSnapshotFormat.recover)."""
    from ..storage import ParquetSnapshotFormat

    return ParquetSnapshotFormat().merge(spark, target_path, updates, keys)


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD type-2: ``current`` has (keys, attrs, valid_from, valid_to
    [null = open]); ``updates`` has (keys, attrs, ts_col). Rows whose key
    appears in updates get their open version closed at the EARLIEST
    update time; the update rows become chained versions — each row's
    ``valid_to`` is the next update's timestamp for that key
    (``lead`` over the key window), and only the LATEST update per key
    stays open (``valid_to`` NULL). One open version per key is the
    invariant, for any number of update rows per key in a batch.

    Determinism: updates sharing an exact (key, ts) chain in attribute-
    hash order — which of an exact tie is 'later' is engine-defined but
    stable across runs."""
    attr_cols = [c for c in updates.columns if c not in keys and c != ts_col]

    # close the currently-open row at the FIRST update's timestamp —
    # the chain of new versions begins there
    upd_times = updates.groupBy(*keys).agg(F.min(ts_col).alias("__new_ts"))
    closed = (
        current.join(upd_times, on=keys, how="left")
        .withColumn(
            valid_to,
            F.when(
                F.col(valid_to).isNull() & F.col("__new_ts").isNotNull(),
                F.col("__new_ts"),
            ).otherwise(F.col(valid_to)),
        )
        .drop("__new_ts")
    )

    w = Window.partitionBy(*keys).orderBy(
        F.col(valid_from).asc(),
        F.xxhash64(F.struct(*[F.col(c) for c in attr_cols])).asc(),
    )
    new_versions = (
        updates.select(
            *keys,
            *attr_cols,
            F.col(ts_col).alias(valid_from),
        )
        .withColumn(valid_to, F.lead(valid_from).over(w))
        .withColumn(valid_to, F.col(valid_to).cast("timestamp"))
    )
    return closed.unionByName(new_versions.select(closed.columns))
