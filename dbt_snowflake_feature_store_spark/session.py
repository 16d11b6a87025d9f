"""SparkSession factory with the engine's scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same config block
is what we'd ship for a multi-executor cluster (AQE on, skew-join
splitting, Arrow for the Pandas-UDF paths, UTC session timezone for
deterministic timestamp semantics vs the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "feature_store_spark", shuffle_partitions: int | None = None) -> SparkSession:
    # activate the vendored protobuf fallback BEFORE the JVM launches:
    # transformWithStateInPandas state clients need google.protobuf in
    # the PYTHON WORKERS, which inherit PYTHONPATH through the JVM
    # (vendor/__init__.py; no-op when real protobuf is installed)
    from .vendor import ensure_protobuf

    ensure_protobuf()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
