"""cluster_by sorted-file layout: managed FV materializations sort rows
by the cluster keys within each written file, so parquet row-group
min/max stats are tight and key-predicate scans skip row groups."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from dbt_snowflake_feature_store_spark import Entity, FeatureView, RefreshSpec
from dbt_snowflake_feature_store_spark.sources import read_table

SF = "/root/testdata/sf0.001"


def _data_files(root):
    return [
        p
        for p in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
        if "_fs_snapshots" not in p
    ]


def _file_is_sorted(path, col):
    t = pq.read_table(path, columns=[col])
    vals = t.column(col).to_pylist()
    return vals == sorted(vals)


def _rowgroup_stats_tight(path, col):
    """Row-group min/max ranges must be non-overlapping (sorted file)."""
    f = pq.ParquetFile(path)
    idx = f.schema_arrow.get_field_index(col)
    prev_max = None
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        if st is None:
            return True  # no stats written — nothing to assert
        if prev_max is not None and st.min < prev_max:
            return False
        prev_max = st.max
    return True


@pytest.fixture()
def clustered_fv(fs, spark):
    read_table(spark, SF, "events").createOrReplaceTempView("cb_events")
    fs.register_entity(Entity("user", ["user_id"]))
    fv = FeatureView(
        "clustered",
        ["user"],
        sql="SELECT user_id, ts, value AS f_value FROM cb_events",
        timestamp_col="ts",
        refresh=RefreshSpec("1 hour", "FULL", "ON_CREATE"),
        cluster_by=["user_id"],
    )
    fs.register_feature_view(fv, version="1.0")
    return fs


def test_files_sorted_by_cluster_key(clustered_fv):
    fs = clustered_fv
    path = fs._fv_data_path("clustered", "1.0")
    files = _data_files(path)
    assert files
    for f in files:
        assert _file_is_sorted(f, "user_id"), f
        assert _rowgroup_stats_tight(f, "user_id"), f


def test_cluster_by_round_trips_through_registry(clustered_fv, spark, tmp_path):
    fs = clustered_fv
    from dbt_snowflake_feature_store_spark import FeatureStore

    fs2 = FeatureStore(spark, fs.root, name=fs.name)
    assert fs2.get_feature_view("clustered", "1.0").cluster_by == ["user_id"]


def test_values_unchanged_and_compact_restores_sort(clustered_fv, spark):
    fs = clustered_fv
    before = sorted(
        map(tuple, fs.read_feature_view("CLUSTERED$1.0").collect())
    )
    n_files = fs.compact("clustered", "1.0")
    assert n_files >= 1
    after = sorted(map(tuple, fs.read_feature_view("CLUSTERED$1.0").collect()))
    assert before == after
    path = fs._fv_data_path("clustered", "1.0")
    for f in _data_files(path):
        assert _file_is_sorted(f, "user_id"), f


def test_backfill_keeps_cluster_sort(fs, spark):
    """Backfilled chunks preserve the sorted-file layout."""
    read_table(spark, SF, "events").createOrReplaceTempView("cb_bf_events")
    fs.register_entity(Entity("bfuser", ["user_id"]))
    fv = FeatureView(
        "clustered_bf",
        ["bfuser"],
        sql="SELECT user_id, ts, value AS f_value FROM cb_bf_events",
        timestamp_col="ts",
        refresh=RefreshSpec("1 hour", "FULL", "ON_SCHEDULE"),
        cluster_by=["user_id"],
    )
    fs.register_feature_view(fv, version="1.0")
    done = fs.backfill("clustered_bf", "1.0", "2024-01-01", "2024-01-04",
                       step_days=1)
    assert len(done) == 3
    path = fs._fv_data_path("clustered_bf", "1.0")
    files = _data_files(path)
    assert files
    for f in files:
        assert _file_is_sorted(f, "user_id"), f


def test_zorder_layout_skips_on_both_columns(spark, tmp_path):
    """Z-order vs lexicographic two-column sort: after sorting 20k rows
    into 8 files, EVERY file's row-group stats must be tight on BOTH
    dimensions under z-order (each file covers a small rectangle), while
    the lexicographic sort is tight only on its leading column. That
    tightness is exactly what lets parquet min/max pruning skip files
    for predicates on either column."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from dbt_snowflake_feature_store_spark.functions.features import (
        zorder_value,
    )

    n, side = 1 << 14, 1 << 7  # 128x128 grid, one row per cell
    base = spark.range(n).select(
        (F.col("id") % side).alias("a"),
        (F.col("id") / side).cast("long").alias("b"),
    )

    def span_fraction(path, col):
        """mean over files of (file's min-max span / full domain)."""
        import glob
        spans = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min); maxs.append(st.max)
            spans.append((max(maxs) - min(mins) + 1) / side)
        return sum(spans) / len(spans)

    zpath = str(tmp_path / "z")
    (
        base.withColumn("zv", zorder_value("a", "b", bits=7))
        .repartitionByRange(8, "zv")
        .sortWithinPartitions("zv")
        .write.parquet(zpath)
    )
    lexpath = str(tmp_path / "lex")
    (
        base.repartitionByRange(8, "a", "b")
        .sortWithinPartitions("a", "b")
        .write.parquet(lexpath)
    )

    # lexicographic: leading column tight, trailing column spans ~full
    assert span_fraction(lexpath, "a") < 0.3
    assert span_fraction(lexpath, "b") > 0.9
    # z-order: BOTH dimensions bounded to a fraction of the domain
    assert span_fraction(zpath, "a") < 0.6
    assert span_fraction(zpath, "b") < 0.6


def test_zorder_value_known_points(spark):
    from pyspark.sql import functions as F

    from dbt_snowflake_feature_store_spark.functions.features import (
        zorder_value,
    )

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], "a long, b long"
    ).withColumn("z", zorder_value("a", "b", bits=4))
    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    # interleave: z = sum a_i<<2i | b_i<<(2i+1)
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    assert got[(3, 5)] == 0b100111  # a=011, b=101 -> b2a2 b1a1 b0a0=10 01 11
