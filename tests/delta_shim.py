"""Test-only shim that lets the REAL ``storage.DeltaFormat`` code run in a
container without delta-spark.

Two pieces, both plain test infrastructure (never shipped in the engine):

1. Fake ``delta`` / ``delta.tables`` modules injected into ``sys.modules``.
   ``FakeDeltaTable`` implements the exact builder surface
   ``DeltaFormat.merge`` drives — ``isDeltaTable`` / ``forPath`` /
   ``alias`` / ``merge`` / ``whenMatchedUpdateAll`` /
   ``whenNotMatchedInsertAll`` / ``execute`` — with upsert semantics
   (matched rows replaced, unmatched inserted), the contract Delta's real
   MERGE INTO provides (reference macros/materializations/
   feature_view.sql:101-129 relies on the same upsert contract via
   Dynamic Tables).
2. A reader/writer patch that maps ``.format("delta")`` to parquet, so
   DeltaFormat's Spark calls execute against a datasource this JVM has.

With the shim active, every DeltaFormat method body (storage.py) runs
verbatim — nothing in the engine module is stubbed or edited.
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import types
import uuid


class _FakeMergeBuilder:
    def __init__(self, table, updates, cond: str):
        self._table = table
        self._updates = updates
        self._cond = cond
        self._matched_update = False
        self._unmatched_insert = False

    def whenMatchedUpdateAll(self):
        self._matched_update = True
        return self

    def whenNotMatchedInsertAll(self):
        self._unmatched_insert = True
        return self

    def execute(self) -> None:
        import functools

        from pyspark.sql import functions as F

        spark, path = self._table._spark, self._table._path
        # DeltaFormat builds the condition as "t.<k> <=> u.<k> AND ..."
        keys = re.findall(r"t\.(\w+)\s*<=>", self._cond)
        assert keys, f"unrecognized merge condition: {self._cond}"
        target = spark.read.parquet(path)
        updates = self._updates.select(*target.columns)

        def _ns_join(left, right, how):
            # honor the <=> in the parsed condition: NULL keys match
            l, r = left.alias("__l"), right.alias("__r")
            cond = functools.reduce(
                lambda a, b: a & b,
                [
                    F.col(f"__l.{k}").eqNullSafe(F.col(f"__r.{k}"))
                    for k in keys
                ],
            )
            return l.join(r, cond, how)

        u_keys = updates.select(*keys).distinct()
        t_keys = target.select(*keys).distinct()
        pieces = []
        if self._matched_update:
            pieces = [
                _ns_join(target, u_keys, "left_anti"),
                _ns_join(updates, t_keys, "left_semi"),
            ]
        else:
            pieces = [target]
        if self._unmatched_insert:
            pieces.append(_ns_join(updates, t_keys, "left_anti"))
        merged = pieces[0]
        for p in pieces[1:]:
            merged = merged.unionByName(p)
        # materialize before overwriting the dir we read from
        tmp = f"{path}__shimmerge_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(path)
        os.rename(tmp, path)


class FakeDeltaTable:
    def __init__(self, spark, path: str):
        self._spark = spark
        self._path = path

    @staticmethod
    def isDeltaTable(spark, path: str) -> bool:
        return os.path.isdir(path)

    @classmethod
    def forPath(cls, spark, path: str) -> "FakeDeltaTable":
        return cls(spark, path)

    def alias(self, _name: str) -> "FakeDeltaTable":
        return self

    def merge(self, updates, cond: str) -> _FakeMergeBuilder:
        # DataFrame.alias was applied by the caller; the underlying df is fine
        return _FakeMergeBuilder(self, updates, cond)


def install(monkeypatch) -> None:
    """Activate the shim for one test via pytest's monkeypatch fixture."""
    delta_mod = types.ModuleType("delta")
    tables_mod = types.ModuleType("delta.tables")
    tables_mod.DeltaTable = FakeDeltaTable
    delta_mod.tables = tables_mod
    monkeypatch.setitem(sys.modules, "delta", delta_mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables_mod)

    from pyspark.sql.readwriter import DataFrameReader, DataFrameWriter

    orig_r, orig_w = DataFrameReader.format, DataFrameWriter.format

    def r_format(self, source):
        return orig_r(self, "parquet" if source == "delta" else source)

    def w_format(self, source):
        return orig_w(self, "parquet" if source == "delta" else source)

    monkeypatch.setattr(DataFrameReader, "format", r_format)
    monkeypatch.setattr(DataFrameWriter, "format", w_format)
