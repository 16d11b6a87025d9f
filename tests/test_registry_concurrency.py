"""Multi-writer registry semantics: ``locked_update`` must not lose
updates under concurrency; plain ``put`` stays atomic (no torn reads).
No Spark needed — the registry is a driver-local metadata plane."""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor

from dbt_snowflake_feature_store_spark.registry import Registry


def test_locked_update_no_lost_updates(tmp_path):
    reg = Registry(str(tmp_path))
    reg.initialize()
    writers, per_writer = 8, 50

    def bump(_i):
        for _ in range(per_writer):
            reg.locked_update(
                "sources",
                "counter",
                lambda cur: {"n": (cur["n"] if cur else 0) + 1},
            )

    with ThreadPoolExecutor(max_workers=writers) as ex:
        list(ex.map(bump, range(writers)))

    doc = reg.get("sources", "counter")
    assert doc["n"] == writers * per_writer, "lost update under concurrency"
    assert doc["_rev"] == writers * per_writer


def test_concurrent_put_never_torn(tmp_path):
    """Concurrent last-writer-wins puts must always leave a complete,
    parseable document (tmp+rename atomicity) — readers never observe a
    partial write."""
    reg = Registry(str(tmp_path))
    reg.initialize()
    payload = {"blob": "x" * 10000}

    def write(i):
        reg.put("sources", "doc", {**payload, "writer": i})

    def read(_i):
        for _ in range(50):
            doc = reg.get("sources", "doc")
            if doc is not None:
                assert len(doc["blob"]) == 10000
                assert "writer" in doc

    with ThreadPoolExecutor(max_workers=8) as ex:
        futures = [ex.submit(write, i) for i in range(4)] + [
            ex.submit(read, i) for i in range(4)
        ]
        for f in futures:
            f.result()

    final = reg.get("sources", "doc")
    assert final["writer"] in range(4)


def test_locked_update_multiprocess(tmp_path):
    """flock serializes across PROCESSES, not just threads — spawn real
    worker processes incrementing the same document."""
    import subprocess
    import sys

    reg = Registry(str(tmp_path))
    reg.initialize()
    script = f"""
import sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from dbt_snowflake_feature_store_spark.registry import Registry
reg = Registry({str(tmp_path)!r})
for _ in range(25):
    reg.locked_update("sources", "pc",
                      lambda cur: {{"n": (cur["n"] if cur else 0) + 1}})
"""
    procs = [
        subprocess.Popen([sys.executable, "-c", script]) for _ in range(4)
    ]
    for p in procs:
        assert p.wait() == 0
    assert reg.get("sources", "pc")["n"] == 100
