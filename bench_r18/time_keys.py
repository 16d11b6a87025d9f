#!/usr/bin/env python
"""Per-key isolated timing harness for r18 optimization work: same
methodology as bench.py (noop sink, AQE on, adaptive min-of-3..5) over
an explicit key list. Usage: python bench_r18/time_keys.py q_a q_b ..."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    keys = sys.argv[1:]
    from dbt_snowflake_feature_store_spark.session import get_spark

    os.environ["SPARK_GRAFT_CPUS"] = CPUS
    spark = get_spark("time-keys")
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    control = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "avg(xxhash64(cast(id as string), 'a')) as h1",
            "avg(xxhash64(id * 1000003, 'b')) as h2",
            "avg(sin(id % 1000)) as s",
        ).write.format("noop").mode("overwrite").save()
        control = min(control, time.perf_counter() - t0)
    out = {"control": round(control, 3)}
    for key in keys:
        fn = queries[key]
        best = float("inf")
        for it in range(5):
            spark.sparkContext.setJobDescription(f"{key} run {it}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            improved = t < best * 0.9
            best = min(best, t)
            if it >= 2 and not improved:
                break
        out[key] = round(best, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
