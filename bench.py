"""Benchmark harness: times the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced with a cheap count() action (results are small
aggregates / top-k; s6_projection is count-forced to avoid collecting
600k rows through the driver). A warm-up of the session JIT happens
implicitly via the first query; per-query time is wall-clock.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG
    from usgs_earthquake_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")

    headline = [e for e in CATALOG.values() if e.headline]
    # warm-up: JVM/codegen startup + parquet footer/file-listing caches,
    # so steady-state execution is what gets timed
    spark.range(1000).count()
    for entry in headline:
        entry.spark_fn(spark, sf_dir).count()

    # best of 2 timed runs per query: suppresses one-off scheduler/GC
    # noise at sub-second scale without hiding real regressions
    timings: dict[str, float] = {}
    for _ in range(2):
        for entry in headline:
            df = entry.spark_fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.count()
            elapsed = round(time.perf_counter() - t0, 4)
            if entry.name not in timings or elapsed < timings[entry.name]:
                timings[entry.name] = elapsed

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
