"""Fixed-overhead floor profiler (r15 verdict item 1).

For each named query, split the per-run wall into:
  build   — registry spark_fn() call (py4j/driver plan construction)
  collect — the action itself
and count Spark JOBS and STAGES per run via the status tracker, so the
job-scheduling / AQE-barrier share of the floor is visible.

Usage: python tools/floor_profile.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), FLOOR_RUNS=5
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lingo_db_spark.queries import load_all
from lingo_db_spark.session import build_session


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("FLOOR_RUNS", "5"))
    registry = load_all()
    spark = build_session("floor-profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in names:
        spec = registry[name]
        # warm (JIT + fixture memoization)
        for _ in range(2):
            spec.spark_fn(spark, sf_dir).collect()
            spark.catalog.clearCache()
        builds, collects, jobs_per, stages_per = [], [], [], []
        for _ in range(runs):
            j0 = tracker.getJobIdsForGroup(None)  # not reliable; use ids
            all_jobs0 = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
            n_jobs0 = len(list(all_jobs0))
            t0 = time.perf_counter()
            df = spec.spark_fn(spark, sf_dir)
            t1 = time.perf_counter()
            rows = df.collect()
            t2 = time.perf_counter()
            all_jobs1 = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
            n_jobs1 = len(list(all_jobs1))
            builds.append(t1 - t0)
            collects.append(t2 - t1)
            jobs_per.append(n_jobs1 - n_jobs0)
            spark.catalog.clearCache()
        print(f"{name}: build med {statistics.median(builds)*1000:.0f} ms, "
              f"collect med {statistics.median(collects)*1000:.0f} ms, "
              f"jobs/run {statistics.median(jobs_per):.0f} "
              f"(rows {len(rows)})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
