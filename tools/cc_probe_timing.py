"""Timing + job-count probe for pipeline_neardup_clusters /
pipeline_minhash_neardup (r14 opt round): N reps in one JVM, per-rep
wall, Spark job count (statusTracker job-id delta — the structural
evidence for driver-round-trip changes), and steal cores."""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lingo_db_spark.session import build_session  # noqa: E402
from lingo_db_spark.queries import REGISTRY  # noqa: E402
import lingo_db_spark.queries.pipeline_q  # noqa: E402,F401


def _steal() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or ["pipeline_neardup_clusters"]
    reps = int(os.environ.get("REPS", "5"))
    spark = build_session()
    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in names:
        fn = REGISTRY[name].spark_fn
        walls = []
        for rep in range(reps + 1):
            j0 = set(tracker.getJobIdsForGroup(None) or []) | set(
                tracker.getActiveJobsIds() or [])
            n0 = max([-1] + list(j0))
            s0, t0 = _steal(), time.time()
            rows = fn(spark, sf_dir).collect()
            dt = time.time() - t0
            j1 = set(tracker.getJobIdsForGroup(None) or []) | set(
                tracker.getActiveJobsIds() or [])
            n1 = max([-1] + list(j1))
            if rep:  # rep 0 warmup
                walls.append(dt)
            print(f"{name} rep {rep}: {dt:.3f}s jobs {n1 - n0} "
                  f"rows {len(rows)} steal "
                  f"{(_steal() - s0) / max(dt, 1e-9):.2f}",
                  file=sys.stderr, flush=True)
        out[name] = {"median": round(statistics.median(walls), 3),
                     "min": round(min(walls), 3)}
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
