"""Interleaved A/B of LDB_ANN_BUILD_FUSE=split|fused (r14 opt round,
continuation 3): the fused arm collapses the non-indexed ANN paths'
index-build pass (cell assign / PQ encode / LSH bucketize), the
query-attach joins, and (lsh) the candidate dropDuplicates exchange
into the scoring kernel, so each corpus vector crosses the Python
boundary ONCE.  Arms alternate per rep in one JVM (env read at call
time), cache cleared after every rep, per-rep steal cores, and a
row-identity assert between the arms for every probed query."""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lingo_db_spark.session import build_session  # noqa: E402
from lingo_db_spark.queries import load_all  # noqa: E402

QUERIES = ["ann_topk_lsh", "ann_topk_ivf", "ann_topk_ivfpq"]


def _steal() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "10"))
    registry = load_all()
    spark = build_session()

    for q in QUERIES:
        fn = registry[q].spark_fn
        os.environ["LDB_ANN_BUILD_FUSE"] = "split"
        rows_s = sorted(map(tuple, fn(spark, sf_dir).collect()))
        os.environ["LDB_ANN_BUILD_FUSE"] = "fused"
        rows_f = sorted(map(tuple, fn(spark, sf_dir).collect()))
        assert rows_s == rows_f and rows_f, f"{q}: arms differ"
        print(f"{q}: row identity OK ({len(rows_f)} rows)",
              file=sys.stderr)
        spark.catalog.clearCache()

    out: dict[str, dict] = {}
    for q in QUERIES:
        fn = registry[q].spark_fn
        times: dict[str, list[float]] = {"split": [], "fused": []}
        for rep in range(reps):
            arm = "split" if rep % 2 == 0 else "fused"
            os.environ["LDB_ANN_BUILD_FUSE"] = arm
            s0, t0 = _steal(), time.time()
            fn(spark, sf_dir).collect()
            dt = time.time() - t0
            times[arm].append(dt)
            spark.catalog.clearCache()
            print(f"{q} rep {rep} {arm}: {dt:.3f}s steal "
                  f"{(_steal() - s0) / max(dt, 1e-9):.2f}",
                  file=sys.stderr, flush=True)
        out[q] = {a: {"median": round(statistics.median(v), 3),
                      "min": round(min(v), 3)}
                  for a, v in times.items()}
    os.environ.pop("LDB_ANN_BUILD_FUSE", None)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
