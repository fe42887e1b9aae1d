"""Interleaved A/B of LDB_IDX_WRITE=direct|repart on the at-rest index
journeys (r14 opt round): arms alternate per rep in one JVM, the env
switch is read at call time inside _write_index, cache cleared after
every rep (the bench's cold-cache protocol), per-rep steal cores."""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lingo_db_spark.session import build_session  # noqa: E402
from lingo_db_spark.queries import load_all  # noqa: E402


def _steal() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or ["ann_topk_ivfpq_indexed"]
    reps = int(os.environ.get("REPS", "10"))
    registry = load_all()
    spark = build_session()
    out = {}
    for name in names:
        fn = registry[name].spark_fn
        times: dict[str, list[float]] = {"direct": [], "repart": []}
        fn(spark, sf_dir).collect()            # warmup, not timed
        spark.catalog.clearCache()
        for rep in range(reps):
            arm = "direct" if rep % 2 == 0 else "repart"
            os.environ["LDB_IDX_WRITE"] = arm
            s0, t0 = _steal(), time.time()
            fn(spark, sf_dir).collect()
            dt = time.time() - t0
            times[arm].append(dt)
            spark.catalog.clearCache()
            print(f"{name} rep {rep} {arm}: {dt:.3f}s steal "
                  f"{(_steal() - s0) / max(dt, 1e-9):.2f}",
                  file=sys.stderr, flush=True)
        os.environ.pop("LDB_IDX_WRITE", None)
        out[name] = {a: {"median": round(statistics.median(v), 3),
                         "min": round(min(v), 3)} for a, v in times.items()}
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
