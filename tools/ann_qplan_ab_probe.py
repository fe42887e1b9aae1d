"""Interleaved A/B for the r14 query-local ANN kernels (LDB_ANN_QPLAN).

Arms (env read at call time inside the operators, so one JVM serves
both — the only steal-noise-robust protocol on this host):
  join   — pre-change plans: broadcast cross join (bruteforce), probe
           local-relation broadcast join (ivfpq), two-join rerank.
  local  — query set as kernel closure / element_at literals.

Each rep runs every query once per arm, alternating arm order per rep
so a steal window hits both arms symmetrically.  Timing = collect(),
the bench's timed action.

Usage: python tools/ann_qplan_ab_probe.py [sf_dir] [reps]
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

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
QUERIES = ["ann_topk_bruteforce", "ann_topk_ivfpq",
           "ann_topk_ivfpq_query_only", "ann_topk_ivfpq_indexed"]


def _steal_sec() -> float:
    """Hypervisor steal CPU-seconds since boot (bench.py's probe)."""
    try:
        vals = Path("/proc/stat").read_text().splitlines()[0].split()[1:]
        return int(vals[7]) / 100.0 if len(vals) > 7 else 0.0
    except Exception:  # noqa: BLE001
        return 0.0


def main() -> None:
    specs = load_all()
    spark = build_session()
    res: dict[str, dict[str, list[float]]] = {
        q: {"join": [], "local": []} for q in QUERIES}
    # one warmup per (query, arm) first
    for arm in ("join", "local"):
        os.environ["LDB_ANN_QPLAN"] = arm
        for q in QUERIES:
            specs[q].spark_fn(spark, SF_DIR).collect()
    for rep in range(REPS):
        arms = ("join", "local") if rep % 2 == 0 else ("local", "join")
        for arm in arms:
            os.environ["LDB_ANN_QPLAN"] = arm
            for q in QUERIES:
                spark.sparkContext.setJobDescription(f"{q}:{arm}:r{rep}")
                s0 = _steal_sec()
                t0 = time.perf_counter()
                specs[q].spark_fn(spark, SF_DIR).collect()
                el = time.perf_counter() - t0
                res[q][arm].append(el)
                print(f"  rep{rep} {arm:5s} {q:34s} {el:.3f}s "
                      f"steal={(_steal_sec() - s0) / el:.2f}cores",
                      flush=True)
    for q in QUERIES:
        j, l = res[q]["join"], res[q]["local"]
        print(f"{q:34s} join med={statistics.median(j):.3f} "
              f"min={min(j):.3f}  local med={statistics.median(l):.3f} "
              f"min={min(l):.3f}  delta_med="
              f"{(statistics.median(l) / statistics.median(j) - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
