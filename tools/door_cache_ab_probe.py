"""Interleaved A/B for the r14 Connection lazy-plan caches.

Arms (one JVM, alternating order per rep — the steal-noise-robust
protocol):
  cold  — pre-change behavior: the empty-CREATE and CSV-reader plan
          caches are cleared before every call, so each run_script
          rebuilds every per-statement DataFrame.
  warm  — caches left alone (the shipped behavior after the first
          call of the process).

Timing = spark_fn + collect, the bench's timed action, over the two
verbatim bench anchors (each re-runs its suite's initialize.sql).

Usage: python tools/door_cache_ab_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lingo_db_spark import connection as conn
from lingo_db_spark.queries import load_all
from lingo_db_spark.session import build_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
QUERIES = ["sql_job_29a_verbatim", "sql_tpcds_q51_verbatim"]


def _steal_sec() -> float:
    try:
        vals = Path("/proc/stat").read_text().splitlines()[0].split()[1:]
        return int(vals[7]) / 100.0 if len(vals) > 7 else 0.0
    except Exception:  # noqa: BLE001
        return 0.0


def main() -> None:
    specs = load_all()
    spark = build_session()
    res: dict[str, dict[str, list[float]]] = {
        q: {"cold": [], "warm": []} for q in QUERIES}
    for q in QUERIES:                      # warmup (fixture export etc.)
        specs[q].spark_fn(spark, SF_DIR).collect()
    for rep in range(REPS):
        arms = ("cold", "warm") if rep % 2 == 0 else ("warm", "cold")
        for arm in arms:
            for q in QUERIES:
                if arm == "cold":
                    conn._EMPTY_DF_CACHE.clear()
                    conn._CSV_PLAN_CACHE.clear()
                spark.sparkContext.setJobDescription(f"{q}:{arm}:r{rep}")
                s0 = _steal_sec()
                t0 = time.perf_counter()
                specs[q].spark_fn(spark, SF_DIR).collect()
                el = time.perf_counter() - t0
                res[q][arm].append(el)
                print(f"  rep{rep} {arm:4s} {q:26s} {el:.3f}s "
                      f"steal={(_steal_sec() - s0) / el:.2f}cores",
                      flush=True)
    for q in QUERIES:
        c, w = res[q]["cold"], res[q]["warm"]
        print(f"{q:26s} cold med={statistics.median(c):.3f} "
              f"min={min(c):.3f}  warm med={statistics.median(w):.3f} "
              f"min={min(w):.3f}  delta_med="
              f"{(statistics.median(w) / statistics.median(c) - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
