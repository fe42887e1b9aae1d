"""Interleaved A/B for the duplicate-cut plan inside
exact_substring_spans (LDB_SPANS_DUP):

  agg     — r13 shape: groupBy(count>1) + shuffle-hash join per cut,
            with a MEMORY_AND_DISK persist of the hashed-gram stream
            and an eager barrier to release it.
  window  — r14 candidate: each cut as a count() over a hash-partition
            window (one exchange per cut, no persist, no barrier).

Env is read at call time inside exact_substring_spans, so both arms
share one JVM; arm order alternates per rep so host steal windows hit
both symmetrically.  Timing = collect() of the registered queries.

Usage: python tools/spans_mode_ab_probe.py [sf_dir] [reps]
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
QUERIES = ["pipeline_exact_substring_spans",
           "pipeline_substring_spans_prefiltered"]


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
        q: {"agg": [], "window": []} for q in QUERIES}
    for arm in ("agg", "window"):
        os.environ["LDB_SPANS_DUP"] = arm
        for q in QUERIES:
            specs[q].spark_fn(spark, SF_DIR).collect()
    for rep in range(REPS):
        arms = ("agg", "window") if rep % 2 == 0 else ("window", "agg")
        for arm in arms:
            os.environ["LDB_SPANS_DUP"] = arm
            for q in QUERIES:
                spark.sparkContext.setJobDescription(f"{q}:{arm}:r{rep}")
                s0 = _steal_sec()
                t0 = time.perf_counter()
                specs[q].spark_fn(spark, SF_DIR).collect()
                el = time.perf_counter() - t0
                res[q][arm].append(el)
                print(f"  rep{rep} {arm:6s} {q:40s} {el:.3f}s "
                      f"steal={(_steal_sec() - s0) / el:.2f}cores",
                      flush=True)
    for q in QUERIES:
        a, w = res[q]["agg"], res[q]["window"]
        print(f"{q:40s} agg med={statistics.median(a):.3f} "
              f"min={min(a):.3f}  window med={statistics.median(w):.3f} "
              f"min={min(w):.3f}  delta_med="
              f"{(statistics.median(w) / statistics.median(a) - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
