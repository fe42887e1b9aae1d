"""TPC-H fixed-cost amortization probe (verdict r9 item 2): measure all
22 TPC-H queries on Spark AND their oracle SQLs on DuckDB at a given
sf_dir, same protocol as bench.py (cold cache per run, median of 3
after 1 warmup), and print per-query + total ratios.

The question on record: the sf0.1 Spark/DuckDB ratio (~10x) is claimed
to be per-query fixed cost (scan setup + whole-stage codegen) that
AMORTIZES with scale.  Running the identical query set at sf1 (10x the
rows, multi-file tables with real split parallelism) turns that claim
into a measurement.

Usage: python tools/tpch_scale_probe.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
from lingo_db_spark.queries import load_all
from lingo_db_spark.session import build_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else None
WARMUP, RUNS = 1, 3


def main():
    registry = load_all()
    names = [f"tpch_q{i}" for i in range(1, 23)]
    spark = build_session("tpch_scale_probe")
    # JIT warm phase: one pass over the whole set before any measurement.
    # With a cold JVM the first measured queries pay multi-second
    # C2-compilation tails that the per-query warmup run does not drain
    # (measured at sf10: q1 "median" 10.4 s cold-session vs 2.5 s steady
    # state), which would misattribute JIT cost to whichever queries run
    # first.
    for name in names:
        registry[name].spark_fn(spark, SF_DIR).collect()
        spark.catalog.clearCache()
    spark_t: dict[str, float] = {}
    steal: dict[str, float] = {}
    for name in names:
        samples = []
        w0, s0 = time.perf_counter(), bench._steal_sec()
        for i in range(WARMUP + RUNS):
            t0 = time.perf_counter()
            n = len(registry[name].spark_fn(spark, SF_DIR).collect())
            el = time.perf_counter() - t0
            if i >= WARMUP:
                samples.append(el)
            spark.catalog.clearCache()
        # hypervisor steal per query window (bench.py's protocol): a
        # noisy session self-convicts in the artifact instead of
        # reading as an engine regression.
        steal[name] = round((bench._steal_sec() - s0)
                            / max(1e-6, time.perf_counter() - w0), 3)
        spark_t[name] = round(statistics.median(samples), 4)
        print(f"spark  {name}: {spark_t[name]:7.3f} s ({n} rows, "
              f"steal_cores {steal[name]})", flush=True)
    duck_t = bench.run_duckdb_ref(names, SF_DIR, WARMUP, RUNS)
    total_s, total_d = sum(spark_t.values()), sum(duck_t.values())
    print(f"\n{'query':10s} {'spark':>8s} {'duckdb':>8s} {'ratio':>7s}")
    for name in names:
        d = duck_t.get(name, float('nan'))
        print(f"{name:10s} {spark_t[name]:8.3f} {d:8.3f} "
              f"{spark_t[name]/d:7.2f}" if d else f"{name}: no duck ref")
    print(f"{'TOTAL':10s} {total_s:8.3f} {total_d:8.3f} "
          f"{total_s/total_d:7.2f}")
    payload = {"sf_dir": SF_DIR, "warmup": WARMUP, "runs": RUNS,
               "spark": spark_t, "duckdb": duck_t,
               "steal_cores": steal,
               "spark_total": round(total_s, 3),
               "duckdb_total": round(total_d, 3),
               "ratio_total": round(total_s / total_d, 2)}
    if OUT:
        Path(OUT).write_text(json.dumps(payload, indent=1))
        print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
