"""Scale probe: measure headline-query wall time at sf0.1 vs a k-times
scaled copy (tools/make_scaled_data.py) and report the growth ratio.

On a fixed-size machine a scale-safe plan grows ~linearly in input size
(ratio ~k, minus fixed overhead amortization); a quadratic candidate
generator or a forced broadcast of a scaling table shows up immediately
as ratio >> k.  Near-dup queries are EXPECTED to exceed k here because
the scaled corpus has duplicate classes of size k (output pairs grow
~k*(k-1)/2 per class — a property of the data, not the plan; the probe
prints output rows so that effect is visible).

Prints one JSON line: {"k": .., "queries": {name: {"base_s": ..,
"scaled_s": .., "ratio": .., "base_rows": .., "scaled_rows": ..}}}

Usage: python tools/scale_probe.py [query ...]
Env:   SCALE_DIR (default /root/repo/.scaledata/sf1), BASE_DIR, PROBE_RUNS,
       PROBE_COUNT=1 to measure via df.count() instead of collect() —
       for pair-output queries whose 100x result (tens of millions of
       rows) would make driver transfer, not the plan, the thing being
       timed.  Applied to BOTH sides so ratios stay comparable.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lingo_db_spark.queries import load_all
from lingo_db_spark.session import build_session

DEFAULT_QUERIES = [
    "tpch_q1", "tpch_q3", "tpch_q7", "tpch_q18",
    "pipeline_dedup_exact", "pipeline_minhash_neardup",
    "pipeline_embed_neardup", "text_quality_stats",
    "ann_topk_lsh", "events_window_hourly",
]


def main() -> int:
    base_dir = os.environ.get("BASE_DIR", "/root/testdata/sf0.1")
    scale_dir = os.environ.get("SCALE_DIR", "/root/repo/.scaledata/sf1")
    runs = int(os.environ.get("PROBE_RUNS", "3"))
    names = sys.argv[1:] or DEFAULT_QUERIES
    registry = load_all()
    # CPU-bound probe on packed small files: cap split size so scans of
    # the ~100 MB scaled tables fan out across the local cores (the
    # cluster-equivalent knob; the driver's bench keeps Spark defaults).
    spark = build_session("scale_probe", extra_confs={
        "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)})

    out: dict[str, dict] = {}
    for name in names:
        spec = registry[name]
        res: dict[str, float | int] = {}
        for label, d in (("base", base_dir), ("scaled", scale_dir)):
            use_count = os.environ.get("PROBE_COUNT") == "1"
            samples, rows = [], 0
            for i in range(1 + runs):        # 1 warmup
                t0 = time.perf_counter()
                df = spec.spark_fn(spark, d)
                rows = df.count() if use_count else len(df.collect())
                if i > 0:
                    samples.append(time.perf_counter() - t0)
            res[f"{label}_s"] = round(statistics.median(samples), 3)
            res[f"{label}_rows"] = rows
        res["ratio"] = round(res["scaled_s"] / max(res["base_s"], 1e-9), 2)
        out[name] = res
        print(f"probe: {name}: base {res['base_s']}s ({res['base_rows']} rows)"
              f" scaled {res['scaled_s']}s ({res['scaled_rows']} rows)"
              f" ratio {res['ratio']}", file=sys.stderr, flush=True)
    print(json.dumps({"k": os.environ.get("SCALE_K", "10"),
                      "base": base_dir, "scaled": scale_dir,
                      "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
