"""Interleaved A/B of LDB_ANN_ENC_DEDUP=off|nondet (r14 opt round,
continuation 2): the IVF cell-assign and IVF-PQ residual-encode UDFs
were duplicated by Catalyst pushdown (two full-corpus ArrowEvalPython
passes — guide §4.4); the nondet arm marks them nondeterministic so the
corpus is encoded once.  Arms alternate per rep in one JVM (env read at
call time inside ivf_append/ivfpq_append), cache cleared after every
rep, per-rep steal cores, and a row-identity assert between the arms
for every touched query."""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lingo_db_spark.session import build_session  # noqa: E402
from lingo_db_spark.queries import load_all  # noqa: E402

QUERIES = ["ann_topk_ivf", "ann_topk_ivfpq", "ann_topk_ivfpq_indexed"]


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
        os.environ["LDB_ANN_ENC_DEDUP"] = "off"
        rows_off = sorted(map(tuple, fn(spark, sf_dir).collect()))
        os.environ["LDB_ANN_ENC_DEDUP"] = "nondet"
        rows_on = sorted(map(tuple, fn(spark, sf_dir).collect()))
        assert rows_off == rows_on and rows_on, f"{q}: arms differ"
        print(f"{q}: row identity OK ({len(rows_on)} rows)",
              file=sys.stderr)
        spark.catalog.clearCache()

    out: dict[str, dict] = {}
    for q in QUERIES:
        fn = registry[q].spark_fn
        times: dict[str, list[float]] = {"off": [], "nondet": []}
        for rep in range(reps):
            arm = "off" if rep % 2 == 0 else "nondet"
            os.environ["LDB_ANN_ENC_DEDUP"] = arm
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
    os.environ.pop("LDB_ANN_ENC_DEDUP", None)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
