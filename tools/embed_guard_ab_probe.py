"""Interleaved A/B of LDB_EMBED_GUARD=agg|window on
pipeline_embed_neardup (r14 opt round): arms alternate per rep in one
JVM (env read at call time inside embed_neardup), cache cleared after
every rep (bench cold-cache protocol), per-rep steal cores, and a
row-identity assert between the arms."""
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
    reps = int(os.environ.get("REPS", "12"))
    registry = load_all()
    spark = build_session()
    fn = registry["pipeline_embed_neardup"].spark_fn

    os.environ["LDB_EMBED_GUARD"] = "agg"
    rows_agg = sorted(map(tuple, fn(spark, sf_dir).collect()))
    os.environ["LDB_EMBED_GUARD"] = "window"
    rows_win = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert rows_agg == rows_win and rows_agg, "arms differ"
    print(f"row identity OK ({len(rows_agg)} rows)", file=sys.stderr)
    spark.catalog.clearCache()

    times: dict[str, list[float]] = {"agg": [], "window": []}
    for rep in range(reps):
        arm = "agg" if rep % 2 == 0 else "window"
        os.environ["LDB_EMBED_GUARD"] = arm
        s0, t0 = _steal(), time.time()
        fn(spark, sf_dir).collect()
        dt = time.time() - t0
        times[arm].append(dt)
        spark.catalog.clearCache()
        print(f"rep {rep} {arm}: {dt:.3f}s steal "
              f"{(_steal() - s0) / max(dt, 1e-9):.2f}",
              file=sys.stderr, flush=True)
    os.environ.pop("LDB_EMBED_GUARD", None)
    print(json.dumps({a: {"median": round(statistics.median(v), 3),
                          "min": round(min(v), 3)}
                      for a, v in times.items()}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
