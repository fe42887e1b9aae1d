"""Per-operator profiling: execute a registered query (1 warm + 1
measured), then walk the EXECUTED physical plan and print every node's
SQL metrics (time, rows, build/broadcast/shuffle costs).  This is the
no-UI substitute for the SQL tab (spark.ui.enabled=false in the bench
profile) — guide §7.2.

Usage: python tools/profile_query.py <query> [runs]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lingo_db_spark.queries import load_all
from lingo_db_spark.session import build_session


def _jmap(spark, scala_map):
    return spark._jvm.scala.collection.JavaConverters.mapAsJavaMap(scala_map)


def _walk(spark, node, depth, out):
    name = node.nodeName()
    metrics = []
    try:
        for k, v in _jmap(spark, node.metrics()).items():
            val = v.value()
            if val:
                metrics.append(f"{k}={val}")
    except Exception:  # noqa: BLE001
        pass
    out.append(f"{'  ' * depth}{name}: {', '.join(metrics)}")
    # Descend into the real plan behind wrappers.
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        _walk(spark, node.executedPlan(), depth + 1, out)
        return
    if cls in ("QueryStageExec", "ShuffleQueryStageExec",
               "BroadcastQueryStageExec", "TableCacheQueryStageExec",
               "ResultQueryStageExec"):
        _walk(spark, node.plan(), depth + 1, out)
        return
    n = node.children().size()
    it = node.children().iterator()
    for _ in range(n):
        _walk(spark, it.next(), depth + 1, out)
    # InMemoryTableScan etc. hide subtrees; ignore.


def main() -> int:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = build_session("profile")
    spec = registry[name]
    # warm run (JIT + fixture memoization)
    t0 = time.perf_counter()
    spec.spark_fn(spark, sf_dir).collect()
    print(f"warm: {time.perf_counter() - t0:.3f}s", file=sys.stderr)
    spark.catalog.clearCache()
    walls = []
    for i in range(runs):
        t0 = time.perf_counter()
        df = spec.spark_fn(spark, sf_dir)
        n = len(df.collect())
        walls.append(time.perf_counter() - t0)
        print(f"run{i}: {walls[-1]:.3f}s ({n} rows)", file=sys.stderr)
        if i < runs - 1:
            spark.catalog.clearCache()
    out: list[str] = []
    _walk(spark, df._jdf.queryExecution().executedPlan(), 0, out)
    print("\n".join(out))
    print(f"\nwalls: {[round(w, 3) for w in walls]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
