"""Capture .explain("formatted") for bench headline queries into
plans/r14/<query>_<tag>.txt — the optimization round's plan evidence.

Usage: python tools/capture_plans.py <tag> [query ...]
       (default queries: the bench headline set)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lingo_db_spark.queries import load_all
from lingo_db_spark.session import build_session


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r14"
    out_dir.mkdir(parents=True, exist_ok=True)

    registry = load_all()
    if len(sys.argv) > 2:
        names = sys.argv[2:]
    else:
        import bench
        names = ([n for n in sorted(registry) if n.startswith("tpch_")]
                 + bench.HEADLINE_EXTRA)
    spark = build_session("capture_plans")
    for name in names:
        spec = registry.get(name)
        if spec is None:
            print(f"skip unregistered {name}", file=sys.stderr)
            continue
        try:
            df = spec.spark_fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}\n"
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"captured {name} ({len(plan)} chars)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
