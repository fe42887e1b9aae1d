"""Interleaved A/B of the at-rest index WRITE phase (r14 opt round):
arm A = codes.write.partitionBy("cell") as shipped (1 input task ->
16 serial file writers); arm B = codes.repartition(16, "cell") first
(explicit numPartitions so AQE cannot coalesce the tiny shuffle back
to one task -> ~16 parallel single-file writers).  Arms alternate per
rep in one JVM; build runs once per rep and is NOT timed.  Also
verifies both layouts read back to identical row sets."""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lingo_db_spark.session import build_session  # noqa: E402
from lingo_db_spark.queries.pipeline_q import (  # noqa: E402
    _index_dir)
from lingo_db_spark.catalog import load_table  # noqa: E402
from lingo_db_spark.operators import similarity as ops  # noqa: E402


def _steal() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session()
    reps = int(os.environ.get("REPS", "12"))
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    cents, books, codes = ops.ivfpq_build(base, dim=64, n_cells=16,
                                          m=16, n_codes=32)
    times: dict[str, list[float]] = {"serial": [], "repart16": []}
    path = _index_dir("ldb_ivfpq_wab_") + "/ivfpq"

    # row-set identity check, once
    codes.write.mode("overwrite").partitionBy("cell").parquet(path)
    a = sorted((r.vec_id, r.cell, tuple(r.pq_codes))
               for r in spark.read.parquet(path)
               .collect())
    (codes.repartition(16, "cell").write.mode("overwrite")
     .partitionBy("cell").parquet(path))
    b = sorted((r.vec_id, r.cell, tuple(r.pq_codes))
               for r in spark.read.parquet(path)
               .collect())
    assert a == b, "row sets differ between write strategies"
    print(f"row-set identity OK ({len(a)} rows)", file=sys.stderr)

    for rep in range(reps):
        for arm in (("serial", codes) if rep % 2 == 0
                    else ("repart16", codes.repartition(16, "cell")),):
            pass
        arm_name = "serial" if rep % 2 == 0 else "repart16"
        frame = codes if arm_name == "serial" else codes.repartition(
            16, "cell")
        s0, t0 = _steal(), time.time()
        frame.write.mode("overwrite").partitionBy("cell").parquet(path)
        dt = time.time() - t0
        times[arm_name].append(dt)
        print(f"rep {rep} {arm_name}: {dt:.3f}s steal "
              f"{(_steal() - s0) / max(dt, 1e-9):.2f}", file=sys.stderr,
              flush=True)

    out = {arm: {"median": round(statistics.median(v), 3),
                 "min": round(min(v), 3), "n": len(v)}
           for arm, v in times.items()}
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
