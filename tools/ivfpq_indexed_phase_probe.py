"""Phase profile of the ann_topk_ivfpq_indexed journey (r14 opt round,
guide §1: measure first).  Times each phase of the journey separately,
5 reps, in one JVM: build (sample collect + driver train + encode plan),
write (partitioned parquet), read-back, approx query (collect), brute
force (collect), invariant compose (collect).  Prints per-phase medians
and per-rep steal cores."""
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
    _ann_invariants, _index_dir, _query_vectors)
from lingo_db_spark.queries import sorted_result  # noqa: E402
from lingo_db_spark.catalog import load_table  # noqa: E402
from lingo_db_spark.operators import similarity as ops  # noqa: E402


def _steal() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session()
    reps = int(os.environ.get("REPS", "5"))
    phases: dict[str, list[float]] = {}

    def t(name: str, fn):
        t0 = time.time()
        out = fn()
        phases.setdefault(name, []).append(time.time() - t0)
        return out

    for rep in range(reps + 1):  # rep 0 = warmup, dropped
        if rep == 1:
            phases.clear()
        s0 = _steal()
        w0 = time.time()
        emb = load_table(spark, sf_dir, "embeddings")
        base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
        qs = _query_vectors(emb)
        cents, books, codes = t("build(sample+train+encodeplan)",
                                lambda: ops.ivfpq_build(
                                    base, dim=64, n_cells=16, m=16,
                                    n_codes=32))
        path = _index_dir("ldb_ivfpq_probe_") + "/ivfpq"
        t("write(partitionBy cell)",
          lambda: codes.write.mode("overwrite").partitionBy("cell")
          .parquet(path))
        idx = t("readback(read.parquet)", lambda: spark.read.parquet(path))
        out = ops.ivfpq_topk(base, qs, k=10, dim=64, n_cells=16, n_probe=6,
                             m=16, n_codes=32, rerank=64,
                             index=(cents, books, idx))
        approx = t("approx query(collect)", lambda: out.collect())
        exact_df = ops.brute_force_topk(base, qs, k=10)
        t("brute force(collect)", lambda: exact_df.collect())
        inv = sorted_result(_ann_invariants(out, exact_df, min_hits=4),
                            "q_id")
        t("full invariant(collect)", lambda: inv.collect())
        wall = time.time() - w0
        steal = (_steal() - s0) / max(wall, 1e-9)
        print(f"rep {rep}: wall {wall:.3f}s steal {steal:.2f} cores "
              f"approx_rows {len(approx)}", file=sys.stderr, flush=True)

    med = {k: round(statistics.median(v), 3) for k, v in phases.items()}
    mins = {k: round(min(v), 3) for k, v in phases.items()}
    print(json.dumps({"median": med, "min": mins}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
