"""Interleaved A/B: does overlapping the exact brute-force
materialization with the index write (guide §2.6 — submit independent
jobs from driver threads so one job's tail back-fills the other's
idle cores) cut the ann_topk_ivfpq_indexed journey's wall?

Arm A (serial, shipped): build -> write -> readback -> one collect of
the invariant frame (which computes approx + brute force + compose).

Arm B (overlap): build -> [write || persist+materialize exact] ->
readback -> collect invariants against the persisted exact; the
persisted frame is unpersisted at the end of the rep so repeat runs
never reuse cached results (the bench's repeat-run median must keep
measuring the full computation).

Row identity between arms is asserted every rep.  12 interleaved reps
(arm order alternates), medians + minima + per-rep steal cores.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lingo_db_spark.session import build_session  # noqa: E402
from lingo_db_spark.queries.pipeline_q import (  # noqa: E402
    _ann_invariants, _index_dir, _query_vectors, _write_index)
from lingo_db_spark.queries import sorted_result  # noqa: E402
from lingo_db_spark.catalog import load_table  # noqa: E402
from lingo_db_spark.operators import similarity as ops  # noqa: E402


def _steal() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session()
    reps = int(os.environ.get("REPS", "12"))

    def journey(overlap: bool):
        emb = load_table(spark, sf_dir, "embeddings")
        base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
        qs = _query_vectors(emb)
        cents, books, codes = ops.ivfpq_build(base, dim=64, n_cells=16,
                                              m=16, n_codes=32)
        path = _index_dir("ldb_ivfpq_ab_") + "/ivfpq"
        exact = ops.brute_force_topk(base, qs, k=10)
        cached = None
        if overlap:
            cached = exact.persist()
            with ThreadPoolExecutor(max_workers=2) as pool:
                fw = pool.submit(_write_index, codes, path, 16)
                fe = pool.submit(lambda: cached.count())
                fw.result(); fe.result()
            exact = cached
        else:
            _write_index(codes, path, 16)
        out = ops.ivfpq_topk(base, qs, k=10, dim=64, n_cells=16, n_probe=6,
                             m=16, n_codes=32, rerank=64,
                             index=(cents, books, spark.read.parquet(path)))
        rows = sorted_result(_ann_invariants(out, exact, min_hits=4),
                             "q_id").collect()
        if cached is not None:
            cached.unpersist(blocking=False)
        return rows

    walls = {"serial": [], "overlap": []}
    ref = None
    for rep in range(reps + 2):  # first two = warmup (one per arm)
        for arm in (("serial", "overlap") if rep % 2 == 0
                    else ("overlap", "serial")):
            s0, t0 = _steal(), time.time()
            rows = journey(arm == "overlap")
            w = time.time() - t0
            st = (_steal() - s0) / max(w, 1e-9)
            if ref is None:
                ref = rows
            assert rows == ref, f"row mismatch on arm {arm}"
            if rep >= 2:
                walls[arm].append(w)
            print(f"rep {rep} {arm}: {w:.3f}s steal {st:.2f}",
                  file=sys.stderr, flush=True)
    out = {a: {"median": round(statistics.median(v), 3),
               "min": round(min(v), 3)} for a, v in walls.items()}
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
