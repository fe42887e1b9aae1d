"""Measure the ANN family at corpus scale, build/query split: brute
force vs PQ vs IVF-PQ (vs IVF, LSH) on a k-replica blow-up of the sf0.1
embeddings table.

What the probe is for: the PQ operators' 100-TB claim is that the
QUERY-path candidate scan reads m-byte codes instead of float vectors
(pq_topk) and only inside probed cells (ivfpq_topk), with the index
built ONCE and amortized over every query batch.  A one-shot timing of
`pq_topk(emb, ...)` conflates the corpus encode (the build) with the
scan (the query) — this probe separates them: `ivfpq_build` writes the
(id, cell, pq_codes) index to parquet PARTITIONED BY cell, and the
query phase runs against the read-back index, so the measured wall is
what a deployment pays per query batch and the on-disk index size vs
the raw embedding parquet is the compression claim made concrete.

Corpus construction (tools/make_scaled_data.py replica semantics):
vec_id strided per replica, first coordinate jittered by 0.003 * r —
every base vector becomes a k-cluster.  To keep recall non-trivial, the
5 query vectors' ENTIRE replica families are excluded from the base
corpus (otherwise every method trivially returns the query's own
jittered copies): the true top-10 are earned neighbors from other
clusters.

Prints one JSON line:
  {"k":.., "n_vectors":.., "index_build_s":.., "index_bytes":..,
   "raw_bytes":.., "brute_s":.., "pq_s":.., "ivfpq_s":.., "ivf_s":..,
   "lsh_s":.., "recall": {...},
   "ivfpq_scanned_pairs":.., "all_pairs":..}
(every approximate method is timed index-amortized against its prebuilt
parquet index; brute_s is the exact full scan.)

Usage: python tools/ann_scale_probe.py [k]   (default 500)
Env:   BASE_DIR (default /root/testdata/sf0.1), PROBE_RUNS (default 2),
       OUT_DIR (default /root/repo/.scaledata)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from pyspark.sql import functions as F

import lingo_db_spark.operators as ops
from bench import _steal_sec
from lingo_db_spark.catalog import load_table
from lingo_db_spark.session import build_session

STRIDE = 1_000_000


def _tree_bytes(path: str) -> int:
    return sum(f.stat().st_size for f in Path(path).rglob("*")
               if f.is_file())


def build_scaled_embeddings(spark, base_dir: str, k: int, out: str) -> None:
    emb = load_table(spark, base_dir, "embeddings")
    rep = spark.range(k).withColumnRenamed("id", "__r")
    scaled = (emb.crossJoin(F.broadcast(rep))
              .withColumn("vec_id",
                          F.col("vec_id") + F.col("__r") * F.lit(STRIDE))
              .withColumn("embedding", F.concat(
                  F.array(F.col("embedding").getItem(0)
                          + F.col("__r").cast("double") * F.lit(0.003)),
                  F.slice("embedding", 2, 10_000)).cast("array<float>"))
              .drop("__r"))
    scaled.repartition(32).write.mode("overwrite").parquet(out)


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    base_dir = os.environ.get("BASE_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("PROBE_RUNS", "2"))
    out_dir = os.environ.get("OUT_DIR", "/root/repo/.scaledata")
    emb_path = os.path.join(out_dir, f"ann_emb_x{k}.parquet")
    idx_path = os.path.join(out_dir, f"ann_ivfpq_x{k}.parquet")

    spark = build_session("ann_scale_probe")
    if not os.path.exists(emb_path):
        os.makedirs(out_dir, exist_ok=True)
        build_scaled_embeddings(spark, base_dir, k, emb_path)

    emb = spark.read.parquet(emb_path)
    # Queries: the 5 original vectors; their whole replica families leave
    # the base corpus so the true top-10 are earned cross-cluster
    # neighbors, not the query's own jittered copies.
    base = emb.filter(F.col("vec_id") % STRIDE >= 5)
    n = base.count()
    qs = (emb.filter(F.col("vec_id") < 5)
          .select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_vec")))
    kk = 10
    # IVF cell count scaled so mean cell size stays ~4k vectors: the
    # knob a deployment would turn with corpus growth.
    n_cells = max(16, min(256, n // 4096))
    n_probe = max(6, n_cells * 3 // 8)
    # The deployment turns rerank up with corpus size: the re-rank join
    # stays rerank x n_queries rows, trivially cheap next to the scan.
    rerank = max(64, min(1024, n // 500))

    # ---- build phase: train + encode once, index at rest on parquet ----
    # Training sample scales with the cell count (>= 64 samples/cell, the
    # deployment sizing rule) — still O(1) vs the corpus.  The PQ index
    # is built separately: ivfpq codes are RESIDUALS and are garbage
    # under pq_topk's direction LUTs.
    train_n = max(2048, 64 * n_cells)
    t0 = time.perf_counter()
    cents, books, codes = ops.ivfpq_build(
        emb=base, dim=64, n_cells=n_cells, m=16, n_codes=32,
        train_sample=train_n)
    (codes.write.mode("overwrite").partitionBy("cell").parquet(idx_path))
    build_s = time.perf_counter() - t0
    codes_at_rest = spark.read.parquet(idx_path)
    ivfpq_index = (cents, books, codes_at_rest)
    pq_books, pq_codes = ops.pq_encode(base, dim=64, m=16, n_codes=32,
                                       train_sample=train_n)
    pq_path = idx_path.replace("ann_ivfpq", "ann_pq")
    pq_codes.write.mode("overwrite").parquet(pq_path)
    pq_index = (pq_books, spark.read.parquet(pq_path))
    ivf_cents, ivf_base = ops.ivf_build(base, dim=64, n_cells=n_cells,
                                        train_sample=train_n)
    ivf_path = idx_path.replace("ann_ivfpq", "ann_ivf")
    ivf_base.write.mode("overwrite").partitionBy("cell").parquet(ivf_path)
    ivf_index = (ivf_cents, spark.read.parquet(ivf_path))
    lsh_path = idx_path.replace("ann_ivfpq", "ann_lsh")
    lsh_params, lsh_buckets_df = ops.lsh_build(
        base.select("vec_id", "embedding"), dim=64,
        n_planes=4, n_tables=16)
    lsh_buckets_df.write.mode("overwrite").parquet(lsh_path)
    # geometry travels with the index (r10 advice): lsh_topk validates
    # it against the query-side knobs and raises on mismatch
    lsh_index = (lsh_params, spark.read.parquet(lsh_path))

    methods = {
        "brute": lambda: ops.brute_force_topk(base, qs, k=kk),
        "pq": lambda: ops.pq_topk(base, qs, k=kk, dim=64, m=16,
                                  n_codes=32, rerank=rerank, index=pq_index),
        "ivfpq": lambda: ops.ivfpq_topk(base, qs, k=kk, dim=64,
                                        n_cells=n_cells, n_probe=n_probe,
                                        m=16, n_codes=32, rerank=rerank,
                                        index=ivfpq_index),
        "ivf": lambda: ops.ivf_topk(base, qs, k=kk, dim=64,
                                    n_cells=n_cells, n_probe=n_probe,
                                    index=ivf_index),
        "lsh": lambda: ops.lsh_topk(base, qs, k=kk, dim=64,
                                    n_planes=4, n_tables=16,
                                    index=lsh_index),
    }

    # Untimed JIT/codegen warm pass PER METHOD (r10 advice: the plan
    # shapes are distinct — window+matmul UDF, probe joins, bucket
    # equi-join — so warming one method does not drain another's
    # codegen/C2 tail; measured protocol as bench.py).
    for fn in methods.values():
        fn().collect()

    results: dict[str, list] = {}
    times: dict[str, float] = {}
    steal: dict[str, float] = {}
    for name, fn in methods.items():
        walls = []
        rows = None
        w0, s0 = time.perf_counter(), _steal_sec()
        for _ in range(runs):
            t0 = time.perf_counter()
            rows = fn().collect()
            walls.append(time.perf_counter() - t0)
        # hypervisor steal per method window: noisy sessions
        # self-convict in the JSON (bench.py's protocol)
        steal[name] = round((_steal_sec() - s0)
                            / max(1e-6, time.perf_counter() - w0), 3)
        times[name] = round(statistics.median(walls), 3)
        results[name] = rows

    truth: dict = {}
    for r in results["brute"]:
        truth.setdefault(r.q_id, set()).add(r.vec_id)
    recall = {}
    for name in ("pq", "ivfpq", "ivf", "lsh"):
        hits = sum(1 for r in results[name]
                   if r.vec_id in truth.get(r.q_id, set()))
        recall[name] = round(hits / (len(truth) * kk), 3)

    # Pruning proof: pairs actually ADC-scanned by ivfpq vs all pairs,
    # from the index's own cell sizes and the probe routing.
    qrows = qs.collect()
    Q = np.stack([np.asarray(r[1], dtype=float) for r in qrows])
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qscore = Qn @ cents.T - 0.5 * (cents * cents).sum(axis=1)
    probe_cells = np.argsort(-qscore, axis=1)[:, :n_probe]
    sizes = {r.cell: r["count"]
             for r in codes_at_rest.groupBy("cell").count().collect()}
    scanned = int(sum(sizes.get(int(c), 0)
                      for qi in range(len(qrows))
                      for c in probe_cells[qi]))

    print(json.dumps({
        "k": k, "n_vectors": n, "n_cells": n_cells, "n_probe": n_probe,
        "index_build_s": round(build_s, 3),
        "index_bytes": _tree_bytes(idx_path),
        "raw_bytes": _tree_bytes(emb_path),
        **{f"{m}_s": times[m] for m in methods},
        "steal_cores": steal,
        "recall": recall,
        "ivfpq_scanned_pairs": scanned,
        "all_pairs": n * len(qrows),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
