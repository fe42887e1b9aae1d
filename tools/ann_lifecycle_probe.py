"""Scale probe for the COMPOSED at-rest ANN maintenance lifecycle
(r14, VERDICT r13 item 6): append + delete + compact on ONE index —
the "index survives a year of churn" evidence a 100 TB deployment
needs.

The claims under test, on a ~1M-vector cell-partitioned IVF-PQ index:
1. APPEND (frozen quantizers, parquet file append): pre-existing index
   files stay byte-identical — a daily delta costs one encode pass and
   adds files, never rewrites.
2. DELETE (tombstone anti join): zero index files touched.
3. COMPACT: ONLY the cell partitions holding deleted ids are
   rewritten; every other cell's files — including files the append
   step added — stay byte-identical to their post-append state.
4. Answers are EXACT vs brute force over the live set AFTER EVERY
   step (exhaustive knobs), so maintenance never degrades results.

Byte-shape numbers reproduce exactly; walls are page-cache-warm
non-claims (the repo's standing measurement posture).

Prints one JSON line:
  {"k":.., "n_initial":.., "n_appended":.., "n_deleted":..,
   "n_cells":.., "append_added_bytes":.., "append_rewrote_files":0,
   "delete_rewrote_files":0, "touched_cells":.., "bytes_total":..,
   "compact_rewritten_bytes":.., "compact_rewrite_fraction":..,
   "exact_all_steps":true, "append_s":.., "compact_s":.., "steal_s":..}

Usage: python tools/ann_lifecycle_probe.py [k]      (default 500)
Env:   OUT_DIR (default /root/repo/.scaledata), BASE_DIR
       (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import lingo_db_spark.operators as ops
from bench import _steal_sec
from lingo_db_spark.session import build_session
from tools.ann_scale_probe import STRIDE, build_scaled_embeddings


def _digests(path: str) -> dict[str, str]:
    """{relpath: sha256} over the index tree's parquet files."""
    out: dict[str, str] = {}
    for f in Path(path).rglob("*.parquet"):
        if f.is_file():
            out[str(f.relative_to(path))] = hashlib.sha256(
                f.read_bytes()).hexdigest()
    return out


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    base_dir = os.environ.get("BASE_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get("OUT_DIR", "/root/repo/.scaledata")
    emb_path = os.path.join(out_dir, f"ann_emb_x{k}.parquet")
    spark = build_session("ann_lifecycle_probe")
    steal0 = _steal_sec()
    if not os.path.exists(emb_path):
        os.makedirs(out_dir, exist_ok=True)
        build_scaled_embeddings(spark, base_dir, k, emb_path)

    emb = spark.read.parquet(emb_path)
    corpus = emb.filter(F.col("vec_id") % STRIDE >= 5)
    qs = (emb.filter(F.col("vec_id") < 5)
          .select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_vec")))
    # 90/10 split: the 10% is the churn delta a deployment appends
    initial = corpus.filter(F.col("vec_id") % 10 != 0)
    delta = corpus.filter(F.col("vec_id") % 10 == 0)
    n_initial, n_delta = initial.count(), delta.count()
    n = n_initial + n_delta
    # same deployment sizing rules as ann_scale_probe (knobs scale
    # with n — the replication caveat in SCALE.md)
    n_cells = max(16, min(256, n // 4096))
    train_n = max(2048, 64 * n_cells)

    cents, books, codes = ops.ivfpq_build(
        emb=initial, dim=64, n_cells=n_cells, m=16, n_codes=32,
        train_sample=train_n)
    work = tempfile.mkdtemp(prefix="ldb_lifecycle_") + "/ivfpq"
    codes.write.mode("overwrite").partitionBy("cell").parquet(work)

    def _exact(live_codes, remainder) -> bool:
        """Exhaustive-knob top-10 == brute force over the live set."""
        brute = [(r.q_id, r.vec_id) for r in
                 ops.brute_force_topk(remainder, qs, k=10)
                 .orderBy("q_id", "rank").collect()]
        got = [(r.q_id, r.vec_id) for r in
               ops.ivfpq_topk(corpus, qs, k=10, dim=64,
                              n_cells=n_cells, n_probe=n_cells,
                              m=16, n_codes=32, rerank=n + 1,
                              index=(cents, books, live_codes))
               .orderBy("q_id", "rank").collect()]
        return got == brute

    exact_all = _exact(spark.read.parquet(work), initial)

    # ---- APPEND ----
    built = _digests(work)
    t0 = time.perf_counter()
    ops.ivfpq_append(cents, books, delta) \
        .write.mode("append").partitionBy("cell").parquet(work)
    append_s = time.perf_counter() - t0
    post_append = _digests(work)
    append_rewrote = [f for f, d in built.items()
                      if post_append.get(f) != d]
    append_added = sum(
        (Path(work) / f).stat().st_size
        for f in set(post_append) - set(built))
    exact_all = exact_all and _exact(spark.read.parquet(work), corpus)

    # ---- DELETE (tombstones) ----
    sizes = (spark.read.parquet(work).groupBy("cell").count()
             .orderBy("count").collect())
    small, big = sizes[0], sizes[-1]
    small_ids = [r.vec_id for r in spark.read.parquet(work).filter(
        F.col("cell") == small.cell).select("vec_id").collect()]
    big_ids = [r.vec_id for r in spark.read.parquet(work).filter(
        F.col("cell") == big.cell).select("vec_id")
        .limit(max(10, big["count"] // 100)).collect()]
    del_ids = small_ids + big_ids
    deleted = spark.createDataFrame([(i,) for i in del_ids],
                                    "vec_id long")
    remainder = corpus.join(deleted, "vec_id", "left_anti")
    exact_all = exact_all and _exact(
        ops.index_delete(spark.read.parquet(work), deleted), remainder)
    delete_rewrote = [f for f, d in _digests(work).items()
                      if post_append.get(f) != d]

    # ---- COMPACT ----
    bytes_by_cell = {}
    for d in Path(work).glob("cell=*"):
        bytes_by_cell[int(d.name.split("=")[1])] = sum(
            f.stat().st_size for f in d.rglob("*") if f.is_file())
    t0 = time.perf_counter()
    touched = ops.compact_index_cells(spark, work, deleted)
    compact_s = time.perf_counter() - t0
    final = _digests(work)
    compact_rewrote_untouched = [
        f for f, d in post_append.items()
        if int(f.split("=")[1].split("/")[0]) not in touched
        and final.get(f) != d]
    assert not compact_rewrote_untouched, compact_rewrote_untouched
    left = spark.read.parquet(work)
    assert left.join(deleted, "vec_id").count() == 0
    assert left.count() == n - len(del_ids)
    exact_all = exact_all and _exact(left, remainder)

    bytes_total = sum(bytes_by_cell.values())
    rewritten = sum(bytes_by_cell[c] for c in touched)
    print(json.dumps({
        "k": k, "n_initial": n_initial, "n_appended": n_delta,
        "n_deleted": len(del_ids), "n_cells": n_cells,
        "append_added_bytes": append_added,
        "append_rewrote_files": len(append_rewrote),
        "delete_rewrote_files": len(delete_rewrote),
        "touched_cells": len(touched),
        "bytes_total": bytes_total,
        "compact_rewritten_bytes": rewritten,
        "compact_rewrite_fraction": round(rewritten / bytes_total, 5),
        "exact_all_steps": bool(exact_all),
        "append_s": round(append_s, 3),
        "compact_s": round(compact_s, 3),
        "steal_s": round(_steal_sec() - steal0, 2),
    }))
    shutil.rmtree(os.path.dirname(work), ignore_errors=True)
    return 0 if exact_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
