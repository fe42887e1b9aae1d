"""Scale probe for the DELETE half of at-rest ANN index maintenance
(r13; operators.similarity.index_delete / compact_index_cells).

The 100 TB claim under test: deleting a handful of vectors from a
cell-partitioned IVF-PQ index costs (a) at read time, one broadcast
anti join against the tombstone set — no index file touched, cell
pruning intact — and (b) at compaction time, a rewrite of ONLY the
cell partitions that contained deleted ids, leaving every other cell's
files byte-untouched.  A 0.1% delete should rewrite ~0.1% of the index
bytes, not the index.

Method: copy the prebuilt x-replica IVF-PQ index
(tools/ann_scale_probe.py writes it cell-partitioned), tombstone every
id of the smallest cell plus a slice of the largest, then measure
bytes-rewritten / bytes-total, compaction wall, and the tombstoned
query scan vs the plain scan (count-driven, full pipeline).

Prints one JSON line:
  {"k":.., "n_vectors":.., "n_cells":.., "n_deleted":..,
   "touched_cells":.., "bytes_total":.., "bytes_rewritten":..,
   "rewrite_fraction":.., "compact_s":.., "scan_plain_s":..,
   "scan_tombstoned_s":.., "deleted_visible_after":0, "steal_s":..}

Usage: python tools/ann_delete_probe.py [k]     (default 500)
Env:   OUT_DIR (default /root/repo/.scaledata), PROBE_RUNS (default 3)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import lingo_db_spark.operators as ops
from bench import _steal_sec
from lingo_db_spark.session import build_session


def _tree_bytes(path: str) -> dict[str, int]:
    """{cell_dir_name: bytes} for a cell-partitioned parquet tree."""
    out: dict[str, int] = {}
    for d in Path(path).glob("cell=*"):
        out[d.name] = sum(f.stat().st_size for f in d.rglob("*")
                          if f.is_file())
    return out


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    out_dir = os.environ.get("OUT_DIR", "/root/repo/.scaledata")
    runs = int(os.environ.get("PROBE_RUNS", "3"))
    src = os.path.join(out_dir, f"ann_ivfpq_x{k}.parquet")
    if not os.path.isdir(src):
        print(f"prebuilt index {src} missing — run ann_scale_probe "
              f"first", file=sys.stderr)
        return 1
    spark = build_session("ann_delete_probe")
    steal0 = _steal_sec()

    work = tempfile.mkdtemp(prefix="ldb_del_probe_") + "/ivfpq"
    shutil.copytree(src, work)

    codes = spark.read.parquet(work)
    n = codes.count()
    sizes = (codes.groupBy("cell").count()
             .orderBy("count").collect())
    n_cells = len(sizes)
    small, big = sizes[0], sizes[-1]
    small_ids = [r.vec_id for r in codes.filter(
        F.col("cell") == small.cell).select("vec_id").collect()]
    big_ids = [r.vec_id for r in codes.filter(
        F.col("cell") == big.cell).select("vec_id")
        .limit(max(10, big["count"] // 100)).collect()]
    del_ids = small_ids + big_ids
    deleted = spark.createDataFrame([(i,) for i in del_ids],
                                    "vec_id long")

    # read-path cost: full pruned-scan count, plain vs tombstoned
    def _scan(df) -> float:
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df.count()
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    scan_plain = _scan(spark.read.parquet(work))
    scan_tomb = _scan(ops.index_delete(spark.read.parquet(work), deleted))

    before = _tree_bytes(work)
    t0 = time.perf_counter()
    touched = ops.compact_index_cells(spark, work, deleted)
    compact_s = time.perf_counter() - t0
    after = _tree_bytes(work)

    untouched_changed = [
        d for d in after
        if int(d.split("=")[1]) not in touched and after[d] != before[d]]
    assert not untouched_changed, untouched_changed
    bytes_total = sum(before.values())
    bytes_rewritten = (sum(before[d] for d in before
                           if int(d.split("=")[1]) in touched))
    left = spark.read.parquet(work)
    visible = left.join(deleted, "vec_id").count()
    assert left.count() == n - len(del_ids)

    print(json.dumps({
        "k": k, "n_vectors": n, "n_cells": n_cells,
        "n_deleted": len(del_ids), "touched_cells": len(touched),
        "bytes_total": bytes_total, "bytes_rewritten": bytes_rewritten,
        "rewrite_fraction": round(bytes_rewritten / bytes_total, 5),
        "compact_s": round(compact_s, 3),
        "scan_plain_s": round(scan_plain, 3),
        "scan_tombstoned_s": round(scan_tomb, 3),
        "deleted_visible_after": visible,
        "steal_s": round(_steal_sec() - steal0, 2),
    }))
    shutil.rmtree(os.path.dirname(work), ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
