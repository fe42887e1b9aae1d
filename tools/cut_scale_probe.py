"""Scale probe for the exact-substring CUT pass in isolation.

The span DETECTION pass has its own 100x row (SCALE.md r8/r9); this
measures the remaining stage — cut_substring_spans's per-document
aggregate() cursor fold + co-partitioned join — with the spans
PRECOMPUTED and persisted, so the fold is what's timed, not the
detection.  Runs on the same corpora as the r8 worst-case probe:
sf0.1 documents vs the k=100 scaled copy (every doc a 100-replica
near-duplicate, so every doc carries spans — the fold's worst case).

Prints one JSON line:
  {"base": {"docs": .., "spans": .., "cut_s": ..},
   "scaled": {...}, "wall_ratio": ..}

Usage: python tools/cut_scale_probe.py
Env:   BASE_DIR (default /root/testdata/sf0.1),
       SCALE_DIR (default /root/repo/.scaledata/sf10), PROBE_RUNS
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lingo_db_spark.catalog import load_table
from lingo_db_spark.pipeline import dedup as pl
from lingo_db_spark.session import build_session


def measure(spark, sf_dir: str, runs: int) -> dict:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.persist()
    n_docs = docs.count()
    spans = pl.exact_substring_spans(docs, "doc_id", "text", 30)
    spans.persist()
    n_spans = spans.count()
    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        pl.cut_substring_spans(docs, spans, "doc_id", "text").count()
        walls.append(time.perf_counter() - t0)
    docs.unpersist()
    spans.unpersist()
    return {"docs": n_docs, "spans": n_spans,
            "cut_s": round(statistics.median(walls), 2)}


def main() -> int:
    base = os.environ.get("BASE_DIR", "/root/testdata/sf0.1")
    scaled = os.environ.get("SCALE_DIR", "/root/repo/.scaledata/sf10")
    runs = int(os.environ.get("PROBE_RUNS", "2"))
    spark = build_session("cut_scale_probe")
    b = measure(spark, base, runs)
    spark.catalog.clearCache()
    s = measure(spark, scaled, runs)
    print(json.dumps({
        "base": b, "scaled": s,
        "wall_ratio": round(s["cut_s"] / max(1e-9, b["cut_s"]), 1),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
