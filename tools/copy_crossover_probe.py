"""COPY ingest-vs-lazy crossover probe (r10 verdict item 6).

Context: `Connection`'s COPY FROM registers a LAZY csv-backed view —
every downstream query re-parses the CSV.  The alternative is
ingest-on-COPY: write parquet once at COPY time, point the view at it.
The r10 JOB-29a A/B measured ingest LOSING at sf0.1 fixture scale
(the journey ran one-or-few queries per table, so the parquet write
never paid for itself) — but that was one point, not a curve.  This
probe measures both arms across CSV sizes and derives the crossover
query count n*(size): how many times a table must be re-read before
ingest-on-COPY wins.  n* ≈ ingest_cost / (csv_query_cost −
parquet_query_cost).

Fixture: the sf0.1 lineitem exported as '|'-separated CSV (the
initialize.sql shape), replicated k× for larger sizes.  Three
representative queries per arm (full-scan agg, filtered agg, group-by)
— each re-reads the whole CSV (row-wise parse; CSV has no pushdown
that skips bytes).

Prints one JSON line per size:
  {"csv_mb":.., "ingest_s":.., "csv_query_s":.., "pq_query_s":..,
   "crossover_queries":.., "steal_cores":..}

Usage: python tools/copy_crossover_probe.py [k1 k2 ...]  (default 1 4 16)
Env:   BASE_DIR (default /root/testdata/sf0.1), PROBE_RUNS (default 3),
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

from pyspark.sql import functions as F

from bench import _steal_sec
from lingo_db_spark.catalog import load_table
from lingo_db_spark.session import build_session


def _tree_mb(path: str) -> float:
    return round(sum(f.stat().st_size for f in Path(path).rglob("*")
                     if f.is_file()) / 1e6, 1)


def _queries(df):
    """Three representative re-reads: full-scan agg, filtered agg,
    group-by agg — the 29a-journey shape (every one scans the table)."""
    return [
        lambda d=df: d.agg(F.count(F.lit(1)),
                           F.sum("l_quantity")).collect(),
        lambda d=df: d.filter(F.col("l_quantity") > 25)
                      .agg(F.sum("l_extendedprice")).collect(),
        lambda d=df: d.groupBy("l_returnflag")
                      .agg(F.avg("l_discount"), F.count(F.lit(1)))
                      .collect(),
    ]


def _arm_cost(spark, df, runs: int) -> float:
    """Median-of-runs TOTAL wall for the 3-query set over `df`."""
    walls = []
    qs = _queries(df)
    for _ in range(runs + 1):           # first pass untimed (JIT warm)
        t0 = time.perf_counter()
        for q in qs:
            q()
        walls.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    return statistics.median(walls[1:])


def main() -> int:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    base_dir = os.environ.get("BASE_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("PROBE_RUNS", "3"))
    out_dir = os.environ.get("OUT_DIR", "/root/repo/.scaledata")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("copy_crossover_probe")

    li = load_table(spark, base_dir, "lineitem")
    schema = li.schema
    for k in ks:
        csv_path = os.path.join(out_dir, f"copy_li_x{k}.csv")
        if not os.path.exists(csv_path):
            big = li
            for _ in range(k - 1):
                big = big.unionAll(li)
            (big.write.mode("overwrite")
             .options(sep="|", header="false").csv(csv_path))
        s0, w0 = _steal_sec(), time.perf_counter()

        # lazy arm: the door's current COPY shape — csv-backed view
        csv_df = (spark.read.options(sep="|", header="false")
                  .schema(schema).csv(csv_path))
        csv_query_s = _arm_cost(spark, csv_df, runs)

        # ingest arm: one-time parquet write at COPY time + re-reads
        pq_path = os.path.join(out_dir, f"copy_li_x{k}.parquet")
        t0 = time.perf_counter()
        csv_df.write.mode("overwrite").parquet(pq_path)
        ingest_s = time.perf_counter() - t0
        pq_query_s = _arm_cost(spark, spark.read.parquet(pq_path), runs)

        per_q_gain = (csv_query_s - pq_query_s) / len(_queries(csv_df))
        crossover = (round(ingest_s / per_q_gain, 1)
                     if per_q_gain > 0 else None)
        print(json.dumps({
            "k": k, "csv_mb": _tree_mb(csv_path),
            "ingest_s": round(ingest_s, 2),
            "csv_query_s": round(csv_query_s, 2),
            "pq_query_s": round(pq_query_s, 2),
            "per_query_gain_s": round(per_q_gain, 3),
            "crossover_queries": crossover,
            "runs": runs,
            "steal_cores": round((_steal_sec() - s0)
                                 / max(1e-6, time.perf_counter() - w0),
                                 3),
        }), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
