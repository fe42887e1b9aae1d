"""A/B isolation of the pipeline_minhash_neardup bench anomaly (r9:
2.431 s vs r7: 0.588 s) under the EXACT bench protocol (cold cache per
run, median of 3 after 1 warmup).

Arms:
  r9-shape      — barrier(token STRING arrays) + shingles + per-shingle
                  xxhash64 (the code as benched in r9), localCheckpoint
                  strategy (r9's barrier).
  r10-shape     — hash tokens in the tokenize projection, zip_with gram
                  chain (winnowing's xxhash64 trick transferred), under
                  each barrier strategy.
  no-barrier    — r10 gram chain with barrier monkeypatched to identity
                  (measures what the barrier buys/costs by itself).

Usage: python tools/minhash_ab_probe.py [sf_dir]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lingo_db_spark.catalog import load_table
from lingo_db_spark.pipeline import dedup as dd
from lingo_db_spark.pipeline.barrier import BARRIER_CONF
from lingo_db_spark.pipeline.text import tokens, shingles
from lingo_db_spark.session import build_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
WARMUP, RUNS = 1, 3


def shingle_hashes_r9(df, id_col, text_col, shingle_k=3):
    """The shape benched in r9: token-string barrier, per-shingle hash."""
    toked = dd.spread(
        df.select(F.col(id_col), tokens(text_col).alias("__toks")),
        id_col).localCheckpoint()
    return toked.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(shingles(F.col("__toks"), shingle_k),
                        lambda s: F.xxhash64(s))).alias("shs"))


def measure(spark, docs, label):
    samples = []
    n = 0
    for i in range(WARMUP + RUNS):
        t0 = time.perf_counter()
        n = len(dd.neardup_minhash(docs, "doc_id", "text",
                                   threshold=0.8).collect())
        el = time.perf_counter() - t0
        if i >= WARMUP:
            samples.append(el)
        spark.catalog.clearCache()
    med = statistics.median(samples)
    print(f"{label:34s} median {med:6.3f} s  ({n} pairs, "
          f"runs {['%.3f' % s for s in samples]})", flush=True)
    return med


def main():
    spark = build_session("minhash_ab")
    docs = load_table(spark, SF_DIR, "documents")
    docs.count()  # warm the file scan

    orig = dd.shingle_hashes
    orig_barrier = dd.barrier

    dd.shingle_hashes = shingle_hashes_r9
    measure(spark, docs, "r9-shape (localCheckpoint)")
    dd.shingle_hashes = orig

    spark.conf.set(BARRIER_CONF, "localCheckpoint")
    measure(spark, docs, "r10-shape (localCheckpoint)")
    spark.conf.unset(BARRIER_CONF)

    measure(spark, docs, "r10-shape (persist default)")

    dd.barrier = lambda df, **kw: df
    measure(spark, docs, "r10-shape (NO barrier)")
    dd.barrier = orig_barrier


if __name__ == "__main__":
    main()
