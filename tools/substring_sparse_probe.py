"""Measure the winnow-prefiltered exact-substring composition against
the full pass on a DUPLICATION-SPARSE corpus at scale.

The r8 100x probe measured the full pass's constructed WORST case
(every document a 100-replica duplicate).  This probe measures the
composition's claimed REAL-corpus behavior: when duplication is sparse,
the winnowing prefilter should confine the L-per-character gram blowup
— the full pass's one corpus-sized cost — to the sliver of documents
that can actually contain duplicates, and the prefiltered form should
beat the full pass by roughly the sparsity factor.

Corpus construction (deterministic, in-memory; k x the sf0.1 document
count, token counts drawn from the real documents' length
distribution):
  - every document's body is a unique-token stream seeded by its id
    (xxhash64 into a 1e9 vocabulary), so cross-document 30-char runs
    essentially cannot occur by chance — duplication is structurally
    sparse, the realistic shape of a web-scale corpus AFTER upstream
    exact/near dedup;
  - base documents with doc_id % 199 == 0 (~0.5%) get one shared
    sentence appended in all k replicas: the sparse true duplication
    the pass must still find (11 tokens — inside winnowing's
    window+k-1 recall bound).

Prints one JSON line:
  {"k": .., "docs": .., "candidate_docs": .., "candidate_frac": ..,
   "full_s": .., "prefiltered_s": .., "speedup": ..,
   "full_rows": .., "prefiltered_rows": ..}

Usage: python tools/substring_sparse_probe.py [k]   (default 100)
Env:   BASE_DIR (default /root/testdata/sf0.1), PROBE_RUNS (default 2)
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

from lingo_db_spark.catalog import load_table
from lingo_db_spark.pipeline import dedup as pl
from lingo_db_spark.session import build_session

_SHARED = (" probe shared boilerplate sentence common across sparse"
           " duplicate documents 7")


def build_corpus(spark, base_dir: str, k: int):
    docs = load_table(spark, base_dir, "documents").select("doc_id", "text")
    rep = spark.range(k).withColumnRenamed("id", "__r")
    body = ("concat_ws(' ', transform("
            "sequence(1, greatest(CAST(length(text) / 5 AS INT), 8)), "
            "i -> concat('w', CAST(abs(xxhash64(doc_id * 1000 + __r, i)) "
            "% 1000000000 AS STRING))))")
    return (docs.crossJoin(F.broadcast(rep))
            .select(
                (F.col("doc_id") * k + F.col("__r")).alias("doc_id"),
                F.when(F.col("doc_id") % 199 == 0,
                       F.concat(F.expr(body), F.lit(_SHARED)))
                .otherwise(F.expr(body)).alias("text")))


def timed(fn, runs: int) -> tuple[float, int]:
    best, rows = [], 0
    for _ in range(runs):
        t0 = time.perf_counter()
        rows = fn()
        best.append(time.perf_counter() - t0)
    return statistics.median(best), rows


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    base_dir = os.environ.get("BASE_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("PROBE_RUNS", "2"))
    spark = build_session("substring_sparse_probe")
    corpus = build_corpus(spark, base_dir, k)
    corpus.persist()
    n_docs = corpus.count()

    # candidate-set size under the prefilter (the "sliver" claim);
    # xxhash64 fingerprints — the documented scale configuration (md5
    # exists only for cross-engine oracle verifiability)
    fps = pl.winnow_fingerprints(corpus, "doc_id", "text", 6, 4,
                                 hash_fn="xxhash64")
    shared = (fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__n"))
              .filter(F.col("__n") > 1).select("fp"))
    n_cand = fps.join(shared, "fp").select("doc_id").distinct().count()

    full_s, full_rows = timed(
        lambda: pl.exact_substring_spans(
            corpus, "doc_id", "text", 30).count(), runs)
    spark.catalog.clearCache()
    corpus.persist().count()
    pre_s, pre_rows = timed(
        lambda: pl.exact_substring_spans_prefiltered(
            corpus, "doc_id", "text", 30, 6, 4,
            hash_fn="xxhash64").count(), runs)

    print(json.dumps({
        "k": k, "docs": n_docs, "candidate_docs": n_cand,
        "candidate_frac": round(n_cand / max(1, n_docs), 4),
        "full_s": round(full_s, 2), "prefiltered_s": round(pre_s, 2),
        "speedup": round(full_s / max(1e-9, pre_s), 2),
        "full_rows": full_rows, "prefiltered_rows": pre_rows,
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
