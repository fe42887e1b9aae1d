"""Deduplication operators: exact, fingerprint, MinHash+LSH, SimHash.

Scale design (the point of every choice here):
- exact/fingerprint dedup: one hash shuffle on the dedup key, keep-first
  inside each partition via row_number — never a global sort, never a
  driver collect.
- MinHash near-dup: signatures are H min-aggregations over exploded
  shingles (one shuffle on doc id); LSH banding joins only rows that
  collide in a (band_id, band_hash) bucket — candidate pairs are
  O(n·bucket_width), never the all-pairs O(n²) crossJoin.
- SimHash: 64-bit signature via an Arrow-batched pandas UDF (token loop
  can't be expressed as a fixed-width JVM expression), then the same
  banded-join trick on 16-bit chunks for Hamming-candidate generation.

No reference counterpart (lingo-db has no dedup operators) — these are the
SURVEY.md §7 Phase-4 pipeline extensions.
"""

from __future__ import annotations

import hashlib
import struct as _struct

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lingo_db_spark.pipeline.text import shingles, tokens


def dedup_exact(df: DataFrame, key_cols: list[str] | tuple[str, ...],
                tiebreak_col: str) -> DataFrame:
    """Keep exactly one row per distinct key (the one with the smallest
    tiebreak value).  Plan: hash shuffle on key_cols + per-partition sort —
    the scalable keep-first idiom (no global ordering)."""
    w = Window.partitionBy(*key_cols).orderBy(tiebreak_col)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def minhash_signature(df: DataFrame, id_col: str, text_col: str,
                      num_hashes: int = 64, shingle_k: int = 3) -> DataFrame:
    """(id, sig: array<bigint>) — MinHash signature over distinct k-token
    shingles.  h_i(doc) = min over shingles of xxhash64(i, shingle); the H
    mins fold into ONE aggregation over the exploded shingles (map-side
    partial min => tiny shuffle)."""
    ex = df.select(F.col(id_col),
                   F.explode(shingles(tokens(text_col), shingle_k)).alias("__sh"))
    mins = [F.min(F.xxhash64(F.lit(i), F.col("__sh"))).alias(f"__h{i}")
            for i in range(num_hashes)]
    sig = ex.groupBy(id_col).agg(*mins)
    return sig.select(id_col,
                      F.array(*[F.col(f"__h{i}") for i in range(num_hashes)])
                      .alias("sig"))


def lsh_candidate_pairs(sig_df: DataFrame, id_col: str,
                        bands: int = 16,
                        max_bucket_size: int | None = 10_000) -> DataFrame:
    """(id_a, id_b) candidate pairs: docs whose signatures agree on at
    least one full band.  Self-join restricted to (band_id, band_hash)
    buckets.  max_bucket_size drops degenerate buckets (e.g. the empty-
    document signature) that would otherwise produce quadratic pair blowup
    — the skew guard a 100TB run needs; dropped buckets are by definition
    huge duplicate classes better handled by exact dedup first."""
    rows_per_band = F.floor(F.size("sig") / bands)
    banded = sig_df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.lit("band"), b,
                    F.array_join(
                        F.transform(
                            F.slice(F.col("sig"),
                                    (b * rows_per_band + 1).cast("int"),
                                    rows_per_band.cast("int")),
                            lambda v: v.cast("string")),
                        ",")))
        ).alias("band_id", "band_hash"))
    if max_bucket_size is not None:
        wcnt = Window.partitionBy("band_id", "band_hash")
        banded = (banded.withColumn("__bc", F.count(F.lit(1)).over(wcnt))
                  .filter(F.col("__bc") <= max_bucket_size).drop("__bc"))
    a = banded.select(F.col(id_col).alias("id_a"), "band_id", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band_id", "band_hash")
    return (a.join(b, ["band_id", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two string arrays (assumed distinct)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def neardup_minhash(df: DataFrame, id_col: str, text_col: str,
                    threshold: float = 0.8, num_hashes: int = 64,
                    bands: int = 16, shingle_k: int = 3) -> DataFrame:
    """Near-duplicate pairs (id_a, id_b, jaccard) with exact shingle
    Jaccard >= threshold, found via MinHash+LSH candidates only.

    Recall at threshold t with b bands of r rows is 1-(1-t^r)^b; the
    16x4 default gives ~0.9998 at t=0.8 — and exact Jaccard re-scoring on
    candidates removes LSH false positives entirely, so the output equals
    the all-pairs answer with near-certainty at ~O(n) cost."""
    sigs = minhash_signature(df, id_col, text_col, num_hashes, shingle_k)
    cands = lsh_candidate_pairs(sigs, id_col, bands)
    sets_ = df.select(F.col(id_col),
                      shingles(tokens(text_col), shingle_k).alias("__shs"))
    a = sets_.select(F.col(id_col).alias("id_a"), F.col("__shs").alias("__sa"))
    b = sets_.select(F.col(id_col).alias("id_b"), F.col("__shs").alias("__sb"))
    return (cands.join(a, "id_a").join(b, "id_b")
            .select("id_a", "id_b",
                    F.round(jaccard(F.col("__sa"), F.col("__sb")), 4)
                    .alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


# --- SimHash ---------------------------------------------------------------

_SIMHASH_BITS = 64


def _simhash_one(toks) -> int:
    v = [0] * _SIMHASH_BITS
    for t in toks:
        h = int.from_bytes(
            hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "big")
        for i in range(_SIMHASH_BITS):
            v[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(_SIMHASH_BITS):
        if v[i] > 0:
            out |= 1 << i
    return _struct.unpack("<q", _struct.pack("<Q", out))[0]  # as signed i64


_SIMHASH_UDF = None


def simhash(tokens_col: Column) -> Column:
    """64-bit SimHash of a token array — Arrow-batched pandas UDF (the
    per-token bit loop has no fixed-width JVM expression form).  Signed
    i64 so it round-trips through Spark/parquet."""
    global _SIMHASH_UDF
    if _SIMHASH_UDF is None:
        @F.pandas_udf("long")
        def _simhash_udf(s: pd.Series) -> pd.Series:
            # elements arrive as numpy arrays (no truthiness) — test None
            return s.map(
                lambda toks: _simhash_one(toks if toks is not None else []))
        _SIMHASH_UDF = _simhash_udf
    return _SIMHASH_UDF(tokens_col)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two signed-i64 signatures (JVM-side)."""
    return F.bit_count(a.bitwiseXOR(b))


def neardup_simhash(df: DataFrame, id_col: str, text_col: str,
                    max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.
    Candidate generation: split the 64-bit signature into 4 x 16-bit
    chunks; by pigeonhole any pair within Hamming distance 3 agrees on at
    least one chunk, so an equi-join per chunk finds every such pair
    without an all-pairs scan."""
    sh = df.select(F.col(id_col), simhash(tokens(text_col)).alias("sh"))
    chunks = sh.select(
        id_col, "sh",
        F.posexplode(F.array(*[
            F.shiftright(F.col("sh"), 16 * i).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)])).alias("chunk_id", "chunk"))
    a = chunks.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"),
                      "chunk_id", "chunk")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"),
                      "chunk_id", "chunk")
    return (a.join(b, ["chunk_id", "chunk"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    hamming64(F.col("sh_a"), F.col("sh_b")).alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= max_hamming))
