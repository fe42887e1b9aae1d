"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:
- brute_force_topk: exact cosine top-k — the correctness baseline.  Cost
  O(n·q): fine when the query set is small (broadcast) or as the oracle
  for recall measurement; not the 100TB path.
- lsh_topk: random-hyperplane (sign) LSH — each vector lands in
  2^n_planes buckets per table; a query only scores vectors sharing a
  bucket in at least one of n_tables tables.  Candidates are
  O(n · collision_rate), no crossJoin anywhere in the plan.  Bits/tables
  trade recall vs candidate count: defaults are tuned for near-uniform
  vectors (the hard case); clustered real-world embeddings do much
  better at longer codes.

All dot products are JVM-side higher-order functions (zip_with +
aggregate) — no Python in the scoring loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_id_col: str = "q_id", q_vec_col: str = "q_vec",
                     ) -> DataFrame:
    """Exact top-k: broadcast the (small) query set against every vector.
    Returns (q_id, vec_id, cos, rank) with deterministic tie-break on
    vec_id."""
    joined = emb.join(F.broadcast(queries))
    scored = joined.select(
        F.col(q_id_col), F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = 42):
    """Deterministic random hyperplanes, table-major: [table][plane][dim]."""
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_tables, n_planes, dim)).astype(float)


def _bucket_udf(planes):
    """Vectorized bucket computation: all tables' sign bits in ONE numpy
    matmul per Arrow batch (V @ P.T > 0), packed to per-table bucket ids.
    A JVM expression tree of n_tables*n_planes separate dot-product
    aggregates defeats codegen; the matmul is the batch-friendly form."""
    flat = np.concatenate(planes, axis=0)          # (T*B, dim)
    n_tables, n_planes = planes.shape[0], planes.shape[1]
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy())              # (rows, dim)
        bits = (v @ flat.T) > 0                    # (rows, T*B)
        bits = bits.reshape(len(v), n_tables, n_planes)
        ids = (bits * weights).sum(axis=2)         # (rows, T)
        return pd.Series(list(ids))

    return _buckets


def lsh_buckets(df: DataFrame, vec_col: str, dim: int,
                n_planes: int = 4, n_tables: int = 16,
                seed: int = 42) -> DataFrame:
    """Append (table_id, bucket) rows: one output row per input row per
    table.  Downstream joins on (table_id, bucket) touch only colliding
    vectors."""
    planes = _hyperplanes(dim, n_planes, n_tables, seed)
    buckets = _bucket_udf(planes)(F.col(vec_col))
    return (df.select("*", F.posexplode(buckets).alias("table_id", "bucket")))


def lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 10, *,
             dim: int, n_planes: int = 4, n_tables: int = 16,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec",
             seed: int = 42) -> DataFrame:
    """Approximate top-k: bucket both sides with the same hyperplanes,
    equi-join on (table_id, bucket), dedupe candidates, exact cosine
    re-rank.  Expected recall for a neighbor at angle θ is
    1-(1-p^n_planes)^n_tables with p = 1-θ/π."""
    e_b = lsh_buckets(emb.select(id_col, vec_col), vec_col, dim,
                      n_planes, n_tables, seed)
    q_b = lsh_buckets(queries.select(q_id_col, q_vec_col), q_vec_col, dim,
                      n_planes, n_tables, seed)
    cands = (e_b.join(q_b, ["table_id", "bucket"])
             .select(q_id_col, id_col, vec_col, q_vec_col)
             .dropDuplicates([q_id_col, id_col]))
    scored = cands.select(
        F.col(q_id_col), F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
