"""Synthesize a k-times scaled copy of the driver's sf0.1 test data, with
foreign-key integrity and a realistic multi-file layout.

Purpose: the driver's per-SF parquet is one single-row-group file per
table, so every scan is a 1-split read — fine for correctness, useless
for judging whether query SHAPES scale.  This tool replicates each table
k times (keys offset per replica so FK joins keep their cardinality
structure) and writes ~`files_per_table` parquet files per table, giving
scans real split parallelism.  tools/scale_probe.py then measures the
wall-time ratio per query between sf0.1 and the scaled copy: a scale-safe
plan should grow ~linearly (ratio ~k on a fixed-size machine).

Replica semantics for the pipeline tables are deliberately "dirty data at
scale": each replica's document text gets a one-token suffix (still a
near-duplicate of its siblings — trigram Jaccard ~0.99), and embeddings
get a tiny first-coordinate jitter (cosine ~0.9995) — so dedup output
grows with real duplicate classes of size k, the worst realistic case for
LSH bucketing.

Usage: python tools/make_scaled_data.py [k] [out_dir]
       (defaults: k=10, out_dir=/root/repo/.scaledata/sf1)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lingo_db_spark.catalog import load_table
from lingo_db_spark.session import build_session

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Key spaces are offset by replica * stride; strides comfortably above the
# sf0.1 key ranges keep replicas disjoint.
STRIDES = {
    "orderkey": 10_000_000,
    "custkey": 1_000_000,
    "partkey": 1_000_000,
    "suppkey": 100_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
}


def _rep(spark: SparkSession, k: int) -> DataFrame:
    return spark.range(k).withColumnRenamed("id", "__r")


def _scale(df: DataFrame, k: int, rep: DataFrame,
           offsets: dict[str, str]) -> DataFrame:
    out = df.crossJoin(F.broadcast(rep))
    for col, stride_key in offsets.items():
        out = out.withColumn(
            col, F.col(col) + F.col("__r") * F.lit(STRIDES[stride_key]))
    return out.drop("__r")


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaledata/sf1"
    files_per_table = int(os.environ.get("SCALE_FILES", "32"))
    spark = build_session("make_scaled_data")
    rep = _rep(spark, k)

    plans: dict[str, DataFrame] = {}
    # Dimensions that do NOT scale with SF: copy as-is.
    for name in ("region", "nation"):
        plans[name] = load_table(spark, SRC, name)
    plans["customer"] = _scale(load_table(spark, SRC, "customer"), k, rep,
                               {"c_custkey": "custkey"})
    plans["supplier"] = _scale(load_table(spark, SRC, "supplier"), k, rep,
                               {"s_suppkey": "suppkey"})
    plans["part"] = _scale(load_table(spark, SRC, "part"), k, rep,
                           {"p_partkey": "partkey"})
    plans["orders"] = _scale(load_table(spark, SRC, "orders"), k, rep,
                             {"o_orderkey": "orderkey", "o_custkey": "custkey"})
    plans["lineitem"] = _scale(load_table(spark, SRC, "lineitem"), k, rep,
                               {"l_orderkey": "orderkey",
                                "l_partkey": "partkey",
                                "l_suppkey": "suppkey"})
    plans["documents"] = (
        load_table(spark, SRC, "documents").crossJoin(F.broadcast(rep))
        .withColumn("doc_id", F.col("doc_id") + F.col("__r") * STRIDES["doc_id"])
        .withColumn("text", F.concat(F.col("text"),
                                     F.lit(" zrep"), F.col("__r")))
        .withColumn("n_chars", F.length("text").cast("bigint"))
        .drop("__r"))
    plans["embeddings"] = (
        load_table(spark, SRC, "embeddings").crossJoin(F.broadcast(rep))
        .withColumn("vec_id", F.col("vec_id") + F.col("__r") * STRIDES["vec_id"])
        .withColumn("embedding", F.concat(
            F.array(F.col("embedding").getItem(0)
                    + F.col("__r").cast("double") * F.lit(0.003)),
            F.slice("embedding", 2, 10_000)).cast("array<float>"))
        .drop("__r"))
    plans["events"] = (
        load_table(spark, SRC, "events").crossJoin(F.broadcast(rep))
        .withColumn("event_id",
                    F.col("event_id") + F.col("__r") * STRIDES["event_id"])
        .withColumn("user_id",
                    F.col("user_id") + F.col("__r") * STRIDES["user_id"])
        # catalog.load_table expects the driver's on-disk convention for
        # events.ts (int64 nanoseconds); write the same so the scaled dir
        # is a drop-in sf_dir.
        .withColumn("ts", (F.unix_micros(F.col("ts").cast("timestamp"))
                           * F.lit(1000)).cast("long"))
        .drop("__r"))

    os.makedirs(out_dir, exist_ok=True)
    for name, df in plans.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        n = 1 if name in ("region", "nation") else files_per_table
        (df.repartition(n).write.mode("overwrite").parquet(path))
        print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
