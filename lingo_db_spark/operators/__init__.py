"""Custom operators beyond plain relational algebra (similarity search,
and the composition helpers that back them)."""

from lingo_db_spark.operators.groupjoin import group_join  # noqa: F401
from lingo_db_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    cosine,
    dequantize_embeddings,
    dot,
    embed_neardup,
    fuzzy_pairs,
    ivf_topk,
    lsh_buckets,
    lsh_topk,
    norm,
    quantize_embeddings,
)


def resample_fill(df, key_col: str, ts_col: str, value_col: str,
                  step: str = "1 hour"):
    """Time-series resample with gap filling (the hypertable-rollup
    shape): bucket rows to the step grid, aggregate per (key, bucket),
    then LEFT-JOIN a complete per-key time spine (min..max bucket,
    JVM sequence + explode) so silent periods surface as explicit
    zero rows — required before any windowed rate/trend computation.
    The spine is |keys| x |buckets| rows built from a per-key min/max
    aggregate, never a driver loop."""
    from pyspark.sql import functions as F

    bucket = F.date_trunc("hour", F.col(ts_col))
    actual = (df.groupBy(F.col(key_col), bucket.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.round(F.col(value_col) * 1_000_000.0, 0)
                         .cast("long")).alias("__vm")))
    bounds = (actual.groupBy(key_col)
              .agg(F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")))
    spine = (bounds.select(
        key_col,
        F.explode(F.sequence("__lo", "__hi",
                             F.expr(f"INTERVAL {step}"))).alias("bucket")))
    return (spine.join(actual, [key_col, "bucket"], "left")
            .select(key_col, "bucket",
                    F.coalesce("n", F.lit(0)).alias("n"),
                    F.round(F.coalesce("__vm", F.lit(0)).cast("double")
                            / 1e6, 4).alias("total_value")))
