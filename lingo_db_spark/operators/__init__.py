"""Custom operators beyond plain relational algebra (similarity search,
and the composition helpers that back them)."""

from lingo_db_spark.operators.groupjoin import group_join  # noqa: F401
from lingo_db_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    compact_index_cells,
    cosine,
    dequantize_embeddings,
    dot,
    embed_neardup,
    fuzzy_pairs,
    index_delete,
    ivf_append,
    ivf_build,
    ivf_topk,
    ivfpq_append,
    ivfpq_build,
    ivfpq_topk,
    lsh_buckets,
    lsh_build,
    lsh_topk,
    norm,
    pq_encode,
    pq_topk,
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
    aggregate, never a driver loop.

    The bucket grid is epoch-floor arithmetic on the STEP duration (not a
    hard-coded date_trunc unit), so any "N second/minute/hour/day" step
    aligns the aggregation buckets with the spine grid; for "1 hour" the
    result is identical to date_trunc('hour').  Calendar steps (month,
    year) are rejected — they have no fixed duration."""
    import re

    from pyspark.sql import functions as F

    m = re.fullmatch(r"(\d+)\s+(second|minute|hour|day)s?", step.strip())
    if not m:
        raise ValueError(
            f"resample_fill: unsupported step {step!r} — use "
            f"'N second|minute|hour|day' (calendar units have no fixed "
            f"duration and cannot align an epoch grid)")
    step_us = int(m.group(1)) * 1_000_000 * {
        "second": 1, "minute": 60, "hour": 3600, "day": 86400}[m.group(2)]
    bucket = F.timestamp_micros(
        (F.floor(F.unix_micros(F.col(ts_col).cast("timestamp"))
                 / F.lit(step_us)).cast("long") * F.lit(step_us)))
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
