"""Distributed prefix sums / corpus packing.

A GLOBAL running total (the "cut a 100B-token dataset at a budget"
operator) is the canonical thing a naive Window.orderBy gets wrong at
scale: an empty PARTITION BY collapses the whole table into one window
partition — one task does all the work.  The scale-safe rendering is the
classic two-phase scan (the same decomposition the reference uses for
thread-local partial aggregation, reference
include/lingodb/runtime/PreAggregationHashtable.h:8-40 + subop.merge,
SubOperatorOps.td:499-510):

1. range-partition by the ordering key (N contiguous key ranges);
2. per-shard running sum — shard-parallel window;
3. per-shard subtotals (N rows) -> exclusive running offsets — a window
   over a bounded, shard-count-sized frame;
4. broadcast the offsets back and add.

Phases 2 and 4 touch each row once, in parallel; the only global
ordering work is over N subtotal rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SHARD = "__shard"
_LOCAL = "__local_cum"
_OFFSET = "__offset"


def global_running_sum(df: DataFrame, order_col: str, value_col: str,
                       out_col: str, num_shards: int | None = None) -> DataFrame:
    """Running SUM(value_col) in global order_col order, shard-parallel.

    Equivalent to ``SUM(value) OVER (ORDER BY order_col ROWS UNBOUNDED
    PRECEDING)`` but never materializes a single-partition window over
    the full data: the per-row work happens inside range-partitioned
    shards, and only the shard subtotals (num_shards rows) pass through
    a global window.  order_col values must be unique for a
    deterministic result (ties within a shard are fine for the sum
    itself but make row attribution ambiguous)."""
    spark = df.sparkSession
    n = num_shards or spark.sparkContext.defaultParallelism
    sharded = (df.repartitionByRange(n, F.col(order_col))
               .withColumn(_SHARD, F.spark_partition_id()))
    w_local = (Window.partitionBy(_SHARD).orderBy(order_col)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = sharded.withColumn(_LOCAL, F.sum(value_col).over(w_local))
    # Exclusive prefix over the per-shard subtotals: bounded at num_shards
    # rows, so the empty-PARTITION BY window here is a constant-size frame,
    # not a data-sized one.
    w_off = (Window.orderBy(_SHARD)
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (local.groupBy(_SHARD)
               .agg(F.sum(value_col).alias("__sub"))
               .withColumn(_OFFSET,
                           F.coalesce(F.sum("__sub").over(w_off), F.lit(0)))
               .select(_SHARD, _OFFSET))
    return (local.join(F.broadcast(offsets), _SHARD)
            .withColumn(out_col, (F.col(_LOCAL) + F.col(_OFFSET)).cast("long"))
            .drop(_SHARD, _LOCAL, _OFFSET))


def pack_to_budget(df: DataFrame, order_col: str, tokens_col: str,
                   budget: int, cum_col: str = "cum_tokens",
                   num_shards: int | None = None) -> DataFrame:
    """Deterministic prefix of the corpus (in order_col order) whose
    cumulative token count fits the budget."""
    out = global_running_sum(df, order_col, tokens_col, cum_col, num_shards)
    return out.filter(F.col(cum_col) <= budget)


def pack_sequences_next_fit(df: DataFrame, order_col: str, tokens_col: str,
                            capacity: int,
                            num_shards: int | None = None,
                            shard_of: Column | None = None) -> DataFrame:
    """Pack documents into fixed-capacity context windows (the "fill 8k
    training sequences" operator): NEXT-FIT bin packing in order_col
    order — a document goes into the current bin if it fits, else the
    bin closes and a new one opens.  Oversized documents (> capacity)
    get a bin of their own.

    Scale shape: range-partition into shards of contiguous order_col
    ranges; each shard packs independently inside one Arrow-batched
    applyInPandas pass (packing is a sequential fold, so the
    per-shard pass is the irreducible serial unit — shards themselves
    run in parallel, which is how a 100 TB corpus packs on a cluster).
    bin_id = shard * 2^32 + local bin index: globally unique without
    any cross-shard coordination.  The fold order is order_col order
    within a shard.  Default sharding is range partitioning on
    order_col (contiguous document runs per bin — the scale-ideal
    layout, but partition boundaries come from Spark's range sampler);
    pass shard_of (any deterministic int expression, e.g.
    pmod(doc_id, 64)) when the output must be a pure function of the
    data, e.g. for cross-engine verification.
    Returns (order_col, tokens_col, bin_id, bin_offset) where
    bin_offset is the document's token offset inside its bin."""
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    n = num_shards or spark.sparkContext.defaultParallelism
    if shard_of is not None:
        sharded = (df.select(order_col, tokens_col)
                   .withColumn(_SHARD, shard_of.cast("int")))
    else:
        sharded = (df.select(order_col, tokens_col)
                   .repartitionByRange(n, F.col(order_col))
                   .withColumn(_SHARD, F.spark_partition_id()))

    out_schema = T.StructType([
        df.schema[order_col],
        df.schema[tokens_col],
        T.StructField("bin_id", T.LongType(), False),
        T.StructField("bin_offset", T.LongType(), False),
    ])

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        shard = int(pdf[_SHARD].iloc[0]) if len(pdf) else 0
        base = shard << 32
        bins, offsets = [], []
        cur_bin, fill = 0, 0
        for t in pdf[tokens_col]:
            t = int(t)
            if fill > 0 and fill + t > capacity:
                cur_bin += 1
                fill = 0
            bins.append(base + cur_bin)
            offsets.append(fill)
            fill += t
        pdf = pdf.drop(columns=[_SHARD])
        pdf["bin_id"] = pd.Series(bins, index=pdf.index, dtype="int64")
        pdf["bin_offset"] = pd.Series(offsets, index=pdf.index, dtype="int64")
        return pdf

    return sharded.groupBy(_SHARD).applyInPandas(pack, out_schema)
