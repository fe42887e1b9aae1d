"""As-of join: for each left row, the most recent right row at or before
it (per key) — the temporal-alignment operator behind feature lookups,
slowly-changing dimensions, and market-data joins.

Spark has no native as-of join.  The scalable form used here is the
union-and-window idiom: tag both inputs, union them, and carry the last
right-side value forward with a window `last_value(ignorenulls)` ordered
by time within each key.  One shuffle on the key, one per-partition sort
— the same cost as a sort-merge join, and NO row explosion regardless of
how many right rows precede a left row (a naive `ts_r <= ts_l` range
join materializes O(matches) pairs before picking the max; this never
does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *, on: str, ts: str,
              value_cols: list[str], suffix: str = "_asof",
              direction: str = "backward",
              tolerance=None) -> DataFrame:
    """For every `left` row: all left columns plus `value_cols` from the
    nearest `right` row at-or-before it (direction='backward', the
    default: right.ts <= left.ts) or at-or-after it ('forward'), per
    `on` key — NULL when no such row.  Ties at equal ts take the right
    row.  `tolerance` (a Column interval or literal accepted by ts
    subtraction, e.g. F.expr("INTERVAL 1 HOUR")) bounds the allowed
    staleness: a match farther than the tolerance yields NULL — the
    max-staleness rule of feature-store lookups (pandas merge_asof
    semantics).  Still one shuffle + one per-partition sort, no row
    explosion."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1))
    r = right.select(on, ts, *value_cols).withColumn("__side", F.lit(0))
    for c in value_cols:
        l = l.withColumn(c, F.lit(None).cast(r.schema[c].dataType))
    r = r.withColumn("__rts", F.col(ts))
    l = l.withColumn("__rts", F.lit(None).cast(r.schema["__rts"].dataType))
    unioned = l.select(on, ts, "__side", "__rts", *value_cols,
                       *[c for c in lcols if c not in (on, ts)]) \
        .unionByName(r.select(on, ts, "__side", "__rts", *value_cols)
                     .withColumns({c: F.lit(None)
                                   for c in lcols if c not in (on, ts)}))
    order = [F.col(ts), F.col("__side")] if direction == "backward" \
        else [F.col(ts).desc(), F.col("__side")]
    w = (Window.partitionBy(on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.select(
        on, ts, "__side",
        F.last("__rts", ignorenulls=True).over(w).alias("__rts"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
        *[c for c in lcols if c not in (on, ts)])
    out = carried.filter(F.col("__side") == 1).drop("__side")
    if tolerance is not None:
        staleness = (F.col(ts) - F.col("__rts")) if direction == "backward" \
            else (F.col("__rts") - F.col(ts))
        keep = F.col("__rts").isNotNull() & (staleness <= tolerance)
        out = out.select(
            on, ts,
            *[F.when(keep, F.col(c)).otherwise(F.lit(None)).alias(c)
              for c in value_cols],
            *[c for c in lcols if c not in (on, ts)])
    else:
        out = out.drop("__rts")
    renames = {c: c + suffix for c in value_cols if c in lcols}
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out
