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
              value_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """For every `left` row: all left columns plus `value_cols` from the
    latest `right` row with right.ts <= left.ts and equal `on` key (NULL
    when no right row precedes it).  Ties at equal ts take the right row
    (right sorts before left at the same timestamp)."""
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1))
    r = right.select(on, ts, *value_cols).withColumn("__side", F.lit(0))
    for c in value_cols:
        l = l.withColumn(c, F.lit(None).cast(r.schema[c].dataType))
    unioned = l.select(on, ts, "__side", *value_cols,
                       *[c for c in lcols if c not in (on, ts)]) \
        .unionByName(r.select(on, ts, "__side", *value_cols)
                     .withColumns({c: F.lit(None)
                                   for c in lcols if c not in (on, ts)}))
    w = (Window.partitionBy(on).orderBy(ts, "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.select(
        on, ts, "__side",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
        *[c for c in lcols if c not in (on, ts)])
    out = carried.filter(F.col("__side") == 1).drop("__side")
    renames = {c: c + suffix for c in value_cols if c in lcols}
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out
