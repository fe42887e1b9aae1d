"""Skew-handling aggregation: two-phase salted aggregate.

AQE's skew handling splits oversized SHUFFLE partitions for joins; it
cannot help a grouped aggregation whose key space is tiny (a handful of
hot keys -> a handful of reducers, however many cores exist).  Spark's
hash aggregate already does map-side partial aggregation, which usually
absorbs this — but when the partial state per task is large (many
distinct expressions, wide decimal state) or the combine is disabled,
the classic fix is explicit salting: aggregate on (key, salt) first —
n_salt times more reducers — then combine the partials on the bare key.
Only DECOMPOSABLE aggregates (sum/count/min/max) can be salted this way;
avg must be expressed as sum+count by the caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)),
    "min": F.min,
    "max": F.max,
}
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(df: DataFrame, keys: list[str],
                     aggs: dict[str, tuple[str, Column | str | None]],
                     salt_src: Column | str, n_salt: int = 32) -> DataFrame:
    """aggs maps output name -> (fn, column) with fn in
    sum/count/min/max (column ignored for count).  salt_src is any
    high-cardinality column; pmod(xxhash64(salt_src), n_salt) spreads
    each hot key over n_salt reducers deterministically."""
    salt = F.pmod(F.xxhash64(salt_src), F.lit(n_salt)).alias("__salt")
    partial = df.groupBy(*keys, salt).agg(*[
        _PARTIAL[fn](col).alias(f"__p_{name}")
        for name, (fn, col) in aggs.items()])
    return partial.groupBy(*keys).agg(*[
        _COMBINE[fn](f"__p_{name}").alias(name)
        for name, (fn, col) in aggs.items()])
