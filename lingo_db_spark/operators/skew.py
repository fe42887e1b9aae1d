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


def salted_join(left: DataFrame, right: DataFrame, key: str,
                n_salt: int = 16, how: str = "inner") -> DataFrame:
    """Skew-proof equi-join for a HOT-KEY left side: salt the big/skewed
    left on a derived uniform salt, replicate each (small-side) right row
    across all n_salt salts, and equi-join on (key, salt) — every hot key
    fans out over n_salt reducers instead of melting one.

    This is the manual form of what AQE's skew-join does for oversized
    shuffle partitions (session conf spark.sql.adaptive.skewJoin) —
    needed when skew is invisible to AQE (first shuffle of a stage,
    non-adaptive plans) or when a single key exceeds what one partition
    split can hold.  The right side grows n_salt-fold, so use it when
    |right| * n_salt stays shuffle-cheap (dimension-vs-fact skew, the
    common case).  Only the equi-key join is supported; residual
    predicates compose via .filter on the result.

    Only left-preserving join types are valid: the right side is
    REPLICATED n_salt-fold, so right/full outer (and right-semi/anti)
    would emit every unmatched right row n_salt times."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join: how={how!r} is not left-preserving; the "
            f"replicated right side would duplicate unmatched right rows "
            f"n_salt times. Salt the other side instead.")
    salt_l = F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    l = left.withColumn("__salt", salt_l.cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")
