"""Bucketized range join: point-in-interval matching without a
nested-loop join.

Spark plans a bare `l.point BETWEEN r.lo AND r.hi` join as
BroadcastNestedLoopJoin (or a cartesian) — O(|L|·|R|) comparisons, the
classic scale killer.  The standard fix quantizes the range dimension
into fixed-width buckets: points join on their bucket, intervals are
exploded to every bucket they overlap, and the exact BETWEEN survives as
a cheap residual filter on the equi-join's output.  Cost becomes
O(|L| + |R|·avg_span/width + matches) through one hash shuffle — the
same technique Databricks ships as its range-join optimization and
PostGIS applies to bounding boxes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(points: DataFrame, intervals: DataFrame, *,
               point: str, lo: str, hi: str,
               bucket_width: float, keys: list[str] | None = None,
               how: str = "inner") -> DataFrame:
    """Join each `points` row to every `intervals` row whose [lo, hi]
    contains its `point` (inclusive), optionally also matching on `keys`
    equi-columns.  bucket_width should be on the order of the typical
    interval span: too small explodes the interval side, too large
    degrades the residual's selectivity."""
    w = float(bucket_width)
    p = points.withColumn("__bkt", F.floor(F.col(point) / F.lit(w)))
    iv = intervals.withColumn(
        "__bkt",
        F.explode(F.sequence(F.floor(F.col(lo) / F.lit(w)),
                             F.floor(F.col(hi) / F.lit(w)))))
    joined = p.join(iv, ["__bkt", *(keys or [])], how).filter(
        F.col(point).between(F.col(lo), F.col(hi)))
    return joined.drop("__bkt")
