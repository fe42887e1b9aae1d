"""GroupJoin — the reference's fused join+group-by operator
(relalg.groupjoin, RelAlgOps.td:240-253; fusion rule
OptimizeImplementations.cpp:771-850, eager aggregation :671-770).

Spark has no fused physical operator, but the *optimization* the fusion
buys — aggregating the many-side before the join instead of after — is
expressible directly, and at scale it is the difference between shuffling
the raw fact table and shuffling one row per group.  This helper pins that
shape so query authors don't accidentally write the join-then-aggregate
version.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def group_join(left: DataFrame, right: DataFrame,
               left_key: str, right_key: str,
               *aggs: Column, behavior: str = "inner") -> DataFrame:
    """Join `left` (keys assumed duplicate-free, as relalg.groupjoin
    requires) with the per-key aggregation of `right`.

    behavior='inner' drops left rows with no right matches;
    behavior='outer' keeps them with NULL aggregate columns (the caller
    coalesces, mirroring the reference's mapped-null behavior).

    Plan: right aggregates first (partial agg map-side, one shuffle of
    group rows, not raw rows), then joins — AQE broadcasts the aggregated
    side when it is small enough."""
    if behavior not in ("inner", "outer"):
        raise ValueError(f"behavior must be inner|outer, got {behavior!r}")
    grouped = right.groupBy(right_key).agg(*aggs)
    how = "inner" if behavior == "inner" else "left"
    return (left.join(grouped, left[left_key] == grouped[right_key], how)
            .drop(right_key))
