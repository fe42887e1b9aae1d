"""ReduceGroupByKeys — drop functionally-dependent GROUP BY keys.

The reference's optimizer removes group-by keys that are functionally
determined by a primary key in the group list and re-attaches them via
an `any` aggregate (reference SimplifyAggregations pass family, created
at src/compiler/Dialect/RelAlg/Transforms/Passes.cpp:37; the rewrite the
round-2 survey marked "no Catalyst equivalent").  Grouping on
(c_custkey, c_name, c_acctbal) hashes and compares three columns per row
and carries them all through the shuffle as key bytes; grouping on the
key alone and re-attaching the dependents as F.first() inside the
aggregate produces the identical result (each group holds exactly one
value of a dependent column) with a narrower hash key and smaller
shuffle rows — the win grows with dependent-column width (names,
addresses, comments).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_by_key(df: DataFrame, pk: list[str], dependents: list[str],
                   aggs: dict[str, Column]) -> DataFrame:
    """GROUP BY pk + dependents, rewritten to group on pk only.

    `dependents` must be functionally determined by `pk` (one value per
    group — a declared-primary-key relationship, exactly the reference's
    precondition).  They are re-attached with F.first(), Spark's `any`
    (reference relalg.aggrfn `any`, RelAlgOps.td:71-85), which is safe
    precisely because each group sees one value.  `aggs` maps output
    name -> aggregate Column."""
    return df.groupBy(*pk).agg(
        *[F.first(d).alias(d) for d in dependents],
        *[c.alias(n) for n, c in aggs.items()])
