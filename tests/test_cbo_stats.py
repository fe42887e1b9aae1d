"""CBO statistics (lingo_db_spark/stats.py) — verifies ANALYZE-backed
cost-based planning actually engages: the stand-in for the reference's
sample+HLL cardinality estimation feeding DPhyp join ordering
(reference QueryGraph.cpp:264-294, OptimizeJoinOrder.cpp:121-126)."""

from __future__ import annotations

import pytest

from conftest import SF_DIR, explain_str

from lingo_db_spark.catalog import register_views
from lingo_db_spark.stats import drop_stats_tables, materialize_with_stats

_TABLES = ("orders", "customer", "nation")
_PREFIX = "cbostat_"

_SQL = """SELECT n_name, count(*) AS n
FROM {o} JOIN {c} ON c_custkey = o_custkey
JOIN {n} ON n_nationkey = c_nationkey
WHERE o_totalprice > 100 GROUP BY n_name"""


@pytest.fixture(scope="module")
def stats_tables(spark):
    tabs = materialize_with_stats(spark, SF_DIR, _TABLES, prefix=_PREFIX,
                                  overwrite=True)
    yield tabs
    drop_stats_tables(spark, _TABLES, prefix=_PREFIX)


def _optimized(p: str) -> str:
    return p.split("== Optimized Logical Plan ==", 1)[1] \
            .split("== Physical Plan ==", 1)[0]


def test_analyze_attaches_row_counts(spark, stats_tables):
    df = spark.sql(_SQL.format(o=stats_tables["orders"],
                               c=stats_tables["customer"],
                               n=stats_tables["nation"]))
    opt = _optimized(explain_str(df, "cost"))
    # Every analyzed relation carries a rowCount estimate into the plan.
    assert opt.count("rowCount=") >= 3


def test_cbo_reorders_join_with_stats(spark, stats_tables):
    """Written join order is (orders x customer) x nation.  With column
    stats, CostBasedJoinReorder joins customer x nation FIRST (145-row
    intermediate) before touching the 10x-larger orders; without stats
    (path-based temp views) the rule skips and the syntactic order
    stands.  This is the observable difference the reference gets from
    sample-based cardinality estimation."""
    register_views(spark, SF_DIR, _TABLES)
    statless = _optimized(explain_str(
        spark.sql(_SQL.format(o="orders", c="customer", n="nation")),
        "cost"))
    stats = _optimized(explain_str(
        spark.sql(_SQL.format(o=stats_tables["orders"],
                              c=stats_tables["customer"],
                              n=stats_tables["nation"])), "cost"))

    def depth_order(plan: str, names) -> list[str]:
        # deeper in the tree string = joined earlier
        return sorted(names, key=lambda t: plan.rfind(t))

    assert depth_order(statless, ["orders", "customer", "nation"]) \
        == ["customer", "orders", "nation"]
    assert depth_order(stats, [stats_tables["orders"],
                               stats_tables["customer"],
                               stats_tables["nation"]]) \
        == [stats_tables["customer"], stats_tables["nation"],
            stats_tables["orders"]]
    assert "rowCount=" not in statless   # the statless path has no CBO input
