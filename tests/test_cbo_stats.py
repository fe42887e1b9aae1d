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


def test_bucketed_join_has_no_exchange(spark):
    """lineitem and orders bucketed by the join key: the join plan must
    contain NO Exchange on either side (bucket co-location replaces the
    shuffle), while the same join over plain path-based reads shuffles
    both sides."""
    from lingo_db_spark.catalog import load_table
    from lingo_db_spark.stats import materialize_bucketed
    lt = materialize_bucketed(spark, SF_DIR, "lineitem", "l_orderkey", 8,
                              table_name="bkt_li_t", overwrite=True)
    ot = materialize_bucketed(spark, SF_DIR, "orders", "o_orderkey", 8,
                              table_name="bkt_or_t", overwrite=True)
    # sf0.001 tables broadcast below the threshold, which would hide the
    # bucket co-location; pin the sort-merge path (the fact-to-fact shape
    # bucketing exists for — neither side broadcastable at 100 TB).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table(lt).join(
                spark.table(ot),
                spark.table(lt).l_orderkey == spark.table(ot).o_orderkey)
             .groupBy("o_orderpriority").count())
        p = explain_str(j, "formatted")
        # The only Exchange allowed is the groupBy's, ABOVE the join:
        # neither join input shuffles (bucket co-location).
        assert "SortMergeJoin" in p
        n_bucketed = p.count("+- Exchange") + p.count("   Exchange (")
        plain = (load_table(spark, SF_DIR, "lineitem").join(
                    load_table(spark, SF_DIR, "orders"),
                    load_table(spark, SF_DIR, "lineitem").l_orderkey
                    == load_table(spark, SF_DIR, "orders").o_orderkey)
                 .groupBy("o_orderpriority").count())
        pp = explain_str(plain, "formatted")
        n_plain = pp.count("+- Exchange") + pp.count("   Exchange (")
        # plain: 2 join-input shuffles + 1 agg shuffle; bucketed: agg only.
        assert n_bucketed == 1, f"expected only the agg exchange: {p}"
        assert n_plain >= 3, pp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_li_t")
        spark.sql("DROP TABLE IF EXISTS bkt_or_t")
