"""Plan assertions for the tranche-2 decorrelation pack
(queries/dsq2.py): the q95 double-membership shape must plan semi
joins over the shared CTE, the q4/q11 four-way CTE self-join must stay
equi (no cartesian), the q17 chain must join pre-aggregated per-customer
slices, and both JOB chains must be pure equi-join trees with pushed
filters — never a cartesian or per-row subquery."""

from __future__ import annotations

from conftest import SF_DIR, explain_str

from lingo_db_spark.queries import load_all

REG = load_all()

NEW = ["ds_double_exists_shared_cte", "ds_year_total_ratio",
       "ds_quantity_chain_stats", "job_ten_way_min_chain",
       "job_mixed_predicate_chain"]


def _plans(spark, name):
    df = REG[name].spark_fn(spark, SF_DIR)
    ext = explain_str(df, "extended")
    opt = ext.split("== Optimized Logical Plan ==", 1)[1]
    return opt.split("== Physical Plan ==", 1)[0], ext


def test_no_cartesians_anywhere(spark):
    for name in NEW:
        _, ext = _plans(spark, name)
        assert "CartesianProduct" not in ext, name
        assert "BroadcastNestedLoopJoin" not in ext, name


def test_double_exists_plans_semi_joins(spark):
    opt, _ = _plans(spark, "ds_double_exists_shared_cte")
    # both IN-memberships become semi joins (the optimizer may push
    # extra semi copies down the join tree; never fewer than the two)
    assert opt.count("LeftSemi") >= 2
    assert "correlated" not in opt.lower()


def test_year_total_four_way_all_equi_and_cached(spark):
    opt, ext = _plans(spark, "ds_year_total_ratio")
    # four consumers of the CTE joined on cust — every join is equi,
    # and all four read the persisted year_total (one fact scan total,
    # not eight pushed-down rescans)
    assert "Join Inner" in opt
    assert "CartesianProduct" not in ext
    df = REG["ds_year_total_ratio"].spark_fn(spark, SF_DIR)
    p = explain_str(df, "simple")
    # all four consumers read the cache (the FileScan lines still in the
    # printout are the InMemoryRelation's cached-definition child, which
    # executes once on first materialization)
    assert p.count("InMemoryTableScan") >= 4 or "TableCacheQueryStage" in p


def test_quantity_chain_joins_preaggregated_slices(spark):
    opt, _ = _plans(spark, "ds_quantity_chain_stats")
    # each slice is aggregated per customer BEFORE the chain join: the
    # optimized plan has the three slice aggregates below the joins
    # (aggregate-through-fact-chain — the q64 scale lesson)
    agg_q = opt.count("Aggregate [o_custkey")
    assert agg_q >= 3, opt[:2000]


def test_job_chains_broadcast_dims_probe_lineitem(spark):
    for name in ["job_ten_way_min_chain", "job_mixed_predicate_chain"]:
        df = REG[name].spark_fn(spark, SF_DIR)
        p = explain_str(df, "formatted")
        # dims broadcast; lineitem is never the build side of a
        # broadcast (it is the scaling fact)
        assert "BroadcastHashJoin" in p, name
        assert "CartesianProduct" not in p, name


def test_year_total_products_are_decimal128(spark):
    # the ratio compare must evaluate in decimal, not int64 (which wraps
    # silently in Spark with ANSI off past ~1e18 micros-products)
    df = REG["ds_year_total_ratio"].spark_fn(spark, SF_DIR)
    ext = explain_str(df, "extended")
    assert "decimal(19,0)" in ext


def test_fullouter_cumulative_single_sort_per_window(spark):
    df = REG["ds_fullouter_cumulative_compare"].spark_fn(spark, SF_DIR)
    p = explain_str(df, "formatted")
    assert "FullOuter" in p or "SortMergeJoin" in p
    assert "CartesianProduct" not in p


def test_returns_excluded_plans_anti_semantics(spark):
    opt, ext = _plans(spark, "ds_returns_excluded_ratio")
    # LEFT JOIN ... WHERE right-key IS NULL: either the LeftAnti rewrite
    # or the equi LeftOuter with the isnull filter directly above it
    # (same shuffle/join cost; this Spark version keeps the outer form).
    # What must NOT happen: the filter separated from the join by other
    # operators (full outer materialization), or a cartesian.
    if "LeftAnti" not in opt:
        assert "Filter isnull" in opt and "Join LeftOuter" in opt
        between = opt.split("Filter isnull", 1)[1].split("Join LeftOuter")[0]
        assert between.count("\n") <= 2, between
    assert "CartesianProduct" not in ext


def test_round5_late_shapes_no_cartesian(spark):
    for name in ["ds_intersect_in_membership", "ds_scalar_range_bounds",
                 "ds_rank_position_join"]:
        _, ext = _plans(spark, name)
        assert "CartesianProduct" not in ext, name
        assert "BroadcastNestedLoopJoin" not in ext, name


def test_rank_position_window_over_aggregate_not_fact(spark):
    opt, _ = _plans(spark, "ds_rank_position_join")
    # the global-order windows must sit ABOVE the per-supplier aggregate
    # (dimension-sized input), never over raw lineitem rows
    agg_pos = opt.index("Aggregate [l_suppkey")
    win_pos = opt.index("Window [row_number()")
    assert win_pos < agg_pos  # window is an ancestor in the printed tree
