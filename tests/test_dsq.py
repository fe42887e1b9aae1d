"""Plan assertions for the decorrelation pack (queries/dsq.py): Catalyst
must rewrite every correlated subquery into joins + aggregates — the
Spark rendering of the reference's unnesting pass
(src/compiler/Dialect/RelAlg/Transforms/Unnesting.cpp:18-333) — never a
per-outer-row re-execution, and never a cartesian over scaling tables.
"""

from __future__ import annotations

from conftest import SF_DIR, explain_str

from lingo_db_spark.queries import load_all

REG = load_all()


def _plans(spark, name):
    df = REG[name].spark_fn(spark, SF_DIR)
    ext = explain_str(df, "extended")
    optimized = ext.split("== Optimized Logical Plan ==", 1)[1]
    physical = optimized.split("== Physical Plan ==", 1)
    return optimized.split("== Physical Plan ==", 1)[0], ext


def test_correlated_avg_threshold_decorrelates_to_join(spark):
    opt, _ = _plans(spark, "ds_correlated_avg_threshold")
    # The correlated COUNT/SUM become aggregates joined to the outer CTE:
    # no correlated predicate survives optimization.
    assert "Join" in opt and "Aggregate" in opt
    assert "correlated" not in opt.lower()


def test_above_category_avg_single_aggregate_not_rescan(spark):
    opt, ext = _plans(spark, "ds_above_category_avg")
    # Decorrelated: part grouped by p_type once, joined back.
    assert "Aggregate [p_type" in opt
    assert "correlated" not in opt.lower()


def test_exists_under_or_plans_existence_joins(spark):
    opt, _ = _plans(spark, "ds_exists_under_or")
    # Disjunctive EXISTS must become mark/existence joins feeding the OR
    # (the reference's relalg.markjoin), not semi joins (which would
    # conjoin) and not per-row subqueries.
    assert opt.count("ExistenceJoin") == 2
    assert "correlated" not in opt.lower()


def test_exists_notexists_plans_semi_and_anti(spark):
    opt, _ = _plans(spark, "ds_exists_notexists")
    assert "LeftSemi" in opt and "LeftAnti" in opt


def test_year_total_cte_reused_via_cache(spark):
    df = REG["ds_year_total_cte_reuse"].spark_fn(spark, SF_DIR)
    p = explain_str(df, "simple")
    # The persisted year_total CTE must serve every consumer from cache:
    # the customer-join-orders aggregation is computed once.
    assert "InMemoryTableScan" in p or "TableCacheQueryStage" in p


def test_window_over_join_partitions_by_nation(spark):
    df = REG["ds_window_over_join"].spark_fn(spark, SF_DIR)
    p = explain_str(df, "formatted")
    # Both window functions share one partitioning — a single Window
    # exchange on n_name, never an empty PARTITION BY.
    assert "Window" in p
    assert "windowspecdefinition(n_name" in explain_str(df, "extended")


def test_no_cartesian_in_pack(spark):
    # The only broadcast-nested-loop allowed is a 1-row cohort broadcast
    # (ds_year_total_cte_reuse) — scaling-table cartesians are bugs.
    for name in ("ds_correlated_avg_threshold", "ds_above_category_avg",
                 "ds_exists_under_or", "ds_exists_notexists",
                 "ds_channels_rollup", "ds_intersect_years"):
        df = REG[name].spark_fn(spark, SF_DIR)
        p = explain_str(df, "simple")
        assert "CartesianProduct" not in p, name


# --- round-4 additions (shapes 13-22) --------------------------------------


def test_time_band_counts_eight_independent_scans(spark):
    df = REG["ds_time_band_counts"].spark_fn(spark, SF_DIR)
    p = explain_str(df, "simple")
    # Eight independent band scans of the fact join, crossed as 1-row
    # sides: BroadcastNestedLoop over single rows is the only legal form,
    # never CartesianProduct over scaling tables.
    assert p.count("Scan parquet [") >= 8 or p.count("FileScan") >= 8
    assert "CartesianProduct" not in p


def test_two_snapshot_in_subquery_plans_semi_join(spark):
    opt, _ = _plans(spark, "ds_two_snapshot_self_join")
    assert "LeftSemi" in opt
    assert "correlated" not in opt.lower()


def test_windowed_deviation_partitions_windows_by_nation(spark):
    df = REG["ds_windowed_deviation"].spark_fn(spark, SF_DIR)
    ext = explain_str(df, "extended")
    # Both window families partition on n_name (no empty PARTITION BY);
    # lag/lead share the (n_name) ordering spec.
    assert "windowspecdefinition(n_name" in ext
    assert "windowspecdefinition()" not in ext


def test_rollup_rank_plans_expand_and_window(spark):
    df = REG["ds_rollup_hierarchy_rank"].spark_fn(spark, SF_DIR)
    p = explain_str(df, "simple")
    # ROLLUP lowers to Expand; the rank is one Window over the rollup
    # output partitioned by the GROUPING()-derived keys.
    assert "Expand" in p
    assert "Window" in p


def test_crosschannel_ratio_is_left_outer(spark):
    opt, _ = _plans(spark, "ds_crosschannel_ratio")
    assert "LeftOuter" in opt


def test_returns_adjusted_bottomk_is_topk(spark):
    df = REG["ds_returns_adjusted_bottomk"].spark_fn(spark, SF_DIR)
    p = explain_str(df, "simple")
    # ORDER BY + LIMIT must plan as top-k (TakeOrderedAndProject), never
    # a global sort followed by a limit.
    assert "TakeOrderedAndProject" in p


def test_union_in_subquery_plans_semi_over_union(spark):
    opt, _ = _plans(spark, "ds_union_in_subquery")
    assert "LeftSemi" in opt
    assert "Union" in opt


def test_no_cartesian_in_round4_shapes(spark):
    for name in ("ds_two_snapshot_self_join", "ds_windowed_deviation",
                 "job_like_cascade_minagg", "job_disjunctive_like_chain",
                 "ds_rollup_hierarchy_rank", "ds_crosschannel_ratio",
                 "ds_returns_adjusted_bottomk", "ds_union_in_subquery",
                 "ds_having_count_band"):
        df = REG[name].spark_fn(spark, SF_DIR)
        p = explain_str(df, "simple")
        assert "CartesianProduct" not in p, name


# --- round-4 second wave (shapes 23-30) ------------------------------------


def test_notexists_or_cascade_plans_anti_join(spark):
    opt, _ = _plans(spark, "ds_notexists_or_cascade")
    assert "LeftAnti" in opt
    assert "correlated" not in opt.lower()


def test_scalar_cte_gates_plan_two_semi_joins(spark):
    opt, _ = _plans(spark, "ds_scalar_cte_gates")
    # Both IN gates decorrelate to semi joins; the nested scalar
    # threshold becomes a subquery stage, not a per-row rescan.
    assert opt.count("LeftSemi") == 2
    assert "correlated" not in opt.lower()


def test_revenue_share_window_partitions_by_type(spark):
    df = REG["ds_revenue_share_window"].spark_fn(spark, SF_DIR)
    ext = explain_str(df, "extended")
    assert "windowspecdefinition(p_type" in ext
    assert "windowspecdefinition()" not in ext


def test_no_cartesian_in_round4_wave2(spark):
    for name in ("ds_qoq_growth_channels", "ds_notexists_or_cascade",
                 "ds_conditional_count_band", "ds_week_shift_self_join",
                 "ds_avg_deviation_topk", "ds_three_channel_union",
                 "ds_scalar_cte_gates", "ds_revenue_share_window"):
        df = REG[name].spark_fn(spark, SF_DIR)
        p = explain_str(df, "simple")
        assert "CartesianProduct" not in p, name


def test_job_transitive_closure_no_cartesian(spark):
    p = explain_str(REG["job_transitive_equijoin_minagg"]
                    .spark_fn(spark, SF_DIR), "formatted")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the redundant l1.l_orderkey = l2.l_orderkey must not survive as a
    # post-join filter over a cross product: every join is hash-based
    assert "HashJoin" in p


def test_job_selfalias_two_nation_scans_no_cartesian(spark):
    p = explain_str(REG["job_selfalias_dim_reuse"]
                    .spark_fn(spark, SF_DIR), "formatted")
    assert "CartesianProduct" not in p
    # CBO may join the two LIKE-filtered nation ALIASES to each other
    # first on the <> predicate — a nested loop between two fixed-size
    # broadcast dims (25x25 max) is scale-safe; what must NOT happen is
    # a nested loop involving a scaling table, i.e. more than that one
    # (each physical node appears twice in formatted output: tree +
    # detail section).
    assert p.count("BroadcastNestedLoopJoin") <= 2
    assert p.count("nation.parquet") == 2, p[:3000]


def test_return_ratio_dual_rank_single_scan_two_windows(spark):
    p = explain_str(REG["ds_return_ratio_dual_rank"]
                    .spark_fn(spark, SF_DIR), "formatted")
    assert p.count("lineitem.parquet") == 1
    assert "Window" in p


def test_date_offset_lateness_pushes_date_range(spark):
    p = explain_str(REG["ds_date_offset_lateness"]
                    .spark_fn(spark, SF_DIR), "formatted")
    assert "GreaterThanOrEqual(o_orderdate" in p, p[:4000]
    assert "CartesianProduct" not in p
