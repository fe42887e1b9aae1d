"""Plan assertions for the ClickBench-style pack (queries/cbench.py):
single-scan aggregation queries must stay map-side-partial + top-k —
never a global sort of pre-limit aggregate output, never a second scan.
"""

from __future__ import annotations

from conftest import SF_DIR, explain_str

from lingo_db_spark.queries import load_all

REG = load_all()

PACK = ["cb_scalar_aggregates", "cb_count_distinct", "cb_top_groups",
        "cb_regex_dimension_agg",
        "cb_pair_groups", "cb_like_filtered_agg", "cb_wide_sums",
        "cb_const_group", "cb_daily_traffic", "cb_minute_series",
        "cb_point_filter_topk"]


def test_pack_registered_with_oracles():
    for name in PACK:
        assert REG[name].oracle is not None, name


def _physical(spark, name):
    return explain_str(REG[name].spark_fn(spark, SF_DIR), "formatted")


def test_top_groups_plans_take_ordered_not_global_sort(spark):
    p = _physical(spark, "cb_top_groups")
    assert "TakeOrderedAndProject" in p, p[:3000]
    assert "HashAggregate" in p


def test_point_filter_pushes_predicates(spark):
    p = _physical(spark, "cb_point_filter_topk")
    assert "PushedFilters" in p
    assert "EqualTo(event_type,purchase)" in p, p[:4000]
    assert "GreaterThan(value" in p


def test_daily_traffic_pushes_timestamp_range(spark):
    p = _physical(spark, "cb_daily_traffic")
    # the ts range predicate must reach the parquet scan
    assert "GreaterThanOrEqual(ts" in p, p[:4000]


def test_wide_sums_single_scan_single_stage(spark):
    p = _physical(spark, "cb_wide_sums")
    # one scan node (it appears once in the tree and once in the detail
    # section of the formatted output), partial agg before the exchange
    assert p.count("Scan parquet") == 2, p[:2000]
    assert "partial_sum" in p and "HashAggregate" in p
    # only the single-row partials cross the wire
    assert "SinglePartition" in p


def test_minute_series_values(spark):
    rows = REG["cb_minute_series"].spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    # strictly increasing minutes, page offset applied
    ms = [r.m for r in rows]
    assert ms == sorted(ms) and len(set(ms)) == 10
