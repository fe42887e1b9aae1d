"""Plan + semantics assertions for the SSB pack (queries/ssb.py): every
flight must plan as a broadcast-hash-join star — dims broadcast, the
lineorder fact streamed once, no cartesian / broadcast-nested-loop — the
Spark rendering of the reference's small-build-side fast path
(OptimizeImplementations.cpp:544-590) on the canonical star benchmark.
"""

from __future__ import annotations

from conftest import SF_DIR, explain_str

from lingo_db_spark.queries import load_all

REG = load_all()

FLIGHTS = [f"ssb_q{i}_{j}" for i, m in ((1, 3), (2, 3), (3, 4), (4, 3))
           for j in range(1, m + 1)]


def test_all_flights_registered_with_identical_string_oracle():
    for name in FLIGHTS:
        spec = REG[name]
        assert spec.oracle is not None
        # raw-SQL contract: the oracle IS the executed statement
        assert "lineorder" in spec.oracle and "WITH" in spec.oracle


def _physical(spark, name):
    df = REG[name].spark_fn(spark, SF_DIR)
    return explain_str(df, "formatted")


def test_widest_star_broadcasts_dims_shuffles_only_fact(spark):
    # Q4.1 joins all four dims: the dim joins must be broadcast-hash.
    # The only shuffle joins allowed are the lineorder DERIVATION join
    # (lineitem |><| orders — fact-fact, correctly co-partitioned, never
    # broadcast at scale) and dim_cust (built from customer, which the
    # optimizer may shuffle after its own geography broadcasts).
    p = _physical(spark, "ssb_q4_1")
    assert p.count("BroadcastHashJoin") >= 4, p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the fact table is scanned exactly once
    assert p.count("lineitem.parquet") == 1, p


def test_band_scan_pushes_quantity_filter_to_scan(spark):
    # Q1.1's lo_quantity < 25 predicate is on a raw lineitem column and
    # must reach the parquet scan as a pushed filter.
    p = _physical(spark, "ssb_q1_1")
    assert "PushedFilters" in p
    assert "LessThan(l_quantity" in p, p[:4000]


def test_flight3_no_cartesian_and_single_fact_scan(spark):
    p = _physical(spark, "ssb_q3_2")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("BroadcastHashJoin") >= 3


def test_q1_1_revenue_positive(spark):
    rows = REG["ssb_q1_1"].spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 1 and rows[0].revenue > 0


def test_part_hierarchy_derivation(spark):
    # brand -> mfgr/category functional dependency: Brand#12 belongs to
    # MFGR#3 (ceil(12/5)) category MFGR#32 ((12-1)%5+1 = 2).
    from lingo_db_spark.catalog import register_views
    register_views(spark, SF_DIR, ("part",))
    row = spark.sql(
        "SELECT 'MFGR#' || CAST(CAST(FLOOR((CAST(SUBSTR('Brand#12', 7) AS INT)"
        " - 1) / 5) + 1 AS INT) AS STRING) AS mfgr").collect()[0]
    assert row.mfgr == "MFGR#3"
