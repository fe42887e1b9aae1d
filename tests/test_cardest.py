"""Sampling-based cardinality estimation (plans/cardest.py) — reference
QueryGraph.cpp:264-294 estimateUsingSample: predicate selectivity from a
bounded per-table sample, zero clamped to one sample row, feeding the
broadcast decision."""

from __future__ import annotations

from conftest import SF_DIR, explain_str
from pyspark.sql import functions as F

from lingo_db_spark.catalog import load_table
from lingo_db_spark.plans.cardest import SampledTable, _parse_bytes


def test_selectivity_tracks_true_fraction(spark):
    orders = load_table(spark, SF_DIR, "orders")
    st = SampledTable(orders, sample_rows=512)
    total = orders.count()
    pred = F.col("o_orderstatus") == "F"
    true_frac = orders.filter(pred).count() / total
    est = st.selectivity(pred)
    # a 512-row sample of a ~50% predicate: 3-sigma ~ 0.07
    assert abs(est - true_frac) < 0.1, (est, true_frac)
    assert abs(st.estimate_rows(pred) - true_frac * total) < 0.15 * total


def test_zero_matches_clamp_to_one_sample_row(spark):
    orders = load_table(spark, SF_DIR, "orders")
    st = SampledTable(orders, sample_rows=256)
    sel = st.selectivity(F.col("o_orderkey") < 0)   # impossible
    assert 0 < sel <= 1 / 100                        # 1/sample_n floor


def test_hint_broadcasts_selective_dimension(spark):
    cust = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    st = SampledTable(cust)
    pred = F.col("c_mktsegment") == "BUILDING"
    dim = st.hint(pred, threshold_bytes=10 << 20)
    plan = explain_str(orders.join(dim, orders.o_custkey == dim.c_custkey))
    assert "BroadcastHashJoin" in plan


def test_hint_refuses_oversized_estimate(spark):
    cust = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    st = SampledTable(cust)
    # 1-byte budget: nothing fits -> NO broadcast hint from the helper.
    dim = st.hint(F.col("c_mktsegment") == "BUILDING", threshold_bytes=1)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_str(
            orders.join(dim, orders.o_custkey == dim.c_custkey))
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_sample_is_bounded_and_reused(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    st = SampledTable(li, sample_rows=128)
    assert st.sample_n <= 128
    # repeated probes touch only the local sample (no base rescan):
    # cheap smoke — three probes return consistent monotone estimates
    a = st.estimate_rows(F.col("l_quantity") > 0)
    b = st.estimate_rows(F.col("l_quantity") > 25)
    c = st.estimate_rows(F.col("l_quantity") > 9999)
    assert a >= b >= c > 0


def test_parse_bytes():
    assert _parse_bytes("10485760") == 10 << 20
    assert _parse_bytes("10MB") == 10 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("512k") == 512 << 10
    assert _parse_bytes("-1") == -1


def test_misestimate_degrades_never_corrupts(spark):
    """Mis-estimate safety (SCALE.md round-8 probe, pinned here at CI
    scale): an estimate OVER the byte budget withholds the hint (the
    join strategy is left to Spark/AQE — performance degradation, not
    failure), and a lying-SMALL estimate that force-broadcasts a
    genuinely larger side still completes with values identical to the
    unhinted baseline — the hint can never change results."""
    cust = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    pred = F.col("c_mktsegment") == "BUILDING"

    st = SampledTable(cust)
    withheld = st.hint(pred, threshold_bytes=1)      # any estimate > 1 B
    assert "UnresolvedHint" not in \
        withheld._jdf.queryExecution().logical().toString()
    forced = SampledTable(cust, total_rows=1).hint(pred)
    assert "UnresolvedHint" in \
        forced._jdf.queryExecution().logical().toString()

    def agg(dim):
        return sorted(
            (r.o_orderpriority, r.n) for r in
            orders.join(dim, orders.o_custkey == dim.c_custkey)
            .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
            .collect())

    base = agg(cust.filter(pred))
    assert agg(withheld) == base
    assert agg(forced) == base
