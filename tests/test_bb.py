"""Plan + semantics assertions for the TPCx-BB-style pack
(queries/bb.py): the temporal-precedence join must be an equi-join with
a residual date predicate (never a nested loop over raw rows), the
regression is one scan + two aggregate levels, and the volatility band
is integer-exact.
"""

from __future__ import annotations

from conftest import SF_DIR, explain_str

from lingo_db_spark.queries import load_all

REG = load_all()

PACK = ["bb_rating_activity_scatter", "bb_click_precedes_purchase",
        "bb_category_trend_slope", "bb_returned_then_repurchased",
        "bb_value_volatility_band"]


def test_pack_registered_with_oracles():
    for name in PACK:
        assert REG[name].oracle is not None, name


def _physical(spark, name):
    return explain_str(REG[name].spark_fn(spark, SF_DIR), "formatted")


def test_precedence_join_is_equi_with_residual(spark):
    p = _physical(spark, "bb_click_precedes_purchase")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # the date inequality rides as a join condition on the user equi-join
    assert "(click_day" in p and "buy_day" in p, p[:4000]


def test_repurchase_join_no_nested_loop(spark):
    p = _physical(spark, "bb_returned_then_repurchased")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p


def test_trend_slope_two_level_aggregate_one_scan(spark):
    p = _physical(spark, "bb_category_trend_slope")
    assert p.count("events.parquet") == 1, p[:2000]
    # daily rollup then regression rollup
    assert p.count("HashAggregate") >= 2


def test_volatility_band_values(spark):
    rows = REG["bb_value_volatility_band"].spark_fn(spark, SF_DIR).collect()
    assert rows
    for r in rows[:50]:
        # the integer band condition implies std/mean > 1/2
        assert r.var_value > 0.25 * r.mean_value ** 2 * 0.99, r


def test_slope_n_days_covers_month(spark):
    rows = REG["bb_category_trend_slope"].spark_fn(spark, SF_DIR).collect()
    assert {r.cat for r in rows} >= {"click", "purchase", "view"}
    for r in rows:
        assert 25 <= r.n_days <= 31, r


def test_volatility_band_oracle_exact_at_sf0001(spark):
    """r14: the default oracle gate runs at sf0.01, which never hits a
    ROUND(double, 4) tie — sf0.001 does (two groups land within one
    double ulp of a .00005 boundary and Spark/DuckDB round() disagreed
    by 1e-4).  The presented mean/variance are now integer half-up, so
    the SAME SQL must agree bit-exactly on both engines at the SF that
    exposed the trap."""
    import duckdb

    spec = REG["bb_value_volatility_band"]
    srows = sorted(tuple(r) for r in spec.spark_fn(spark, SF_DIR).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/events.parquet')")
    drows = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert srows == drows
