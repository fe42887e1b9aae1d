"""Common-subtree elimination (plans/cse.py).

Mirrors the intent of the reference's CommonSubtreeElimination.cpp tests:
duplicated fragments are computed once, results are unchanged.
"""

from __future__ import annotations

import pytest
from conftest import SF_DIR, explain_str

from lingo_db_spark.plans.cse import (
    auto_persist_common_subtrees,
    find_repeated_subtrees,
    parse_ctes,
    persist_repeated_ctes,
    sql_with_cte_cse,
)


def _lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def test_selfjoin_aggregate_detected_and_substituted(spark):
    agg = _lineitem(spark).groupBy("l_suppkey").sum("l_quantity")
    q = agg.alias("a").join(agg.alias("b"), "l_suppkey")

    leaders = find_repeated_subtrees(q)
    assert len(leaders) == 1
    assert leaders[0].nodeName() == "Aggregate"

    expected = q.count()
    with auto_persist_common_subtrees(q) as scope:
        assert len(scope.fragments) == 1
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") == 2
        assert q.count() == expected
    # After unpersist, NEWLY planned queries no longer substitute (the old
    # Dataset's QueryExecution is memoized by Spark, so rebuild).
    agg2 = _lineitem(spark).groupBy("l_suppkey").sum("l_quantity")
    q2 = agg2.alias("a").join(agg2.alias("b"), "l_suppkey")
    plan = q2._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan


def test_independent_builds_match_via_canonicalization(spark):
    # Two SEPARATELY constructed identical fragments (different exprIds)
    # must still be recognized as one subtree.
    a = _lineitem(spark).filter("l_quantity > 25").groupBy("l_returnflag").count()
    b = _lineitem(spark).filter("l_quantity > 25").groupBy("l_returnflag").count()
    q = a.join(b.withColumnRenamed("count", "count2"), "l_returnflag")
    leaders = find_repeated_subtrees(q)
    assert len(leaders) == 1


def test_bare_scan_not_cached(spark):
    li = _lineitem(spark)
    q = li.alias("a").join(li.alias("b"), "l_orderkey").select("a.l_orderkey")
    assert find_repeated_subtrees(q) == []


def test_nondeterministic_fragment_skipped(spark):
    import pyspark.sql.functions as F

    agg = (
        _lineitem(spark)
        .withColumn("r", F.rand(7))
        .groupBy("l_returnflag")
        .count()
    )
    q = agg.alias("a").join(agg.alias("b"), "l_returnflag")
    assert find_repeated_subtrees(q) == []


def test_parse_ctes():
    parsed = parse_ctes(
        "WITH a AS (SELECT 1 AS x), b AS (SELECT x + 1 AS y FROM a) "
        "SELECT * FROM a JOIN b ON a.x < b.y"
    )
    assert parsed is not None
    ctes, main = parsed
    assert [n for n, _ in ctes] == ["a", "b"]
    assert main.startswith("SELECT * FROM a JOIN b")
    # non-WITH, recursive, and column-alias shapes fall back
    assert parse_ctes("SELECT 1") is None
    assert parse_ctes("WITH RECURSIVE r AS (SELECT 1) SELECT * FROM r") is None
    assert parse_ctes("WITH t(a) AS (SELECT 1) SELECT * FROM t") is None


def test_cte_reuse_materialized(spark):
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").createOrReplaceTempView(
        "cse_li"
    )
    sql = (
        "WITH per_supp AS (SELECT l_suppkey AS sk, SUM(l_quantity) AS q"
        "                  FROM cse_li GROUP BY l_suppkey) "
        "SELECT a.sk FROM per_supp a JOIN per_supp b ON a.sk = b.sk "
        "WHERE a.q >= b.q ORDER BY a.sk"
    )
    expected = [r.sk for r in spark.sql(sql).collect()]
    df, scope = sql_with_cte_cse(spark, sql)
    try:
        assert len(scope.fragments) == 1
        assert "InMemoryTableScan" in explain_str(df, "simple")
        assert [r.sk for r in df.collect()] == expected
    finally:
        scope.unpersist_all()


def test_cte_single_use_not_persisted(spark):
    spark.range(5).createOrReplaceTempView("cse_r5")
    df, scope = sql_with_cte_cse(
        spark, "WITH t AS (SELECT id FROM cse_r5) SELECT SUM(id) AS s FROM t"
    )
    try:
        assert scope.fragments == []
        assert df.collect()[0].s == 10
    finally:
        scope.unpersist_all()


def test_cte_string_literal_not_rewritten(spark):
    spark.range(3).createOrReplaceTempView("cse_r3")
    sql = (
        "WITH t AS (SELECT id FROM cse_r3) "
        "SELECT 't' AS lit, a.id FROM t a JOIN t b ON a.id = b.id ORDER BY a.id"
    )
    df, scope = sql_with_cte_cse(spark, sql)
    try:
        rows = df.collect()
        assert [r.lit for r in rows] == ["t", "t", "t"]
        assert [r.id for r in rows] == [0, 1, 2]
    finally:
        scope.unpersist_all()


def test_chained_cte_bodies_resolve(spark):
    spark.range(4).createOrReplaceTempView("cse_r4")
    # b references a; a is reused (by b and main) -> persisted; b used once.
    sql = (
        "WITH a AS (SELECT id, id * 2 AS d FROM cse_r4), "
        "b AS (SELECT SUM(d) AS sd FROM a) "
        "SELECT (SELECT sd FROM b) AS sd, COUNT(*) AS n FROM a"
    )
    df, scope = sql_with_cte_cse(spark, sql)
    try:
        assert len(scope.fragments) == 1
        row = df.collect()[0]
        assert (row.sd, row.n) == (12, 4)
    finally:
        scope.unpersist_all()


def test_cte_name_as_output_alias_kept(spark):
    # The CTE name doubles as an OUTPUT ALIAS and a qualifier: the
    # substitution must touch only the table-reference positions, not
    # the alias or the qualified refs (year_total/`AS revenue` pattern).
    spark.range(3).createOrReplaceTempView("cse_r3b")
    sql = (
        "WITH revenue AS (SELECT id, id * 10 AS amt FROM cse_r3b) "
        "SELECT revenue.id AS id, revenue.amt AS revenue "
        "FROM revenue JOIN revenue r2 ON revenue.id = r2.id "
        "ORDER BY revenue.id"
    )
    df, scope = sql_with_cte_cse(spark, sql)
    try:
        assert df.columns == ["id", "revenue"]
        assert [r.revenue for r in df.collect()] == [0, 10, 20]
    finally:
        scope.unpersist_all()


def test_cte_ambiguous_comma_bails(spark):
    # A bare occurrence of the CTE name right after a comma cannot be
    # proven a SELECT-list item vs a FROM-list table ref; the rewrite
    # must bail to plain execution (no views, no persists) and still
    # return a runnable statement.
    spark.range(3).createOrReplaceTempView("cse_r3c")
    sql = (
        "WITH t AS (SELECT id, id + 1 AS t FROM cse_r3c) "
        "SELECT a.id, t FROM t a ORDER BY a.id"
    )
    df, scope = sql_with_cte_cse(spark, sql)
    try:
        assert scope.fragments == [] and scope.views == []
        assert [r.t for r in df.collect()] == [1, 2, 3]
    finally:
        scope.unpersist_all()


def test_cte_repeated_run_is_cache_stable(spark):
    # Re-running the same CSE'd statement must not stack persists or
    # leak __cse_* temp views once the previous scope is drained.
    spark.range(4).createOrReplaceTempView("cse_r4b")
    sql = (
        "WITH p AS (SELECT id, SUM(id) OVER () AS s FROM cse_r4b) "
        "SELECT a.id FROM p a JOIN p b ON a.id = b.id ORDER BY a.id"
    )
    df1, scope1 = sql_with_cte_cse(spark, sql)
    df1.collect()
    scope1.unpersist_all()
    df2, scope2 = sql_with_cte_cse(spark, sql)
    try:
        assert [r.id for r in df2.collect()] == [0, 1, 2, 3]
        leftover = [t.name for t in spark.catalog.listTables()
                    if t.name.startswith("__cse_p_")]
        assert len(leftover) == len(scope2.views)
    finally:
        scope2.unpersist_all()
    assert not [t.name for t in spark.catalog.listTables()
                if t.name.startswith("__cse_p_")]
