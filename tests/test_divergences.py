"""The engine-divergence contract: every place Spark and DuckDB/postgres
(the reference's execution semantics) legitimately disagree, witnessed
with a value-checked example of BOTH behaviors plus the mechanism this
repo uses to pin reference semantics where parity matters.

The divergences (each discovered by a real query in an earlier round):

| divergence            | Spark                 | DuckDB/postgres      | pin |
|-----------------------|-----------------------|----------------------|-----|
| decimal -> int cast   | truncates toward zero | rounds half away     | functions.cast_int_rounded (DS q78) |
| ROLLUP on empty input | 0 rows                | grand-total row      | oracle SQL avoids rollup-on-empty; witnessed |
| ORDER BY NULL default | ASC = NULLS FIRST     | ASC = NULLS LAST     | explicit NULLS LAST / asc_nulls_last in ordered outputs |
| LIMIT across ties     | underdetermined set   | underdetermined set  | tie-breaking sort keys; counts always agree |
| correlated EXISTS w/ NULL non-eq cmp | standard: no witness | DuckDB 1.0.0 EXISTS says TRUE (mark-join) | spec evaluator oracle in test_exists_rewrite_property; witnessed below |
"""

from __future__ import annotations

import duckdb

from lingo_db_spark import functions as fn


def test_decimal_to_int_cast_divergence(spark):
    duck = duckdb.connect()
    want = duck.execute(
        "SELECT CAST(CAST(2.5 AS DECIMAL(3,1)) AS INTEGER), "
        "CAST(CAST(-2.5 AS DECIMAL(3,1)) AS INTEGER)").fetchone()
    assert want == (3, -3)            # reference: round half away
    got = spark.sql(
        "SELECT CAST(CAST(2.5 AS DECIMAL(3,1)) AS INT), "
        "CAST(CAST(-2.5 AS DECIMAL(3,1)) AS INT)").first()
    assert tuple(got) == (2, -2)      # Spark: truncate toward zero
    # the door helper restores reference semantics
    pinned = spark.sql(
        "SELECT CAST(2.5 AS DECIMAL(3,1)) AS a, "
        "CAST(-2.5 AS DECIMAL(3,1)) AS b") \
        .select(fn.cast_int_rounded("a"), fn.cast_int_rounded("b")).first()
    assert tuple(pinned) == (3, -3)


def test_rollup_empty_input_divergence(spark):
    duck = duckdb.connect()
    want = duck.execute(
        "SELECT x, COUNT(*) FROM (SELECT 1 AS x WHERE false) "
        "GROUP BY ROLLUP(x)").fetchall()
    assert want == [(None, 0)]        # DuckDB: grand-total row survives
    got = spark.sql(
        "SELECT x, COUNT(*) FROM (SELECT 1 AS x WHERE false) "
        "GROUP BY ROLLUP(x)").collect()
    assert got == []                  # Spark: empty input, empty output
    # non-empty input: identical multisets — the divergence is ONLY the
    # empty-input grand total
    q = ("SELECT x, COUNT(*) AS c FROM (SELECT 1 AS x UNION ALL "
         "SELECT 2) t GROUP BY ROLLUP(x)")
    key = lambda r: (r[0] is None, r[0], r[1])  # noqa: E731
    assert sorted((tuple(r) for r in spark.sql(q).collect()), key=key) \
        == sorted(duck.execute(q).fetchall(), key=key)


def test_nulls_ordering_default_divergence(spark):
    duck = duckdb.connect()
    vals = "(VALUES (1), (NULL), (2)) t(v)"
    assert duck.execute(
        f"SELECT v FROM {vals} ORDER BY v").fetchall() == \
        [(1,), (2,), (None,)]         # DuckDB ASC default: NULLS LAST
    got = [r[0] for r in spark.sql(
        f"SELECT v FROM {vals} ORDER BY v").collect()]
    assert got == [None, 1, 2]        # Spark ASC default: NULLS FIRST
    # the pin: explicit NULLS LAST makes Spark match the reference
    pinned = [r[0] for r in spark.sql(
        f"SELECT v FROM {vals} ORDER BY v NULLS LAST").collect()]
    assert pinned == [1, 2, None]


def test_tied_limit_cut_divergence(spark):
    """LIMIT across tied sort keys selects an UNDERDETERMINED subset in
    both engines (each may cut a tie group differently); the contract
    is that row counts and the tie-broken ordering agree."""
    duck = duckdb.connect()
    vals = ("(VALUES (1, 'a'), (1, 'b'), (1, 'c'), (2, 'd')) t(k, s)")
    q = f"SELECT k, s FROM {vals} ORDER BY k LIMIT 2"
    got = spark.sql(q).collect()
    want = duck.execute(q).fetchall()
    assert len(got) == len(want) == 2
    assert all(r[0] == 1 for r in got) and all(r[0] == 1 for r in want)
    # tie-breaking key restores full determinism — the repo's pin for
    # every LIMIT-bearing ordered output
    qd = f"SELECT k, s FROM {vals} ORDER BY k, s LIMIT 2"
    assert [tuple(r) for r in spark.sql(qd).collect()] == \
        duck.execute(qd).fetchall() == [(1, "a"), (1, "b")]


def test_correlated_exists_null_noneq_divergence(spark):
    """DuckDB 1.0.0's correlated EXISTS with a NULL non-equality
    comparison diverges from the standard (its own count(*) of the
    identical subquery disagrees with its EXISTS); Spark implements
    the standard reading.  Found by hypothesis while property-testing
    the r11 monotone-EXISTS rewrite — which is why that test's oracle
    is a spec evaluator, not DuckDB's EXISTS."""
    duck = duckdb.connect()
    duck.execute("CREATE TABLE t (k INTEGER, a INTEGER)")
    duck.execute("CREATE TABLE o (k INTEGER, e INTEGER)")
    duck.execute("INSERT INTO t VALUES (0, 0)")
    duck.execute("INSERT INTO o VALUES (0, NULL)")
    q_exists = ("select exists(select * from {t} where {t}.k = o.k "
                "and {t}.a != o.e) from {o} o")
    q_count = ("select (select count(*) from {t} where {t}.k = o.k "
               "and {t}.a != o.e) from {o} o")
    assert duck.execute(q_exists.format(t="t", o="o")).fetchone()[0] \
        is True                                   # the divergence
    assert duck.execute(q_count.format(t="t", o="o")).fetchone()[0] == 0
    spark.createDataFrame([(0, 0)], "k INT, a INT") \
        .createOrReplaceTempView("div_t")
    spark.createDataFrame([(0, None)], "k INT, e INT") \
        .createOrReplaceTempView("div_o")
    got = spark.sql(q_exists.format(t="div_t", o="div_o")).collect()
    assert got[0][0] is False                     # standard reading
