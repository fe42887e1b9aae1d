"""The reference's SQL-frontend syntax gate, run END-TO-END: every
statement of test/lit/SQL/syntax.sql (the reference's parse-only lit
test for its bison grammar, parser.y) executes — not just parses —
through the Connection door, after loading the reference's own
resources/sql/test/initialize.sql fixture verbatim.

Parse-level dialect gaps are closed inside Connection.sql itself
(lingo_db_spark/dialect.py): quantified ANY/ALL/SOME comparisons,
postgres cast type names, and pipe-SQL stages Spark's native |>
rejects (AGGREGATE ... GROUP BY ROLLUP) — each rewrite class
value-checked by the select-corpus sweep."""

from __future__ import annotations

from pathlib import Path

import pytest

from lingo_db_spark import ddl
from lingo_db_spark.connection import Connection

SYNTAX = Path("/root/reference/test/lit/SQL/syntax.sql")
TEST_INIT = Path("/root/reference/resources/sql/test/initialize.sql")


@pytest.mark.skipif(not SYNTAX.exists(), reason="reference absent")
def test_syntax_sql_all_statements_execute(spark, tmp_path):
    (tmp_path / "t.csv").write_text(
        "s|1.5|2.5|3.10|4|5|true|1996-01-02|1996-01-02 13:37:00|x|yyyy\n")
    con = Connection(spark)
    con.run_script(TEST_INIT.read_text())       # verbatim fixture
    con.base_dir = str(tmp_path)                # anchors the COPY stmt
    stmts = ddl.split_script(SYNTAX.read_text())
    assert len(stmts) == 77
    failures = []
    for s in stmts:
        try:
            if ddl.is_query(s):
                con.sql(s).collect()
            else:
                con.sql_stmt(s)
        except Exception as e:      # noqa: BLE001
            failures.append((s[:80], str(e).splitlines()[:1]))
    assert failures == []


def test_quantified_rewrite_fromless_forms(spark):
    """syntax.sql's FROM-less quantified comparisons go through the
    generalized rewrite (membership forms need no FROM split; residual
    forms wrap the body as a one-column derived table)."""
    con = Connection(spark)
    assert con.sql("select 1=any(select 1) as v").collect()[0].v is True
    assert con.sql("select 1=all(select 1) as v").collect()[0].v is True
    assert con.sql("select 2>all(select 1) as v").collect()[0].v is True
    assert con.sql("select 1>any(select 1) as v").collect()[0].v is False


def test_pipe_rollup_fallback(spark):
    """|> AGGREGATE ... GROUP BY ROLLUP is a ParseException in Spark's
    native pipe support; the door falls back to the standard-SQL
    translation with rollup keys expanded in the select list."""
    con = Connection(spark)
    rows = con.sql(
        "from (values (1,2,3)) t(x,y,z)\n"
        " |> AGGREGATE sum(z) group by rollup(x,y)").collect()
    assert len(rows) == 3           # (1,2), (1,NULL), (NULL,NULL)
    assert con.last_rewritten_sql is not None


def test_quoted_ident_shim_units():
    """Postgres double-quoted identifiers -> backticks, never inside
    string literals; doubled quotes unescape (parser.y quoted-ident
    lexing; exercised end-to-end by resources/sql/tpch/11.sql)."""
    from lingo_db_spark.dialect import quoted_ident_shim as q
    assert q('select sum(x) as "value" from t') == \
        "select sum(x) as `value` from t"
    # double quotes inside a string literal stay untouched
    assert q("select '\"quoted\"' as s") == "select '\"quoted\"' as s"
    # escaped '' inside the literal does not end the literal
    assert q("select 'it''s \"fine\"' , \"c\" from t") == \
        "select 'it''s \"fine\"' , `c` from t"
    # doubled "" inside an identifier is a literal quote char
    assert q('select "a""b" from t') == 'select `a"b` from t'


def test_quoted_shim_gated_on_parse(spark):
    """The quoted-identifier shim only fires when the OTHER parse shims
    alone still fail Spark's grammar: a query whose parse failure is an
    unrelated `= ANY(...)` keeps its double-quoted spans as the string
    literals Spark takes them for — even when a same-named column
    exists that the identifier reading would silently bind to."""
    con = Connection(spark)
    spark.sql("select 'COLUMN_VALUE' as hello") \
        .createOrReplaceTempView("shimgate_t")
    row = con.sql(
        'select "hello" as s, 1 = any(select 1) as v from shimgate_t'
    ).collect()[0]
    assert row.s == "hello"          # string literal, not the column
    assert row.v is True
    # and the identifier reading still fires when it IS the only way
    # the query parses (a double-quoted ALIAS is a Spark parse error)
    row2 = con.sql(
        'select hello as "out col" from shimgate_t').collect()[0]
    assert row2["out col"] == "COLUMN_VALUE"


def test_cast_alias_anchoring():
    """Postgres cast type names are rewritten ONLY in the tail of a
    balanced CAST(...) span — an alias named text/int4 immediately
    before ')' (e.g. a one-column subquery) is never touched."""
    from lingo_db_spark.dialect import apply_analysis_shims as sh
    assert sh("select (select x as text) from t") == \
        "select (select x as text) from t"
    assert sh("select CAST(x AS text) from t") == \
        "select CAST(x AS STRING) from t"
    # nested: inner alias untouched, outer cast rewritten
    assert sh("CAST((SELECT x AS text) AS int4)") == \
        "CAST((SELECT x AS text) AS INT)"
    # nested cast inside a cast: both rewritten
    assert sh("CAST(CAST(a AS float8) AS int8)") == \
        "CAST(CAST(a AS DOUBLE) AS BIGINT)"
    # function call in the operand does not confuse the level check
    assert sh("CAST(substr(a, 1, 2) AS float4)") == \
        "CAST(substr(a, 1, 2) AS FLOAT)"
    # non-alias types and unbalanced input pass through unchanged
    assert sh("CAST(x AS DECIMAL(10,2))") == "CAST(x AS DECIMAL(10,2))"
    assert sh("CAST(x AS text") == "CAST(x AS text"


def test_pipe_where_after_aggregate_is_having(spark):
    """A |> WHERE stage AFTER an AGGREGATE stage filters the aggregated
    rows (pipe semantics are sequential): for ROLLUP the fallback
    translation must route it to HAVING — a pre-aggregation WHERE
    would keep the grand-total row this filter is meant to drop."""
    from lingo_db_spark.dialect import pipe_to_standard
    q = pipe_to_standard(
        "from t |> aggregate sum(z) as s group by rollup(x) "
        "|> where x is not null")
    assert "HAVING" in q.upper()
    con = Connection(spark)
    rows = con.sql(
        "from (values (1,2),(1,3),(2,4)) t(x,z)\n"
        " |> AGGREGATE sum(z) as s group by rollup(x)\n"
        " |> where x is not null").collect()
    assert sorted((r.x, r.s) for r in rows) == [(1, 5), (2, 4)]


def test_lateralize_scope():
    """lateralize only rewrites FROM-list derived tables (preceded by a
    comma or the FROM keyword) that reference the sibling alias — never
    function arguments, IN-lists, or derived tables that don't mention
    the alias.  A mis-placed insertion is recoverable (the caller
    retries and falls back to the original error on failure), but the
    conservative scope keeps the retry from ever changing semantics."""
    from lingo_db_spark.dialect import lateralize
    # FROM-list sibling: rewritten
    q = "select * from t, (select x from u where u.k = t.k) s"
    assert "LATERAL (select x" in lateralize(q, "t")
    # function argument parens: untouched
    q2 = "select coalesce((select max(x) from u where u.k = t.k), 0) from t"
    assert lateralize(q2, "t") == q2
    # IN-list subquery (preceded by IN, not comma/FROM): untouched
    q3 = "select * from t where t.k in (select k from u where u.k = t.k)"
    assert lateralize(q3, "t") == q3
    # derived table NOT referencing the alias: untouched
    q4 = "select * from t, (select x from u) s where s.x = t.k"
    assert lateralize(q4, "t") == q4
    # idempotent: the inserted LATERAL keyword now precedes the '(' so
    # a second pass leaves the text alone (retry convergence)
    once = lateralize(q, "t")
    assert lateralize(once, "t") == once


def test_verbatim_q11_through_door(spark):
    """The reference's own 11.sql text (double-quoted alias) parses and
    runs through Connection.sql via the shim retry."""
    from pathlib import Path
    p = Path("/root/reference/resources/sql/tpch/11.sql")
    if not p.exists():
        pytest.skip("reference absent")
    from lingo_db_spark.queries.sqlfront import sql_tpch11_verbatim
    rows = sql_tpch11_verbatim(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    assert rows[0].value_cents > 0
