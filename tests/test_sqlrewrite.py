"""Unit pins for lingo_db_spark/sqlrewrite.py — the SELECT-list
decorrelation hoist.  String-level (no Spark session): each case pins
the exact rewritten SQL for one separable shape, plus the must-NOT-
rewrite cases (non-separable mixes return the input unchanged so the
caller re-raises Catalyst's error instead of running wrong SQL).
Value-level correctness is covered by the corpus gate
(tools/sqllogic.py over sqlite-small: every rewrite output is compared
against the reference corpus's expected rows) and by
tests/test_extensions.py::test_connection_sql_decorrelates_select_list.
"""

from __future__ import annotations

from lingo_db_spark.sqlrewrite import decorrelate_select_list as d


def test_min_additive_outer_hoists():
    out = d("SELECT i, (SELECT MIN(i+2*i1.i) FROM integers) "
            "FROM integers i1 ORDER BY i")
    assert out == ("SELECT i, ((SELECT min(i) FROM integers) + (2*i1.i)) "
                   "FROM integers i1 ORDER BY i")


def test_plain_outer_term_guards_empty_input():
    out = d("SELECT i, (SELECT MIN(i)+i1.i FROM integers WHERE i>i1.i) "
            "FROM integers i1")
    assert "(SELECT MIN(i) FROM integers WHERE i>i1.i)" in out
    assert ("CASE WHEN COALESCE((SELECT COUNT(*) FROM integers "
            "WHERE i>i1.i), 0) = 0" in out)


def test_group_by_constant_becomes_having():
    out = d("SELECT i, (SELECT COUNT(*) FROM integers i2 "
            "WHERE i2.i>i1.i GROUP BY i1.i) FROM integers i1")
    assert "GROUP BY i1.i" not in out
    assert "HAVING COUNT(*) > 0" in out


def test_sum_of_pure_outer_multiplies_count():
    out = d("SELECT (SELECT SUM(i)+SUM(i1.i) FROM integers) "
            "FROM integers i1")
    assert "(SELECT SUM(i) FROM integers)" in out
    assert "(i1.i) * COALESCE((SELECT COUNT(*) FROM integers), 0)" in out


def test_sum_mixed_additive_uses_count_of_inner():
    out = d("SELECT (SELECT SUM(i + i1.i) FROM integers) FROM integers i1")
    assert "(SELECT sum(i) FROM integers)" in out
    assert "(SELECT COUNT(i) FROM integers)" in out


def test_sum_multiplicative_factor_hoists():
    out = d("SELECT (SELECT SUM(i1.i*i) FROM integers) FROM integers i1")
    assert "(SELECT sum(i) FROM integers)" in out and "i1.i" in out
    assert "SUM(i1.i*i)" not in out


def test_product_of_aggregates_splits_per_factor():
    out = d("SELECT i, (SELECT SUM(i1.i)*SUM(i) FROM integers) AS k "
            "FROM integers i1 GROUP BY i")
    assert "(SELECT SUM(i) FROM integers)" in out
    assert "* COALESCE((SELECT COUNT(*) FROM integers), 0)" in out


def test_backtick_quoted_identifiers():
    out = d("SELECT (SELECT MIN(t2.`_1` + 2 * t1.`_1`) FROM ints t2) "
            "FROM ints t1")
    assert "(SELECT min(t2.`_1`) FROM ints t2)" in out


def test_no_from_aggregate_is_identity_over_implicit_row():
    # a no-FROM subquery has ONE implicit row: SUM over it is the value
    # itself (semantics pinned by unnesting.test#13-15 expected outputs)
    out = d("SELECT (SELECT SUM(i1.i)) FROM integers i1")
    assert out == "SELECT ((i1.i)) FROM integers i1"
    out = d("SELECT (SELECT COUNT(*)) FROM integers i1")
    assert out == "SELECT (1) FROM integers i1"


def test_nested_no_from_chain_unwraps_to_fixpoint():
    out = d("SELECT i, (SELECT (SELECT (SELECT (SELECT "
            "i1.i+i1.i+i1.i+i1.i+i1.i)))) AS j FROM integers i1")
    assert "SELECT" not in out.split("AS j")[0].replace("SELECT i,", "")


def test_min_of_outer_times_inner_unchanged():
    # MIN(c*f) would flip on negative c — must NOT hoist
    q = "SELECT (SELECT MIN(i1.i*i) FROM integers) FROM integers i1"
    assert d(q) == q


def test_count_mixed_rewrites_null_guarded():
    # COUNT(f + c) counts rows where f+c IS NOT NULL: 0 when the outer
    # constant is NULL, else COUNT(f)
    out = d("SELECT (SELECT COUNT(i + i1.i) FROM integers) "
            "FROM integers i1")
    assert "CASE WHEN (i1.i) IS NULL THEN 0" in out
    assert "(SELECT COUNT(i) FROM integers)" in out


def test_uncorrelated_subquery_unchanged():
    q = "SELECT (SELECT MIN(i) FROM integers) FROM integers i1"
    assert d(q) == q


def test_empty_group_count_guard_uses_coalesce():
    # GROUP BY outer-const + pure-outer MIN: the COUNT(*) guard carries
    # the injected HAVING, so on empty input it yields NO row (NULL) —
    # COALESCE(...,0) keeps the CASE arm reading 0 there so the rewrite
    # returns NULL exactly where the grouped original yields no row.
    out = d("SELECT i, (SELECT MIN(i1.i) FROM integers i2 "
            "WHERE i2.i>i1.i GROUP BY i1.i) FROM integers i1")
    assert "HAVING COUNT(*) > 0" in out
    assert "COALESCE((SELECT COUNT(*)" in out
    assert "CASE WHEN COALESCE(" in out


def test_derived_table_in_subquery_from_bails():
    # `FROM (SELECT 1 AS a) t` binds t invisibly to the textual scoper;
    # hoisting `t.a + o.b` wholesale would be silently wrong — bail.
    q = ("SELECT (SELECT MIN(t.a + o.b) FROM (SELECT 1 AS a) t) "
         "FROM outer_tbl o")
    assert d(q) == q


def test_from_position_derived_table_not_unwrapped():
    # a no-FROM derived table is NOT a scalar subquery: unwrap would
    # produce invalid `FROM (1 AS a) t`
    q = "SELECT t.a FROM (SELECT 1 AS a) t"
    assert d(q) == q
    q2 = "SELECT t.a, u.b FROM tbl u, (SELECT 1 AS a) t"
    assert d(q2) == q2


def test_cte_and_set_op_arms_not_unwrapped():
    q = "WITH c AS (SELECT 1 AS a) SELECT a FROM c"
    assert d(q) == q
    q2 = "SELECT 1 UNION ALL (SELECT 2)"
    assert d(q2) == q2


def test_in_exists_predicate_subqueries_not_unwrapped():
    q = "SELECT i FROM integers i1 WHERE i IN (SELECT i1.i)"
    assert d(q) == q
    q2 = "SELECT i FROM integers i1 WHERE EXISTS (SELECT i1.i)"
    assert d(q2) == q2


_COLS = {"integers": ["i"], "test": ["a", "b", "str"],
         "test2": ["a", "c", "str2"]}.get


def test_having_pin_moves_to_where():
    # GROUP BY inner key + HAVING key=outer: the pin moves to WHERE,
    # the group collapses, HAVING COUNT(*) > 0 keeps empty -> NULL
    # (unnesting.test#31)
    out = d("SELECT i AS j, (SELECT MIN(i1.i) FROM integers "
            "GROUP BY i HAVING i=i1.i) FROM integers i1 "
            "GROUP BY i ORDER BY j", columns_of=_COLS)
    assert "GROUP BY i HAVING" not in out
    assert "WHERE (i=i1.i) HAVING COUNT(*) > 0" in out


def test_agg_extraction_hoists_trapped_outer():
    # (SUM(i)+i1.i) div 2: the outer term is under a non-distributable
    # operator; SUM extracts to its own scalar subquery and the whole
    # expression hoists (unnesting.test#34)
    out = d("SELECT SUM(i) FROM integers i1 WHERE i>"
            "(SELECT (SUM(i)+i1.i) div 2 FROM integers WHERE i=1)",
            columns_of=_COLS)
    assert out == ("SELECT SUM(i) FROM integers i1 WHERE i>"
                   "(((SELECT SUM(i) FROM integers WHERE i=1)+i1.i)"
                   " div 2)")


def test_lateral_hoist_two_level_nesting():
    # 2-level correlation pulls into LEFT JOIN LATERAL ... ON true;
    # an ungrouped aggregate body guarantees exactly one lateral row
    # (unnesting.test#57)
    out = d("SELECT i, (SELECT i FROM integers i2 WHERE i="
            "(SELECT SUM(i) FROM integers i2 WHERE i2.i>i1.i)) "
            "FROM integers i1 ORDER BY 1", columns_of=_COLS)
    assert "LEFT JOIN LATERAL (SELECT SUM(i) AS __v" in out
    assert "WHERE i=__lat0.__v" in out


def test_lateral_then_no_from_unwrap_chain():
    # unnesting.test#66: lateral hoist exposes a no-FROM unwrap
    out = d("SELECT i, (SELECT CASE WHEN (SELECT COUNT(*) FROM integers"
            " i2 WHERE i2.i>i1.i)=0 THEN 1 ELSE 0 END) FROM integers i1"
            " ORDER BY i", columns_of=_COLS)
    assert "LEFT JOIN LATERAL (SELECT COUNT(*) AS __v" in out
    assert "((CASE WHEN __lat0.__v=0 THEN 1 ELSE 0 END))" in out


def test_on_outer_conjunct_moves_to_where():
    # correlated conjunct in an INNER-join ON inside a subquery moves
    # to WHERE (unnesting.test#75)
    out = d("SELECT i, (SELECT s1.i FROM integers s1 INNER JOIN "
            "integers s2 ON s1.i=s2.i AND s1.i=4-i1.i) AS j "
            "FROM integers i1 ORDER BY i", columns_of=_COLS)
    assert "ON (s1.i=s2.i)" in out
    assert "WHERE (s1.i=4-i1.i)" in out


def test_on_subquery_conjunct_moves_to_where_toplevel():
    # subquery as an INNER-join ON condition moves to WHERE at the
    # top level (unnesting.test#78)
    out = d("SELECT * FROM integers s1 INNER JOIN integers s2 ON "
            "(SELECT s1.i=i FROM integers WHERE s2.i=i) ORDER BY s1.i",
            columns_of=_COLS)
    assert "ON 1=1" in out
    assert "WHERE ((SELECT s1.i=i FROM integers WHERE s2.i=i))" in out


def test_resolver_classifies_bare_outer_idents():
    # with a schema resolver, bare `b` (not a test2 column) hoists as
    # an outer constant; bare `c` (a test2 column) stays inner
    # (unnesting.test#70's quantifier-translated aggregates)
    out = d("SELECT a, (SELECT MIN((test2.a+c-b)) FROM test2 "
            "WHERE c>=b AND str=str2) AS m FROM test ORDER BY 1",
            columns_of=_COLS)
    assert "(SELECT min(test2.a + c) FROM test2" in out
    assert "+ (-b)" in out


def test_left_join_on_never_moved():
    # ON -> WHERE is only valid for inner joins
    q = ("SELECT i, (SELECT s1.i FROM integers s1 LEFT JOIN integers s2"
         " ON s1.i=s2.i AND s1.i=4-i1.i) AS j FROM integers i1")
    out = d(q, columns_of=_COLS)
    assert "LEFT JOIN" in out and "ON" in out
    assert "WHERE (s1.i=4-i1.i)" not in out


def test_parse_probe_never_executes_commands(spark):
    """The quoted-ident shim's parse gate must probe the GRAMMAR only.
    A side-effecting statement that (a) fails Spark's parse (the `=
    ANY(...)`), (b) becomes parseable after the quantifier rewrite, and
    (c) carries a double-quoted span (so the gate fires on the rewritten
    text) used to EXECUTE during the probe and again on the shimmed
    retry — a duplicate INSERT.  Exactly one row may land."""
    from lingo_db_spark.connection import Connection

    con = Connection(spark)
    spark.sql("DROP TABLE IF EXISTS probe_gate_t")
    spark.sql("CREATE TABLE probe_gate_t (x INT) USING parquet")
    try:
        con.sql('INSERT INTO probe_gate_t '
                'SELECT 5 WHERE 1 = ANY(SELECT 1) AND \'x\' <> "nope"')
        assert spark.sql(
            "SELECT COUNT(*) AS c FROM probe_gate_t").first().c == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS probe_gate_t")


# ---------------------------------------------------------------------------
# monotone-EXISTS -> scalar-aggregate (the scale rewrite class)
# ---------------------------------------------------------------------------

_TPCH_COLS = {
    "lineitem": ["l_orderkey", "l_suppkey", "l_commitdate",
                 "l_receiptdate", "l_shipdate"],
    "orders": ["o_orderkey", "o_orderdate"],
}


def _tpch_cols(t):
    return _TPCH_COLS.get(t)


def test_exists_inner_only_residual_becomes_count():
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    sql = ("select 1 from orders where exists (select * from lineitem "
           "where l_orderkey = o_orderkey and l_commitdate < "
           "l_receiptdate)")
    out = exists_to_aggregate(sql, _tpch_cols)
    assert "count(1)" in out and "exists" not in out.lower()
    assert "coalesce" in out and "> 0" in out


def test_exists_monotone_comparison_becomes_min_max():
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    sql = ("select 1 from orders where exists (select * from lineitem "
           "where l_orderkey = o_orderkey and l_shipdate > o_orderdate)")
    out = exists_to_aggregate(sql, _tpch_cols)
    assert "max(l_shipdate)" in out and "exists" not in out.lower()
    # flipped operand order normalizes to the same aggregate
    flipped = ("select 1 from orders where exists (select * from "
               "lineitem where l_orderkey = o_orderkey and o_orderdate "
               "< l_shipdate)")
    assert "max(l_shipdate)" in exists_to_aggregate(flipped, _tpch_cols)


def test_not_exists_neq_becomes_negated_min_max_pair():
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    sql = ("select 1 from lineitem l1 where not exists (select * from "
           "lineitem l3 where l3.l_orderkey = l1.l_orderkey and "
           "l3.l_suppkey <> l1.l_suppkey and l3.l_receiptdate > "
           "l3.l_commitdate)")
    out = exists_to_aggregate(sql, _tpch_cols)
    assert "min(l3.l_suppkey)" in out and "max(l3.l_suppkey)" in out
    assert out.count("l3.l_receiptdate > l3.l_commitdate") == 2
    assert "not coalesce" in out.lower()


def test_exists_bails_outside_the_class():
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    bails = [
        # multi-table FROM (the TPC-DS shape): untouched
        "select 1 from orders where exists (select * from lineitem, "
        "orders o2 where l_orderkey = o_orderkey)",
        # no correlation equality
        "select 1 from orders where exists (select * from lineitem "
        "where l_shipdate > o_orderdate)",
        # two monotone outer comparisons
        "select 1 from orders where exists (select * from lineitem "
        "where l_orderkey = o_orderkey and l_shipdate > o_orderdate "
        "and l_commitdate < o_orderdate)",
        # grouped subquery
        "select 1 from orders where exists (select l_orderkey from "
        "lineitem where l_orderkey = o_orderkey group by l_orderkey)",
        # nested subquery inside the EXISTS body
        "select 1 from orders where exists (select * from lineitem "
        "where l_orderkey = o_orderkey and l_suppkey in (select "
        "l_suppkey from lineitem))",
        # bare idents with no resolver: unclassifiable
    ]
    for sql in bails:
        assert exists_to_aggregate(sql, _tpch_cols) == sql, sql
    unresolvable = ("select 1 from orders where exists (select * from "
                    "lineitem where l_orderkey = o_orderkey)")
    assert exists_to_aggregate(unresolvable, None) == unresolvable


def test_two_fusion_groups_on_same_table():
    """Two EXISTS pairs over the same table but DIFFERENT correlation
    keys form two fusion groups; grouping keys contain frozensets, so
    this shape TypeError'd a bare sorted() before the keyed sort."""
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    sql = ("select 1 from orders o1 "
           "where exists (select * from lineitem a where a.l_orderkey "
           "= o1.o_orderkey and a.l_shipdate > o1.o_orderdate) "
           "and not exists (select * from lineitem b where "
           "b.l_orderkey = o1.o_orderkey and b.l_shipdate > "
           "o1.o_orderdate and b.l_suppkey > 0) "
           "and exists (select * from lineitem c where c.l_suppkey = "
           "o1.o_orderkey and c.l_shipdate > o1.o_orderdate) "
           "and not exists (select * from lineitem d where "
           "d.l_suppkey = o1.o_orderkey and d.l_shipdate > "
           "o1.o_orderdate and d.l_orderkey > 0)")
    out = exists_to_aggregate(sql, _tpch_cols)
    assert "__exq0" in out and "__exq1" in out
    assert "exists" not in out.lower()
    assert out.count("left join (select") == 2


# ---------------------------------------------------------------------------
# r12 hardening: star-leak, OR/NOT precedence, literal-offset splicing
# ---------------------------------------------------------------------------

_TO_COLS = {"t": ["k", "a"], "o": ["k", "e"]}


def _to_cols(t):
    return _TO_COLS.get(t)


def _duck_to(sql):
    """Run `sql` on the canonical 2x2 t/o fixture in DuckDB; returns
    (column_names, sorted_rows)."""
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INTEGER, a INTEGER)")
    con.execute("CREATE TABLE o (k INTEGER, e INTEGER)")
    con.execute("INSERT INTO t VALUES (1, 1), (1, 4), (2, 7), (NULL, 2)")
    con.execute("INSERT INTO o VALUES (1, 0), (2, 9), (3, 1), (NULL, 2)")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, sorted(cur.fetchall(),
                        key=lambda r: tuple((v is None, v or 0) for v in r))


_FUSABLE_PAIR = ("exists (select * from t where t.k = o.k and t.a > 0) "
                 "and exists (select * from t where t.k = o.k and t.a < 5)")


def test_fusion_refused_under_bare_star():
    """r11's wrong-answer bug (VERDICT r11 #1): a fused derived table
    under a bare top-level `SELECT *` leaked its helper columns into
    the output schema (2 columns became 5).  Bare star now disables
    fusion; the rewrite falls back to CASE-form scalar subqueries,
    which never touch FROM."""
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    sql = f"select * from o where {_FUSABLE_PAIR}"
    out = exists_to_aggregate(sql, _to_cols)
    assert out != sql and "exists" not in out.lower()
    assert "__exq" not in out and "left join" not in out.lower()
    cols, rows = _duck_to(out)
    assert cols == ["k", "e"]                      # schema preserved
    # the rewritten result must equal DuckDB's evaluation of the
    # ORIGINAL query (r12 review: an earlier `== ... or True` version
    # of this line was a dead assertion)
    assert rows == _duck_to(sql)[1]
    # spec check: o rows whose k has a t-witness with a>0 AND one <5
    assert rows == [(1, 0)]


def test_fusion_refused_under_distinct_star():
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    sql = f"select distinct * from o where {_FUSABLE_PAIR}"
    out = exists_to_aggregate(sql, _to_cols)
    assert out != sql and "__exq" not in out
    cols, rows = _duck_to(out)
    assert cols == ["k", "e"] and rows == [(1, 0)]


def test_qualified_star_stays_fused():
    """`o.*` never expands over a new FROM item — fusion stays on."""
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    sql = f"select o.* from o where {_FUSABLE_PAIR}"
    out = exists_to_aggregate(sql, _to_cols)
    assert "__exq0" in out and "left join (select" in out
    cols, rows = _duck_to(out)
    assert cols == ["k", "e"] and rows == [(1, 0)]


def test_top_level_or_in_body_bails():
    """ADVICE r11 (high): `t.a = o.e or o.x`-shaped bodies mis-parsed —
    the AND-split ignores OR precedence, fabricating a correlation
    whose rhs swallows the disjunct.  Any top-level OR in the EXISTS
    WHERE now bails (no conjunct list exists for `a and b or c`)."""
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    for body in ["t.k = o.k and t.a = o.e or t.a > 0",
                 "t.k = o.k and t.a > 0 or t.a < 2",
                 "t.k = o.k or t.a > 0"]:
        sql = f"select o.k from o where exists (select * from t where {body})"
        assert exists_to_aggregate(sql, _to_cols) == sql, body
    # parenthesized inner-only disjunction survives as an opaque filter
    sql = ("select o.k from o where exists (select * from t "
           "where t.k = o.k and (t.a = 1 or t.a = 7))")
    out = exists_to_aggregate(sql, _to_cols)
    assert out != sql and "exists" not in out.lower()
    assert _duck_to(out)[1] == _duck_to(sql)[1] == [(1,), (2,)]


def test_not_in_correlation_conjunct_bails():
    """`not t.a = o.e` means not(t.a = o.e); treating `not t.a` as the
    correlation's inner side would group by a negated column."""
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    sql = ("select o.k from o where exists (select * from t "
           "where t.k = o.k and not t.a = o.e)")
    assert exists_to_aggregate(sql, _to_cols) == sql
    # but an INNER-only `not` conjunct is a plain filter: still rewrites
    sql2 = ("select o.k from o where exists (select * from t "
            "where t.k = o.k and not t.a = 7)")
    out = exists_to_aggregate(sql2, _to_cols)
    assert out != sql2 and "exists" not in out.lower()
    assert _duck_to(out)[1] == _duck_to(sql2)[1]


def test_inner_is_not_null_residual_still_rewrites():
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    sql = ("select o.k from o where exists (select * from t "
           "where t.k = o.k and t.a is not null)")
    out = exists_to_aggregate(sql, _to_cols)
    assert out != sql and "exists" not in out.lower()
    assert _duck_to(out)[1] == _duck_to(sql)[1]


def test_string_literal_before_from_splices_correctly():
    """ADVICE r11 (medium): the fusion insert offset was computed on
    non-length-preserving _strip_strings output, so a top-level string
    literal before FROM shifted the splice left into the SELECT list.
    Blanking is length-preserving now."""
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    sql = (f"select 'tagged value' as tag, o.k from o where "
           f"{_FUSABLE_PAIR}")
    out = exists_to_aggregate(sql, _to_cols)
    assert "__exq0" in out
    import re as _re
    assert _re.search(r"from o\s+left join \(select", out)  # lands in FROM
    cols, rows = _duck_to(out)
    assert cols == ["tag", "k"] and rows == [("tagged value", 1)]


def test_boolean_keyword_inside_literal_bails():
    """_split_top_and is not literal-aware: 'x and y' inside a string
    would split mid-literal.  Bodies carrying and/or/not INSIDE a
    literal are refused outright."""
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    sql = ("select o.k from o where exists (select * from t "
           "where t.k = o.k and cast(t.a as varchar) = 'a and b')")
    assert exists_to_aggregate(sql, _to_cols) == sql


def test_in_with_aggregate_select_item_bails():
    """r12 review: `x IN (SELECT max(a) ...)` must refuse — treating
    the aggregate as the membership expression would fabricate the
    WHERE conjunct `max(a) = x` (invalid SQL that only the callers'
    analysis-failure fallback would catch)."""
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    for y in ("max(t.a)", "count(*)", "sum(t.a)",
              "rank() over (order by t.a)"):
        q = (f"select o.k from o where o.e in (select {y} from t "
             "where t.k = o.k)")
        assert exists_to_aggregate(q, _to_cols) == q, y


# ---------------------------------------------------------------------------
# r14: ANSI INNER-JOIN-syntax subquery bodies
# ---------------------------------------------------------------------------

_JOIN_COLS = {
    "lineitem": ["l_orderkey", "l_suppkey", "l_quantity"],
    "orders": ["o_orderkey", "o_orderdate", "o_custkey"],
    "customer": ["c_custkey", "c_nationkey"],
}


def _join_cols(t):
    return _JOIN_COLS.get(t)


def test_join_syntax_exists_rewrites_to_comma_from():
    """`EXISTS (SELECT ... FROM a JOIN b ON ...)` parses into the
    multi-table path: ON conjuncts merge into WHERE and the FROM
    re-emits as a comma list — WHERE-equivalent for INNER JOIN."""
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    sql = ("select 1 from customer where exists (select 1 from orders o "
           "join lineitem l on o.o_orderkey = l.l_orderkey "
           "where o.o_custkey = c_custkey)")
    out = exists_to_aggregate(sql, _join_cols)
    assert "exists" not in out.lower()
    assert "from orders o, lineitem l" in out
    assert "(o.o_orderkey = l.l_orderkey)" in out
    assert "count(1)" in out and "coalesce" in out


def test_join_syntax_correlation_in_on_clause_no_where():
    """Correlation living in the ON clause with NO WHERE at all still
    rewrites (ON may reference the outer scope)."""
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    sql = ("select 1 from customer where exists (select 1 from orders o "
           "inner join lineitem l on o.o_orderkey = l.l_orderkey "
           "and o.o_custkey = c_custkey)")
    out = exists_to_aggregate(sql, _join_cols)
    assert "exists" not in out.lower()
    assert "(o.o_custkey = c_custkey)" in out


def test_join_syntax_three_table_chain_and_extract():
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    sql = ("select 1 from customer c2 where exists (select 1 from "
           "orders o join lineitem l on o.o_orderkey = l.l_orderkey "
           "join customer c on c.c_custkey = o.o_custkey "
           "where o.o_custkey = c2.c_custkey)")
    out = exists_to_aggregate(sql, _join_cols)
    assert "from orders o, lineitem l, customer c " in out
    # monotone extract written in ON becomes the min/max form
    sql2 = ("select 1 from customer where exists (select 1 from orders o "
            "join lineitem l on o.o_orderkey = l.l_orderkey "
            "and l.l_quantity > c_nationkey "
            "where o.o_custkey = c_custkey)")
    out2 = exists_to_aggregate(sql2, _join_cols)
    assert "max(l.l_quantity)" in out2


def test_join_syntax_in_membership_body():
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    sql = ("select 1 from customer where c_custkey in (select "
           "o.o_custkey from orders o join lineitem l on "
           "o.o_orderkey = l.l_orderkey where o.o_orderdate = "
           "c_nationkey)")
    out = exists_to_aggregate(sql, _join_cols)
    assert "exists" not in out.lower() and " in " not in out.lower()
    assert "(o.o_custkey = c_custkey)" in out


def test_join_syntax_bails_outside_the_class():
    """Outer/cross/natural joins, USING, join-without-ON, derived
    tables, depth-0 OR in an ON cond, comma+JOIN mixes, repeated
    tables, and nested subqueries in ON must all refuse."""
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    bails = [
        # LEFT JOIN: the null-extended side breaks WHERE-equivalence
        "select 1 from customer where exists (select 1 from orders o "
        "left join lineitem l on o.o_orderkey = l.l_orderkey "
        "where o.o_custkey = c_custkey)",
        "select 1 from customer where exists (select 1 from orders o "
        "right outer join lineitem l on o.o_orderkey = l.l_orderkey "
        "where o.o_custkey = c_custkey)",
        "select 1 from customer where exists (select 1 from orders o "
        "full join lineitem l on o.o_orderkey = l.l_orderkey "
        "where o.o_custkey = c_custkey)",
        "select 1 from customer where exists (select 1 from orders o "
        "cross join lineitem l where o.o_custkey = c_custkey)",
        "select 1 from customer where exists (select 1 from orders o "
        "natural join lineitem l where o.o_custkey = c_custkey)",
        "select 1 from customer where exists (select 1 from orders o "
        "join lineitem l using (l_orderkey) "
        "where o.o_custkey = c_custkey)",
        # JOIN without ON (implicit cross)
        "select 1 from customer where exists (select 1 from orders o "
        "join lineitem l where o.o_orderkey = l.l_orderkey "
        "and o.o_custkey = c_custkey)",
        # derived table as a join item
        "select 1 from customer where exists (select 1 from "
        "(select * from orders) o join lineitem l on "
        "o.o_orderkey = l.l_orderkey where o.o_custkey = c_custkey)",
        # depth-0 OR inside an ON cond: raw merge would regroup it
        "select 1 from customer where exists (select 1 from orders o "
        "join lineitem l on o.o_orderkey = l.l_orderkey or "
        "l.l_quantity > 5 where o.o_custkey = c_custkey)",
        # comma + JOIN mix
        "select 1 from customer where exists (select 1 from customer c3"
        ", orders o join lineitem l on o.o_orderkey = l.l_orderkey "
        "where o.o_custkey = c_custkey)",
        # repeated table
        "select 1 from customer where exists (select 1 from orders o "
        "join orders o2 on o.o_orderkey = o2.o_orderkey "
        "where o.o_custkey = c_custkey)",
        # nested subquery inside ON
        "select 1 from customer where exists (select 1 from orders o "
        "join lineitem l on o.o_orderkey = (select 1) "
        "where o.o_custkey = c_custkey)",
    ]
    for sql in bails:
        assert exists_to_aggregate(sql, _join_cols) == sql, sql


def test_join_syntax_opaque_paren_groups_in_on_are_kept():
    """Parenthesized disjunctions and function calls INSIDE an ON cond
    are legal opaque inner conjuncts — parens are only refused in FROM
    *item* position (derived tables)."""
    from lingo_db_spark.sqlrewrite import exists_to_aggregate
    sql = ("select 1 from customer where exists (select 1 from orders o "
           "join lineitem l on o.o_orderkey = l.l_orderkey and "
           "(l.l_quantity > 5 or l.l_quantity < 1) "
           "where o.o_custkey = c_custkey)")
    out = exists_to_aggregate(sql, _join_cols)
    assert "((l.l_quantity > 5 or l.l_quantity < 1))" in out
    sql2 = ("select 1 from customer where exists (select 1 from orders "
            "o join lineitem l on o.o_orderkey = coalesce(l.l_orderkey,"
            " 0) where o.o_custkey = c_custkey)")
    out2 = exists_to_aggregate(sql2, _join_cols)
    assert "coalesce(l.l_orderkey, 0)" in out2
