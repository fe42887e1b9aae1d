"""Property test for the monotone-EXISTS -> scalar-aggregate rewrite
(sqlrewrite.exists_to_aggregate): on randomized tables WITH NULLs in
every role (correlation key, compared column, outer expression), the
rewritten SQL must return exactly the rows STANDARD three-valued
EXISTS semantics dictate.  The expected set is computed by a Python
spec evaluator (a row witnesses the EXISTS only when every conjunct
is TRUE — NULL comparisons are not witnesses; EXISTS itself is
two-valued), and the rewritten SQL executes in DuckDB — hundreds of
examples per second, no Spark session.

Why not compare against DuckDB's own evaluation of the ORIGINAL
EXISTS text: hypothesis found that DuckDB 1.0.0 diverges from the
standard on `EXISTS(... AND t.a != o.e)` with o.e NULL — its EXISTS
returns TRUE while `(SELECT count(*) ...)` over the IDENTICAL
subquery returns 0 (the mark-join decorrelation treats the NULL
comparison as a match).  Spark implements the standard behavior
(pinned in test_door_exists_rewrite_null_corner_matches_spark), so
the spec evaluator — not DuckDB's EXISTS — is the right oracle here.

The Spark-side plan shape and value gates live in test_ddl / the
verbatim suites; THIS test is the NULL-semantics torture chamber the
class comment in sqlrewrite.py argues case-by-case."""

from __future__ import annotations

import operator

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lingo_db_spark.sqlrewrite import exists_to_aggregate

_COLS = {"t": ["k", "a"], "o": ["k", "e"]}
_OPS = {"<": operator.lt, "<=": operator.le, ">": operator.gt,
        ">=": operator.ge, "<>": operator.ne, "!=": operator.ne}


def _resolver(name):
    return _COLS.get(name)


def _key_eq(tk, ok):
    """t.k = o.k as a witness condition: TRUE only when both non-null
    and equal."""
    return tk is not None and ok is not None and tk == ok


def _cmp(ta, op, oe):
    """t.a <op> o.e as a witness condition: TRUE only when both
    non-null and the comparison holds."""
    return ta is not None and oe is not None and _OPS[op](ta, oe)


def _run_rewritten(t_rows, o_rows, query):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INTEGER, a INTEGER)")
    con.execute("CREATE TABLE o (k INTEGER, e INTEGER)")
    if t_rows:
        con.executemany("INSERT INTO t VALUES (?, ?)", t_rows)
    if o_rows:
        con.executemany("INSERT INTO o VALUES (?, ?)", o_rows)
    rewritten = exists_to_aggregate(query, _resolver)
    assert rewritten != query, f"rewrite did not apply: {query}"
    return con.execute(rewritten).fetchall()


def _key(row):
    return tuple((v is None, 0 if v is None else v) for v in row)


def _check(got, expected):
    assert sorted(map(tuple, got), key=_key) == \
        sorted(map(tuple, expected), key=_key), (got, expected)


nullable_small_int = st.one_of(st.none(), st.integers(-3, 3))
inner_rows = st.lists(
    st.tuples(nullable_small_int, nullable_small_int), max_size=12)
outer_rows = st.lists(
    st.tuples(nullable_small_int, nullable_small_int), max_size=8)


@pytest.mark.parametrize("negate", [False, True])
@pytest.mark.parametrize("op", ["<", "<=", ">", ">=", "<>", "!="])
@settings(max_examples=40, deadline=None)
@given(t_rows=inner_rows, o_rows=outer_rows)
def test_monotone_comparison_forms(negate, op, t_rows, o_rows):
    q = (f"select o.k, o.e from o where {'not ' if negate else ''}exists "
         f"(select * from t where t.k = o.k and t.a {op} o.e)")
    got = _run_rewritten(t_rows, o_rows, q)
    expected = [
        (ok, oe) for ok, oe in o_rows
        if negate != any(_key_eq(tk, ok) and _cmp(ta, op, oe)
                         for tk, ta in t_rows)]
    _check(got, expected)


@pytest.mark.parametrize("negate", [False, True])
@settings(max_examples=60, deadline=None)
@given(t_rows=inner_rows, o_rows=outer_rows)
def test_count_form_with_inner_residual(negate, t_rows, o_rows):
    q = (f"select o.k, o.e from o where {'not ' if negate else ''}exists "
         f"(select * from t where t.k = o.k and t.a > 0)")
    got = _run_rewritten(t_rows, o_rows, q)
    expected = [
        (ok, oe) for ok, oe in o_rows
        if negate != any(_key_eq(tk, ok) and ta is not None and ta > 0
                         for tk, ta in t_rows)]
    _check(got, expected)


@settings(max_examples=40, deadline=None)
@given(t_rows=inner_rows, o_rows=outer_rows)
def test_combined_q21_shape(t_rows, o_rows):
    """Both polarities in one WHERE, each with a <> outer comparison,
    the NOT EXISTS side with an extra inner residual — the verbatim
    q21 composition."""
    q = ("select o.k from o where "
         "exists (select * from t where t.k = o.k and t.a <> o.e) "
         "and not exists (select * from t where t.k = o.k "
         "and t.a > 0 and t.a <> o.e)")
    got = _run_rewritten(t_rows, o_rows, q)
    expected = [
        (ok,) for ok, oe in o_rows
        if any(_key_eq(tk, ok) and _cmp(ta, "<>", oe)
               for tk, ta in t_rows)
        and not any(_key_eq(tk, ok) and ta is not None and ta > 0
                    and _cmp(ta, "<>", oe) for tk, ta in t_rows)]
    _check(got, expected)


@settings(max_examples=40, deadline=None)
@given(t_rows=inner_rows, o_rows=outer_rows)
def test_exists_in_disjunction_and_select_list(t_rows, o_rows):
    """The replacement is two-valued like EXISTS itself, so it must
    stay correct OUTSIDE plain WHERE-conjunct positions: under OR, and
    projected as a boolean value."""
    q = ("select o.k, o.e, "
         "exists (select * from t where t.k = o.k and t.a < o.e) as f "
         "from o where o.e > 1 or "
         "exists (select * from t where t.k = o.k and t.a < o.e)")
    got = _run_rewritten(t_rows, o_rows, q)
    expected = []
    for ok, oe in o_rows:
        ex = any(_key_eq(tk, ok) and _cmp(ta, "<", oe)
                 for tk, ta in t_rows)
        if (oe is not None and oe > 1) or ex:
            expected.append((ok, oe, ex))
    _check(got, expected)


def test_duckdb_exists_null_divergence_documented():
    """The divergence that forced the spec evaluator: DuckDB 1.0.0's
    correlated EXISTS with a NULL non-equality comparison returns TRUE
    while count(*) over the identical subquery is 0.  If a DuckDB
    upgrade fixes this, the xfail flips and the comparison oracle can
    go back to DuckDB's own EXISTS."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INTEGER, a INTEGER)")
    con.execute("CREATE TABLE o (k INTEGER, e INTEGER)")
    con.execute("INSERT INTO t VALUES (0, 0)")
    con.execute("INSERT INTO o VALUES (0, NULL)")
    ex = con.execute("select exists(select * from t where t.k = o.k "
                     "and t.a != o.e) from o").fetchone()[0]
    cnt = con.execute("select (select count(*) from t where t.k = o.k "
                      "and t.a != o.e) from o").fetchone()[0]
    assert cnt == 0              # the standard reading
    assert ex is True            # the divergence (flips on a fix)


def test_bare_ident_classification_uses_inner_scope_first():
    """A bare ident present in BOTH tables must resolve inner (SQL
    scoping); the rewrite keeps `k` inside the subquery as an
    inner-only conjunct, never treats it as correlation."""
    q = ("select o.k from o where exists "
         "(select * from t where k = o.k and a > 0)")
    out = exists_to_aggregate(q, _resolver)
    assert "count(1)" in out
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INTEGER, a INTEGER)")
    con.execute("CREATE TABLE o (k INTEGER, e INTEGER)")
    con.execute("INSERT INTO t VALUES (1, 1), (2, 0), (NULL, 5)")
    con.execute("INSERT INTO o VALUES (1, 9), (2, 9), (3, 9), (NULL, 9)")
    got = con.execute(out).fetchall()
    assert sorted(got) == [(1,)]


@pytest.mark.parametrize("star", ["*", "distinct *", "o.*"])
@settings(max_examples=30, deadline=None)
@given(t_rows=inner_rows, o_rows=outer_rows)
def test_fusable_pair_under_star_select(star, t_rows, o_rows):
    """r11 shipped a wrong answer here: a fused EXISTS pair under a
    bare top-level `SELECT *` leaked the fused derived table's helper
    columns into the output (2 columns became 5; DISTINCT * also
    changed the row multiset).  Every star form must keep the exact
    2-column schema and the spec values — bare/DISTINCT star via the
    fusion-refusal fallback (CASE-form scalar subqueries), qualified
    `o.*` via fusion (it never expands over the new FROM item)."""
    q = (f"select {star} from o where "
         "exists (select * from t where t.k = o.k and t.a > 0) and "
         "exists (select * from t where t.k = o.k and t.a < 5)")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INTEGER, a INTEGER)")
    con.execute("CREATE TABLE o (k INTEGER, e INTEGER)")
    if t_rows:
        con.executemany("INSERT INTO t VALUES (?, ?)", t_rows)
    if o_rows:
        con.executemany("INSERT INTO o VALUES (?, ?)", o_rows)
    rewritten = exists_to_aggregate(q, _resolver)
    assert rewritten != q, q
    cur = con.execute(rewritten)
    assert [d[0] for d in cur.description] == ["k", "e"]
    got = cur.fetchall()
    expected = [
        (ok, oe) for ok, oe in o_rows
        if any(_key_eq(tk, ok) and ta is not None and ta > 0
               for tk, ta in t_rows)
        and any(_key_eq(tk, ok) and ta is not None and ta < 5
                for tk, ta in t_rows)]
    if star == "distinct *":
        expected = list({_key(r): r for r in expected}.values())
    _check(got, expected)


@pytest.mark.parametrize("residual", [False, True])
@settings(max_examples=60, deadline=None)
@given(t_rows=inner_rows, o_rows=outer_rows)
def test_correlated_in_membership(residual, t_rows, o_rows):
    """r12: positive correlated `IN (subquery)` as a WHERE conjunct
    joins the rewrite class — membership is one more equality
    correlation.  Spec: `o.e IN (SELECT t.a ...)` keeps the row only
    when a witness row has BOTH the correlation key and the membership
    equality TRUE (NULL probe / NULL member is never a witness)."""
    extra = " and t.a > 0" if residual else ""
    q = (f"select o.k, o.e from o where o.e in "
         f"(select t.a from t where t.k = o.k{extra})")
    got = _run_rewritten(t_rows, o_rows, q)
    expected = [
        (ok, oe) for ok, oe in o_rows
        if any(_key_eq(tk, ok) and ta is not None and oe is not None
               and ta == oe and (not residual or ta > 0)
               for tk, ta in t_rows)]
    _check(got, expected)


@settings(max_examples=40, deadline=None)
@given(t_rows=inner_rows, o_rows=outer_rows)
def test_in_and_exists_compose_in_one_where(t_rows, o_rows):
    """An IN conjunct and a NOT EXISTS over the same table in one
    WHERE — both rewritten, independently grouped (their correlation
    keys differ by the membership equality)."""
    q = ("select o.k from o where o.e in "
         "(select t.a from t where t.k = o.k) "
         "and not exists (select * from t where t.k = o.k and t.a > 2)")
    got = _run_rewritten(t_rows, o_rows, q)
    expected = [
        (ok,) for ok, oe in o_rows
        if any(_key_eq(tk, ok) and ta is not None and oe is not None
               and ta == oe for tk, ta in t_rows)
        and not any(_key_eq(tk, ok) and ta is not None and ta > 2
                    for tk, ta in t_rows)]
    _check(got, expected)


def test_in_rewrite_class_boundaries():
    """Shapes that must pass through byte-identical: NOT IN (three-
    valued), IN under OR (not a TRUE-only conjunct), IN in the select
    list, uncorrelated IN (Catalyst's semi join already handles it),
    literal-list IN."""
    qs = [
        "select o.k from o where o.e not in "
        "(select t.a from t where t.k = o.k)",
        "select o.k from o where o.k > 9 or o.e in "
        "(select t.a from t where t.k = o.k)",
        "select o.e in (select t.a from t where t.k = o.k) as f from o",
        "select o.k from o where o.e in (select t.a from t where t.a > 0)",
        "select o.k from o where o.e in (1, 2, 3)",
    ]
    for q in qs:
        assert exists_to_aggregate(q, _resolver) == q, q


_COLS3 = {"t": ["k", "a"], "o": ["k", "e"], "d": ["a", "b"]}
d_rows_st = st.lists(
    st.tuples(nullable_small_int, nullable_small_int), max_size=8)


def _run_rewritten3(t_rows, d_rows, o_rows, query, negate_ok=False):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INTEGER, a INTEGER)")
    con.execute("CREATE TABLE d (a INTEGER, b INTEGER)")
    con.execute("CREATE TABLE o (k INTEGER, e INTEGER)")
    if t_rows:
        con.executemany("INSERT INTO t VALUES (?, ?)", t_rows)
    if d_rows:
        con.executemany("INSERT INTO d VALUES (?, ?)", d_rows)
    if o_rows:
        con.executemany("INSERT INTO o VALUES (?, ?)", o_rows)
    rewritten = exists_to_aggregate(query, _COLS3.get)
    assert rewritten != query, f"rewrite did not apply: {query}"
    assert "exists" not in rewritten.lower().replace("not exists", "")
    return con.execute(rewritten).fetchall()


@pytest.mark.parametrize("negate", [False, True])
@settings(max_examples=50, deadline=None)
@given(t_rows=inner_rows, d_rows=d_rows_st, o_rows=outer_rows)
def test_multi_table_exists_body(negate, t_rows, d_rows, o_rows):
    """r12: EXISTS over a comma-list FROM (the TPC-DS q10/q35
    fact-joins-dim shape) — witness requires a (t, d) pair with the
    join equality, the dim filter and the correlation all TRUE.  The
    emission keeps every conjunct in WHERE (never CASE-form/fusion:
    moving the join condition would cross-join the FROM items)."""
    q = (f"select o.k, o.e from o where {'not ' if negate else ''}exists "
         "(select * from t, d where t.k = o.k and t.a = d.a and d.b > 0)")
    got = _run_rewritten3(t_rows, d_rows, o_rows, q)
    expected = [
        (ok, oe) for ok, oe in o_rows
        if negate != any(
            _key_eq(tk, ok) and ta is not None and da is not None
            and ta == da and db is not None and db > 0
            for tk, ta in t_rows for da, db in d_rows)]
    _check(got, expected)


@settings(max_examples=50, deadline=None)
@given(t_rows=inner_rows, d_rows=d_rows_st, o_rows=outer_rows)
def test_multi_table_in_membership(t_rows, d_rows, o_rows):
    """r12: correlated IN whose subquery joins two tables."""
    q = ("select o.k, o.e from o where o.e in "
         "(select t.a from t, d where t.k = o.k and t.a = d.a)")
    got = _run_rewritten3(t_rows, d_rows, o_rows, q)
    expected = [
        (ok, oe) for ok, oe in o_rows
        if any(_key_eq(tk, ok) and ta is not None and oe is not None
               and ta == oe and da is not None and ta == da
               for tk, ta in t_rows for da, _db in d_rows)]
    _check(got, expected)


# ---------------------------------------------------------------------------
# r14: ANSI INNER-JOIN-syntax subquery bodies (ON conds are
# WHERE-equivalent, so the parse merges them into the predicate list)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("negate", [False, True])
@settings(max_examples=50, deadline=None)
@given(t_rows=inner_rows, d_rows=d_rows_st, o_rows=outer_rows)
def test_join_syntax_exists_body(negate, t_rows, d_rows, o_rows):
    """r14: the comma-FROM arm above re-spelled the way users actually
    write it — `FROM t JOIN d ON ...` with the correlation in WHERE.
    Same witness semantics as the comma twin."""
    q = (f"select o.k, o.e from o where {'not ' if negate else ''}exists "
         "(select * from t join d on t.a = d.a "
         "where t.k = o.k and d.b > 0)")
    got = _run_rewritten3(t_rows, d_rows, o_rows, q)
    expected = [
        (ok, oe) for ok, oe in o_rows
        if negate != any(
            _key_eq(tk, ok) and ta is not None and da is not None
            and ta == da and db is not None and db > 0
            for tk, ta in t_rows for da, db in d_rows)]
    _check(got, expected)


@pytest.mark.parametrize("negate", [False, True])
@settings(max_examples=50, deadline=None)
@given(t_rows=inner_rows, d_rows=d_rows_st, o_rows=outer_rows)
def test_join_syntax_on_clause_correlation(negate, t_rows, d_rows,
                                           o_rows):
    """r14: the correlation AND the dim filter live in the ON clause,
    and the body has NO WHERE at all — legal SQL (ON may reference the
    outer scope), and for INNER JOIN exactly equivalent to the WHERE
    spelling."""
    q = (f"select o.k, o.e from o where {'not ' if negate else ''}exists "
         "(select 1 from t join d on t.a = d.a and t.k = o.k "
         "and d.b > 0)")
    got = _run_rewritten3(t_rows, d_rows, o_rows, q)
    expected = [
        (ok, oe) for ok, oe in o_rows
        if negate != any(
            _key_eq(tk, ok) and ta is not None and da is not None
            and ta == da and db is not None and db > 0
            for tk, ta in t_rows for da, db in d_rows)]
    _check(got, expected)


@settings(max_examples=50, deadline=None)
@given(t_rows=inner_rows, d_rows=d_rows_st, o_rows=outer_rows)
def test_join_syntax_in_membership(t_rows, d_rows, o_rows):
    """r14: correlated IN whose subquery is an ANSI JOIN chain."""
    q = ("select o.k, o.e from o where o.e in "
         "(select t.a from t join d on t.a = d.a where t.k = o.k)")
    got = _run_rewritten3(t_rows, d_rows, o_rows, q)
    expected = [
        (ok, oe) for ok, oe in o_rows
        if any(_key_eq(tk, ok) and ta is not None and oe is not None
               and ta == oe and da is not None and ta == da
               for tk, ta in t_rows for da, _db in d_rows)]
    _check(got, expected)


@pytest.mark.parametrize("negate", [False, True])
@settings(max_examples=50, deadline=None)
@given(t_rows=inner_rows, d_rows=d_rows_st, o_rows=outer_rows)
def test_join_syntax_monotone_extract_in_on(negate, t_rows, d_rows,
                                            o_rows):
    """r14: the single monotone outer comparison sits in the ON clause
    — it must become the min/max extraction exactly as if written in
    WHERE (NULL on either side is never a witness)."""
    q = (f"select o.k, o.e from o where {'not ' if negate else ''}exists "
         "(select 1 from t join d on t.a = d.a and t.a > o.e "
         "where t.k = o.k)")
    got = _run_rewritten3(t_rows, d_rows, o_rows, q)
    expected = [
        (ok, oe) for ok, oe in o_rows
        if negate != any(
            _key_eq(tk, ok) and ta is not None and da is not None
            and ta == da and _cmp(ta, ">", oe)
            for tk, ta in t_rows for da, _db in d_rows)]
    _check(got, expected)


# ---------------------------------------------------------------------------
# r13: NOT IN with catalog-provable non-null columns -> NOT EXISTS
# ---------------------------------------------------------------------------

nonnull_small_int = st.integers(-3, 3)
nn_inner_rows = st.lists(
    st.tuples(nonnull_small_int, nonnull_small_int), max_size=12)
nn_outer_rows = st.lists(
    st.tuples(nonnull_small_int, nonnull_small_int), max_size=8)

_NN_ALL = {"t": {"k", "a"}, "o": {"k", "e"}}.get


@settings(max_examples=60, deadline=None)
@given(t_rows=nn_inner_rows, o_rows=nn_outer_rows)
def test_not_in_rewrites_when_provably_nonnull(t_rows, o_rows):
    """r13: with probe and member both declared NOT NULL, `x NOT IN
    (correlated subquery)` collapses to NOT EXISTS and must return
    exactly DuckDB's evaluation of the ORIGINAL text (no NULLs exist,
    so the engines' NOT IN agree and is a safe oracle here)."""
    q = ("select o.k, o.e from o where o.e not in "
         "(select t.a from t where t.k = o.k)")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INTEGER NOT NULL, a INTEGER NOT NULL)")
    con.execute("CREATE TABLE o (k INTEGER NOT NULL, e INTEGER NOT NULL)")
    if t_rows:
        con.executemany("INSERT INTO t VALUES (?, ?)", t_rows)
    if o_rows:
        con.executemany("INSERT INTO o VALUES (?, ?)", o_rows)
    rewritten = exists_to_aggregate(q, _resolver, notnull_of=_NN_ALL)
    assert rewritten != q, "NOT IN rewrite did not apply"
    assert "not in" not in rewritten.lower()
    got = con.execute(rewritten).fetchall()
    expected = con.execute(q).fetchall()
    _check(got, expected)


@settings(max_examples=60, deadline=None)
@given(t_rows=inner_rows, o_rows=outer_rows)
def test_not_in_refused_without_notnull_proof(t_rows, o_rows):
    """NULL-bearing refusal arms: with no metadata, or with the probe
    or the member column nullable, NOT IN must NEVER rewrite — its
    three-valued semantics (NULL probe or NULL member) are not the
    two-valued coalesce form."""
    q = ("select o.k, o.e from o where o.e not in "
         "(select t.a from t where t.k = o.k)")
    assert exists_to_aggregate(q, _resolver) == q
    assert exists_to_aggregate(
        q, _resolver, notnull_of={"t": {"k"}, "o": {"k", "e"}}.get) == q
    assert exists_to_aggregate(
        q, _resolver, notnull_of={"t": {"k", "a"}, "o": {"k"}}.get) == q
    # and the gate really matters: with NULLs present, the would-be
    # rewritten form DIVERGES from NOT IN (sanity of the refusal)
    if (any(v is None for r in t_rows for v in r) and t_rows and o_rows):
        con = duckdb.connect()
        con.execute("CREATE TABLE t (k INTEGER, a INTEGER)")
        con.execute("CREATE TABLE o (k INTEGER, e INTEGER)")
        con.executemany("INSERT INTO t VALUES (?, ?)", t_rows)
        con.executemany("INSERT INTO o VALUES (?, ?)", o_rows)
        forced = exists_to_aggregate(q, _resolver, notnull_of=_NN_ALL)
        assert forced != q  # (metadata lied; just exercising the text)
        con.execute(forced).fetchall()  # must at least run


def test_not_in_proof_requires_resolvable_unique_probe():
    """Bare probe idents must resolve to exactly ONE outer FROM table
    with the column declared non-null; ambiguity or arithmetic
    probes/members refuse."""
    cols = {"t": ["k", "a", "e"], "o": ["k", "e"]}.get
    nn = {"t": {"k", "a", "e"}, "o": {"k", "e"}}.get
    # probe `e` lives in both o (outer) and t... outer FROM is just o,
    # so it resolves; but with BOTH tables in the outer FROM it refuses
    q_two = ("select o.e from o, t where e not in "
             "(select t2.a from t t2 where t2.k = o.k)")
    assert exists_to_aggregate(q_two, cols, notnull_of=nn) == q_two
    # arithmetic probe refuses
    q_arith = ("select o.e from o where o.e + 1 not in "
               "(select t.a from t where t.k = o.k)")
    assert exists_to_aggregate(q_arith, cols, notnull_of=nn) == q_arith
    # arithmetic member refuses
    q_m = ("select o.e from o where o.e not in "
           "(select t.a + 1 from t where t.k = o.k)")
    assert exists_to_aggregate(q_m, cols, notnull_of=nn) == q_m


_NN3 = {"t": {"k", "a"}, "o": {"k", "e"}, "d": {"a", "b"}}.get
nn_d_rows = st.lists(
    st.tuples(nonnull_small_int, nonnull_small_int), max_size=10)


@pytest.mark.parametrize("frm", [
    "t, d where t.a = d.a and t.k = o.k",                 # comma form
    "t join d on t.a = d.a where t.k = o.k",              # ANSI JOIN
    "t join d on t.a = d.a and t.k = o.k",                # corr in ON
])
@settings(max_examples=40, deadline=None)
@given(t_rows=nn_inner_rows, d_rows=nn_d_rows, o_rows=nn_outer_rows)
def test_not_in_multi_table_body_when_provably_nonnull(frm, t_rows,
                                                       d_rows, o_rows):
    """r14: the non-null gate now covers MULTI-TABLE NOT IN bodies —
    member values over INNER-join rows come from their base table, so
    a base-table NOT NULL declaration still proves the member never
    NULL.  All three spellings must rewrite and match DuckDB on the
    original text (non-null data => its NOT IN is a safe oracle)."""
    q = f"select o.k, o.e from o where o.e not in (select t.a from {frm})"
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INTEGER NOT NULL, a INTEGER NOT NULL)")
    con.execute("CREATE TABLE d (a INTEGER NOT NULL, b INTEGER NOT NULL)")
    con.execute("CREATE TABLE o (k INTEGER NOT NULL, e INTEGER NOT NULL)")
    if t_rows:
        con.executemany("INSERT INTO t VALUES (?, ?)", t_rows)
    if d_rows:
        con.executemany("INSERT INTO d VALUES (?, ?)", d_rows)
    if o_rows:
        con.executemany("INSERT INTO o VALUES (?, ?)", o_rows)
    rewritten = exists_to_aggregate(q, _COLS3.get, notnull_of=_NN3)
    assert rewritten != q, "multi-table NOT IN rewrite did not apply"
    assert "not in" not in rewritten.lower()
    _check(con.execute(rewritten).fetchall(), con.execute(q).fetchall())


def test_not_in_multi_table_refusals():
    """r14 refusal pins for the widened gate: member column nullable in
    its base table, member ambiguous across inner tables, and outer
    joins in the body must all keep Catalyst's null-aware anti join."""
    cols = {"t": ["k", "a"], "o": ["k", "e"], "d": ["a", "b"]}.get
    # member's base table (t) lacks the declaration
    nn_no_t = {"t": {"k"}, "o": {"k", "e"}, "d": {"a", "b"}}.get
    q = ("select o.k, o.e from o where o.e not in "
         "(select t.a from t join d on t.k = d.b where t.k = o.k)")
    assert exists_to_aggregate(q, cols, notnull_of=nn_no_t) == q
    # unqualified member `a` lives in BOTH t and d: ambiguous, refuse
    q_amb = ("select o.k, o.e from o where o.e not in "
             "(select a from t, d where t.k = o.k and t.k = d.b)")
    assert exists_to_aggregate(q_amb, cols, notnull_of=_NN3) == q_amb
    # outer join in the body: the null-extended side breaks the proof
    q_lj = ("select o.k, o.e from o where o.e not in "
            "(select t.a from t left join d on t.a = d.a "
            "where t.k = o.k)")
    assert exists_to_aggregate(q_lj, cols, notnull_of=_NN3) == q_lj


@settings(max_examples=60, deadline=None)
@given(t_rows=nn_inner_rows, o_rows=nn_outer_rows)
def test_not_in_fuses_with_exists_on_shared_correlation(t_rows, o_rows):
    """r13 battery promotion: a provably-null-free NOT IN and an EXISTS
    sharing (table, correlation key) land in the same fusion group —
    one pre-decorrelated derived table, the NOT IN's predicate negated
    per-occurrence.  Values must match DuckDB on the original text
    (non-null data, so its NOT IN is a safe oracle)."""
    q = ("select o.k, o.e from o where exists "
         "(select * from t where t.k = o.k and t.a > 0) "
         "and o.e not in (select t.a from t where t.k = o.k)")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INTEGER NOT NULL, a INTEGER NOT NULL)")
    con.execute("CREATE TABLE o (k INTEGER NOT NULL, e INTEGER NOT NULL)")
    if t_rows:
        con.executemany("INSERT INTO t VALUES (?, ?)", t_rows)
    if o_rows:
        con.executemany("INSERT INTO o VALUES (?, ?)", o_rows)
    rewritten = exists_to_aggregate(q, _resolver, notnull_of=_NN_ALL)
    assert rewritten != q
    assert "not in" not in rewritten.lower()
    assert "exists" not in rewritten.lower()
    _check(con.execute(rewritten).fetchall(), con.execute(q).fetchall())
