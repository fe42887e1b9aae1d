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
    assert "CASE WHEN (SELECT COUNT(*) FROM integers WHERE i>i1.i) = 0" in out


def test_group_by_constant_becomes_having():
    out = d("SELECT i, (SELECT COUNT(*) FROM integers i2 "
            "WHERE i2.i>i1.i GROUP BY i1.i) FROM integers i1")
    assert "GROUP BY i1.i" not in out
    assert "HAVING COUNT(*) > 0" in out


def test_sum_of_pure_outer_multiplies_count():
    out = d("SELECT (SELECT SUM(i)+SUM(i1.i) FROM integers) "
            "FROM integers i1")
    assert "(SELECT SUM(i) FROM integers)" in out
    assert "(i1.i) * (SELECT COUNT(*) FROM integers)" in out


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
    assert "* (SELECT COUNT(*) FROM integers)" in out


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


def test_count_mixed_unchanged():
    q = "SELECT (SELECT COUNT(i + i1.i) FROM integers) FROM integers i1"
    assert d(q) == q


def test_uncorrelated_subquery_unchanged():
    q = "SELECT (SELECT MIN(i) FROM integers) FROM integers i1"
    assert d(q) == q
