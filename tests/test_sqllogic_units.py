"""Unit pins for tools/sqllogic.py's comparator and dialect-shim pieces
(no Spark session): the round-5 strictness fixes stay fixed."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import sqllogic as S  # noqa: E402


def test_tsv_tolerance_is_roundtrip_not_prefix():
    # equal values rendered at different scales compare equal...
    assert S.tsv_fields_equal("3.33333", "3.333333333333333333")
    assert S.tsv_fields_equal("0.6667", "0.666666666666666666")
    # ...but prefix-equal DIFFERENT values do not (the r4 false-PASS)
    assert not S.tsv_fields_equal("1.23", "1.2399")
    assert not S.tsv_fields_equal("1.23", "1.239")
    assert S.tsv_fields_equal("1.24", "1.2399")


def test_tsv_compare_checks_order_when_ordered():
    got = ["1\ta", "2\tb"]
    exp = ["2\tb", "1\ta"]
    assert S.tsv_compare(got, exp, ordered=False) is None
    assert S.tsv_compare(got, exp, ordered=True) is not None


def test_tsv_compare_null_rows_may_float():
    got = ["NULL\tx", "1\ta", "2\tb"]
    exp = ["1\ta", "2\tb", "NULL\tx"]
    assert S.tsv_compare(got, exp, ordered=True) is None
    # but non-null order still binds
    bad = ["2\tb", "1\ta", "NULL\tx"]
    assert S.tsv_compare(got, bad, ordered=True) is not None


def test_toplevel_order_ignores_window_specs():
    assert not S.has_toplevel_order(
        "SELECT rank() OVER (PARTITION BY a ORDER BY b) FROM t")
    assert S.has_toplevel_order("SELECT a FROM t ORDER BY a")
    assert not S.has_toplevel_order(
        "SELECT (SELECT x FROM s ORDER BY y LIMIT 1) FROM t")


def test_normalize_null_order_pins_placement():
    assert S.normalize_null_order("SELECT a FROM t ORDER BY i;").strip() \
        == "SELECT a FROM t ORDER BY i NULLS LAST;"
    out = S.normalize_null_order(
        "SELECT a FROM t ORDER BY i DESC, j LIMIT 3")
    assert "i DESC NULLS FIRST" in out and "j NULLS LAST" in out
    # window-spec ORDER BY untouched
    q = "SELECT rank() OVER (ORDER BY b) FROM t ORDER BY a"
    out = S.normalize_null_order(q)
    assert "(ORDER BY b)" in out and "a NULLS LAST" in out
    # pipe stages end the clause
    out = S.normalize_null_order(
        "from t |> order by x asc, y desc |> limit 5")
    assert "x asc NULLS LAST" in out and "y desc NULLS FIRST" in out
    assert "|> limit 5" in out


def test_scan_lhs_captures_compound_expression():
    # machinery moved to lingo_db_spark.dialect in r7 (shared with the
    # Connection door); the runner re-exports the public rewrite
    from lingo_db_spark import dialect as D
    sql = "SELECT 1 WHERE a + b > ANY (SELECT i FROM t)"
    m = D._QUANT_RE.search(sql)
    start = D._scan_lhs(sql, m.start())
    assert sql[start:m.start()].strip() == "a + b"
    # unary minus stays with its operand, not treated as binary
    sql2 = "SELECT 1 WHERE -b > ANY (SELECT i FROM t)"
    m2 = D._QUANT_RE.search(sql2)
    start2 = D._scan_lhs(sql2, m2.start())
    assert sql2[start2:m2.start()].strip() == "-b"


def test_correlated_scope_gap_requires_real_shape():
    # alias bound outside, referenced inside a subquery that doesn't
    # bind it -> classified
    assert S._is_correlated_scope_gap(
        "SELECT (SELECT SUM(i1.i) FROM t2) FROM t1 AS i1", "i1")
    # alias only referenced at top level (a rewriter bug shape) -> NOT
    assert not S._is_correlated_scope_gap(
        "SELECT i1.i + (SELECT MAX(x) FROM t2) FROM t1 AS i1", "i1")
    # alias bound inside the same subquery -> NOT correlated
    assert not S._is_correlated_scope_gap(
        "SELECT (SELECT SUM(i1.i) FROM t1 AS i1) FROM t2", "i1")


def test_runner_retries_unrewritten_on_rewrite_failure(spark, tmp_path,
                                                       monkeypatch):
    """ADVICE r11: a rewriter bug must cost the optimization, never
    record a previously-passing corpus query as failed.  Force the
    rewrite to emit garbage; the runner must fall back to the
    original text and PASS the query."""
    t = tmp_path / "broken_rewrite.test"
    t.write_text(
        "statement ok\n"
        "CREATE TABLE rt1 (a INTEGER, b INTEGER)\n\n"
        "statement ok\n"
        "INSERT INTO rt1 VALUES (1, 2), (2, 3)\n\n"
        "query I rowsort\n"
        "SELECT a FROM rt1 o WHERE EXISTS "
        "(SELECT * FROM rt1 t WHERE t.a = o.b AND t.b > 0)\n"
        "----\n"
        "1\n")
    monkeypatch.setattr(S, "exists_to_aggregate",
                        lambda q, columns_of=None, **kw: q + " THIS BREAKS )")
    fb0 = S.REWRITE_FALLBACKS
    ran, passed, failed, skipped, unsupported = S.run_file(spark, t)
    assert (ran, passed, failed) == (1, 1, 0)
    # r13 (ADVICE): the fallback must be COUNTED so a runtime-failing
    # rewrite stays visible in the sweep summary, not silently green
    assert S.REWRITE_FALLBACKS == fb0 + 1
