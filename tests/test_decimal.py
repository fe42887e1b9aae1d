"""Decimal(p,s) parity tests — reference type-inference rules
(reference src/compiler/Dialect/DB/DBOps.cpp:98-273,
src/compiler/frontend/sql_analyzer.cpp:2636-2642) and truncating value
semantics (src/compiler/Conversion/DBToStd/LowerToStd.cpp:1599-1603)."""

from __future__ import annotations

from decimal import ROUND_DOWN, Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lingo_db_spark.functions import decimal as dec


# ---------------------------------------------------------------------------
# Type-inference rules (pure)
# ---------------------------------------------------------------------------

def test_mul_type_rule():
    # raw (pa+pb, sa+sb), adapt() pass-through while ipart <= 32
    assert dec.mul_type(12, 2, 4, 2) == (16, 4)
    assert dec.mul_type(12, 2, 12, 2) == (24, 4)
    # ipart > 32, scale <= 6 branch (DBOps.cpp:103-105)
    assert dec.mul_type(20, 2, 20, 2) == (38, 4)
    # ipart > 32, scale > 6 branch (DBOps.cpp:100-102)
    assert dec.mul_type(36, 2, 8, 6) == (38, 6)
    # ipart <= 32: precision capped at 38, scale clipped to 38-ipart
    assert dec.mul_type(20, 18, 20, 2) == (38, 18)


def test_div_type_rule():
    # scale' = max(6, sa+pb); prec' = pa-sa+sb+scale'
    assert dec.div_type(12, 2, 4, 1) == (17, 6)
    assert dec.div_type(12, 2, 12, 2) == (26, 14)
    assert dec.div_type(12, 2, 2, 1) == (17, 6)   # max(6, 2+2) = 6


def test_mod_type_rule():
    assert dec.mod_type(12, 2, 4, 1) == (5, 2)
    assert dec.mod_type(12, 2, 12, 2) == (12, 2)


def test_avg_promotion_rule():
    # INT -> decimal(19,0)/decimal(19,0) (sql_analyzer.cpp:2638)
    assert dec.avg_type() == (38, 19)
    # decimal(12,2) -> div-rule vs decimal(19,0) (sql_analyzer.cpp:2640)
    assert dec.avg_type(12, 2) == (31, 21)
    # adapt() cap engages for wide inputs
    assert dec.avg_type(33, 2) == (38, 7)


# ---------------------------------------------------------------------------
# Value semantics on literals (vs python Decimal ground truth)
# ---------------------------------------------------------------------------

CASES = [(Decimal("-7.00"), Decimal("3.00")),
         (Decimal("7.00"), Decimal("-3.00")),
         (Decimal("-7.00"), Decimal("-3.00")),
         (Decimal("0.01"), Decimal("7.00")),
         (Decimal("99999999.99"), Decimal("0.07"))]


@pytest.fixture(scope="module")
def arith(spark):
    df = spark.createDataFrame(CASES, "a decimal(12,2), b decimal(12,2)")
    rows = df.select(
        "a", "b",
        dec.dec_div(F.col("a"), 12, 2, F.col("b"), 12, 2).alias("q"),
        dec.dec_mod(F.col("a"), 12, 2, F.col("b"), 12, 2).alias("r"),
        dec.dec_mul(F.col("a"), 12, 2, F.col("b"), 12, 2).alias("m"),
    ).collect()
    return {(r["a"], r["b"]): r for r in rows}


def test_div_truncates_toward_zero(arith):
    """arith::DivSIOp semantics: quantize ROUND_DOWN at the result scale,
    all four sign combinations (never floor: -7/3 is -2.33..., not -3)."""
    scale = Decimal(1).scaleb(-14)          # div_type -> (26,14)
    for a, b in CASES:
        expected = (a / b).quantize(scale, rounding=ROUND_DOWN)
        assert arith[(a, b)]["q"] == expected, (a, b)


def test_mod_sign_of_dividend(arith):
    for a, b in CASES:
        expected = a - (a / b).to_integral_value(rounding=ROUND_DOWN) * b
        assert arith[(a, b)]["r"] == expected, (a, b)


def test_mul_exact(arith):
    for a, b in CASES:
        assert arith[(a, b)]["m"] == a * b, (a, b)


def test_result_types_match_inference(arith, spark):
    df = spark.createDataFrame(CASES, "a decimal(12,2), b decimal(12,2)")
    out = df.select(
        dec.dec_div(F.col("a"), 12, 2, F.col("b"), 12, 2).alias("q"),
        dec.dec_mod(F.col("a"), 12, 2, F.col("b"), 12, 2).alias("r"),
        dec.dec_mul(F.col("a"), 12, 2, F.col("b"), 12, 2).alias("m"),
    )
    assert out.schema["q"].dataType == T.DecimalType(26, 14)
    assert out.schema["r"].dataType == T.DecimalType(12, 2)
    assert out.schema["m"].dataType == T.DecimalType(24, 4)


def test_avg_exact_at_scale_21(spark):
    """The (31,21) promotion carries all 21 fractional digits exactly —
    the digit-assembly rescale must not round (a 1-ulp error at scale 6
    was the failure mode of the naive multiplicative rendering)."""
    vals = [Decimal("10.00"), Decimal("10.00"), Decimal("10.01")]
    df = spark.createDataFrame([(v,) for v in vals], "x decimal(12,2)")
    got = df.agg(dec.dec_avg(F.col("x"), 12, 2).alias("a")).collect()[0]["a"]
    scale = Decimal(1).scaleb(-21)
    expected = (sum(vals) / 3).quantize(scale, rounding=ROUND_DOWN)
    assert got == expected
    assert got.as_tuple().exponent == -21


def test_div_by_zero_yields_null(spark):
    df = spark.createDataFrame([(Decimal("1.00"), Decimal("0.00"))],
                               "a decimal(12,2), b decimal(12,2)")
    row = df.select(
        dec.dec_div(F.col("a"), 12, 2, F.col("b"), 12, 2).alias("q")).collect()
    assert row[0]["q"] is None


# ---------------------------------------------------------------------------
# Decimal-typed CREATE TABLE round-trip
# ---------------------------------------------------------------------------

def test_decimal_create_table_roundtrip(spark):
    """CREATE TABLE with decimal columns -> INSERT -> read back: types and
    values survive the parquet round trip (reference DDL decimal columns,
    resources/sql/tpch/initialize.sql price DECIMAL(15,2)).  The table is
    dropped afterwards — no warehouse leak."""
    name = "dec_roundtrip_t"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        spark.sql(f"CREATE TABLE {name} "
                  "(k INT, price DECIMAL(15,2), rate DECIMAL(8,6)) USING parquet")
        spark.sql(f"INSERT INTO {name} VALUES "
                  "(1, CAST(12345.67 AS DECIMAL(15,2)), "
                  " CAST(0.123456 AS DECIMAL(8,6))), "
                  "(2, CAST(-0.01 AS DECIMAL(15,2)), "
                  " CAST(1.5 AS DECIMAL(8,6)))")
        back = spark.table(name)
        assert back.schema["price"].dataType == T.DecimalType(15, 2)
        assert back.schema["rate"].dataType == T.DecimalType(8, 6)
        got = {r["k"]: (r["price"], r["rate"]) for r in back.collect()}
        assert got[1] == (Decimal("12345.67"), Decimal("0.123456"))
        assert got[2] == (Decimal("-0.01"), Decimal("1.500000"))
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


# ---------------------------------------------------------------------------
# SQL oracle renderers (round 4): the DuckDB-side renderings must agree
# with Python Decimal ground truth — the property that makes the driver's
# cross-engine hash compare meaningful regardless of DuckDB version.
# ---------------------------------------------------------------------------

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st


def _pydec_truncdiv(a: Decimal, b: Decimal, p: int, s: int) -> Decimal:
    """Reference semantics: scaled-integer division truncating toward
    zero (LowerToStd.cpp:1602), quantized to (p,s)."""
    q = (a / b).quantize(Decimal(1).scaleb(-s), rounding=ROUND_DOWN)
    return q


@settings(max_examples=200, deadline=None)
@given(
    ai=st.integers(min_value=-10**8, max_value=10**8),
    bi=st.integers(min_value=-10**4, max_value=10**4).filter(lambda x: x),
)
def test_sql_dec_div_matches_python_decimal(ai, bi):
    a = Decimal(ai).scaleb(-2)          # decimal(12,2)
    b = Decimal(bi).scaleb(-1)          # decimal(4,1)-ish magnitude
    sql = dec.SQL_DEC_DIV(f"CAST('{a}' AS DECIMAL(12,2))", 12, 2,
                          f"CAST('{b}' AS DECIMAL(6,1))", 6, 1)
    got = duckdb.sql(f"SELECT {sql} AS v").fetchone()[0]
    p, s = dec.div_type(12, 2, 6, 1)
    want = _pydec_truncdiv(a, b, p, s)
    assert got == want, (a, b, got, want)


@settings(max_examples=200, deadline=None)
@given(
    ai=st.integers(min_value=-10**8, max_value=10**8),
    bi=st.integers(min_value=-10**4, max_value=10**4).filter(lambda x: x),
)
def test_sql_dec_mod_matches_python_decimal(ai, bi):
    a = Decimal(ai).scaleb(-2)
    b = Decimal(bi).scaleb(-1)
    sql = dec.SQL_DEC_MOD(f"CAST('{a}' AS DECIMAL(12,2))", 12, 2,
                          f"CAST('{b}' AS DECIMAL(6,1))", 6, 1)
    got = duckdb.sql(f"SELECT {sql} AS v").fetchone()[0]
    # C remainder: a - b*truncdiv(a,b), sign of the dividend
    q = (a / b).to_integral_value(rounding=ROUND_DOWN)
    want = a - b * q
    assert got == want, (a, b, got, want)


@settings(max_examples=100, deadline=None)
@given(vals=st.lists(st.integers(min_value=-10**9, max_value=10**9),
                     min_size=1, max_size=30))
def test_sql_dec_avg_matches_python_decimal(vals):
    decs = [Decimal(v).scaleb(-2) for v in vals]          # decimal(12,2)
    rows = ", ".join(f"(CAST('{d}' AS DECIMAL(12,2)))" for d in decs)
    sql = dec.SQL_DEC_AVG("x", 12, 2)
    got = duckdb.sql(
        f"SELECT {sql} AS v FROM (VALUES {rows}) t(x)").fetchone()[0]
    pr, sr = dec.avg_type(12, 2)
    # 28-digit default context would round the quotient's last digit
    # before the truncation — widen so ground truth is true truncation
    from decimal import localcontext
    with localcontext() as ctx:
        ctx.prec = 60
        want = (sum(decs) / len(decs)).quantize(
            Decimal(1).scaleb(-sr), rounding=ROUND_DOWN)
    assert got == want, (decs, got, want)


def test_sql_rescale_wide_scale_textual_path():
    # The (31,21) AVG promotion type exceeds every loss-free arithmetic
    # rendering — the textual path must carry all 21 fractional digits.
    out = duckdb.sql(
        "SELECT " + dec._sql_rescale("123456789", 31, 21) + " AS v"
    ).fetchone()[0]
    assert out == Decimal("0.000000000000123456789")
    neg = duckdb.sql(
        "SELECT " + dec._sql_rescale("-123456789", 31, 21) + " AS v"
    ).fetchone()[0]
    assert neg == Decimal("-0.000000000000123456789")


def test_sql_cast_dec_matches_spark_semantics():
    # 0.145 as a double is 0.1449999...; Spark casts via the shortest
    # string repr + HALF_UP -> 0.15.  SQL_CAST_DEC must agree on every
    # DuckDB version (a direct binary-scaling cast would give 0.14).
    got = duckdb.sql(
        "SELECT " + dec.SQL_CAST_DEC("CAST(0.145 AS DOUBLE)", 18, 2)
        + " AS v").fetchone()[0]
    assert got == Decimal("0.15")
    neg = duckdb.sql(
        "SELECT " + dec.SQL_CAST_DEC("CAST(-0.145 AS DOUBLE)", 18, 2)
        + " AS v").fetchone()[0]
    assert neg == Decimal("-0.15")
