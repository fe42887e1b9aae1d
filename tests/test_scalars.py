"""Scalar-function semantics pinned on literals — the analogue of the
reference's test/lit/DB kernel tests (stringops, dates, decimalops,
casts), for the cases the DuckDB-oracle queries can't pin (rounding at the
.5 boundary, erf values, engine-internal hash determinism).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from lingo_db_spark import functions as lf


def one(spark, *cols):
    return spark.range(1).select(*cols).collect()[0]


def test_round_half_away_from_zero(spark):
    # Reference RoundDecimal/RoundInt rounds half away from zero
    # (DecimalRuntime.h:6); Spark F.round on literals agrees.
    out = one(spark,
              lf.round_half_up(F.lit(2.5), 0).alias("a"),
              lf.round_half_up(F.lit(-2.5), 0).alias("b"),
              lf.round_half_up(F.lit(0.125), 2).alias("c"))
    assert out.a == 3.0 and out.b == -3.0
    assert out.c == 0.13


def test_substring_is_one_based_and_open_ended(spark):
    out = one(spark,
              lf.substring(F.lit("hello world"), 1, 5).alias("a"),
              lf.substring(F.lit("hello world"), 7).alias("b"))
    assert (out.a, out.b) == ("hello", "world")


def test_string_find_zero_based_minus_one_absent(spark):
    # Reference StringFind: 0-based index, -1 when absent
    # (RuntimeFunctions.cpp:277).
    out = one(spark,
              lf.string_find(F.lit("hello"), "ll").alias("a"),
              lf.string_find(F.lit("hello"), "zz").alias("b"))
    assert (out.a, out.b) == (2, -1)


def test_string_split_literal_separator(spark):
    # Split on a regex metacharacter must treat it literally.
    out = one(spark, lf.string_split(F.lit("a.b.c"), ".").alias("s"))
    assert out.s == ["a", "b", "c"]


def test_extract_fields(spark):
    ts = F.lit("1996-03-15 13:45:30").cast("timestamp_ntz")
    out = one(spark,
              lf.extract("year", ts).alias("y"), lf.extract("month", ts).alias("m"),
              lf.extract("day", ts).alias("d"), lf.extract("hour", ts).alias("h"),
              lf.extract("minute", ts).alias("mi"), lf.extract("second", ts).alias("s"))
    assert (out.y, out.m, out.d, out.h, out.mi, out.s) == (1996, 3, 15, 13, 45, 30)


def test_extract_unknown_field_raises(spark):
    try:
        lf.extract("fortnight", F.lit("1996-03-15").cast("date"))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "fortnight" in str(e)


def test_erf_matches_math_erf(spark):
    # Vectorized pandas UDF vs CPython math.erf (same kernel contract as
    # reference FloatRuntime::erf).
    df = spark.createDataFrame([(x / 10.0,) for x in range(-20, 21)], "x DOUBLE")
    got = {r.x: r.e for r in df.select("x", lf.erf("x").alias("e")).collect()}
    for x, e in got.items():
        assert abs(e - math.erf(x)) < 1e-12


def test_hash64_deterministic_and_distinct(spark):
    df = spark.createDataFrame([("a",), ("b",), ("a",)], "s STRING")
    h = df.select(lf.hash64("s").alias("h")).collect()
    assert h[0].h == h[2].h and h[0].h != h[1].h


def test_date_diff_and_add(spark):
    d1 = F.lit("1996-01-01").cast("timestamp_ntz")
    d2 = F.lit("1996-03-15").cast("timestamp_ntz")
    out = one(spark,
              lf.date_diff_days(d2, d1).alias("dd"),
              lf.date_add_days(d1, 74).cast("string").alias("da"),
              lf.date_subtract_days(d2, 74).cast("string").alias("ds"))
    assert out.dd == 74
    assert out.da == "1996-03-15"
    assert out.ds == "1996-01-01"


def test_date_trunc_units(spark):
    ts = F.lit("1996-03-15 13:45:30").cast("timestamp_ntz")
    out = one(spark,
              lf.date_trunc("month", ts).cast("string").alias("m"),
              lf.date_trunc("year", ts).cast("string").alias("y"),
              lf.date_trunc("hour", ts).cast("string").alias("h"))
    assert out.m == "1996-03-01 00:00:00"
    assert out.y == "1996-01-01 00:00:00"
    assert out.h == "1996-03-15 13:00:00"


def test_random_in_range_bounds(spark):
    vals = [r.v for r in
            spark.range(200).select(lf.random_in_range(5, 10).alias("v")).collect()]
    assert all(5 <= v < 10 for v in vals)
    assert len(set(vals)) > 1


def test_dsum_invariant_to_partitioning_and_order(spark):
    """Fixed-point micro-unit sums must be bit-identical under any
    partitioning / summation order — the property the oracle hash compare
    relies on.  Doubles with >6 decimals exercise the per-row rounding."""
    import random
    rng = random.Random(7)
    vals = [round(rng.uniform(-1000, 1000), 9) for _ in range(5000)]
    base = spark.createDataFrame([(v,) for v in vals], "v DOUBLE")
    results = set()
    for parts in (1, 3, 32):
        df = base.repartition(parts)
        row = df.agg(lf.dsum("v").alias("s"), lf.davg("v").alias("a")).first()
        results.add((repr(row.s), repr(row.a)))
    shuffled = spark.createDataFrame(
        [(v,) for v in sorted(vals)], "v DOUBLE").repartition(8)
    row = shuffled.agg(lf.dsum("v").alias("s"), lf.davg("v").alias("a")).first()
    results.add((repr(row.s), repr(row.a)))
    assert len(results) == 1


def test_dsum_exact_on_monetary_decimals(spark):
    """2-decimal monetary values sum exactly (no float drift): 0.1+0.2
    style cases land on the true cent total."""
    df = spark.createDataFrame([(0.1,), (0.2,), (0.3,), (104999.91,)],
                               "v DOUBLE")
    assert df.agg(lf.dsum("v").alias("s")).first().s == 105000.51


def test_dsum_exact_is_exact_decimal(spark):
    """dsum_exact returns the exact DECIMAL(38,10) sum — no rounding, no
    double round-trip — for callers beyond the micro-unit bound."""
    from decimal import Decimal
    df = spark.createDataFrame([(0.1,), (0.2,)], "v DOUBLE")
    out = df.agg(lf.dsum_exact("v").alias("s")).first().s
    assert isinstance(out, Decimal)
    # cast-of-double captures each double's true expansion at 1e-10
    assert out == Decimal("0.3000000000")


# --- char(n) semantics (functions/chartype.py) -------------------------------

def test_char_unequal_length_promotes_to_string_compare(spark):
    """Reference sql_analyzer.cpp:2985-2992: unequal-length chars compare
    as raw strings — trailing spaces significant (ANSI padding would say
    'BU' == 'BU  ')."""
    from lingo_db_spark.functions import chartype as ct
    df = spark.createDataFrame([("BU", "BU  "), ("BU", "BU")], "a string, b string")
    rows = df.select(ct.char_eq("a", 2, "b", 4).alias("eq")).collect()
    assert [r.eq for r in rows] == [False, True]


def test_char1_codepoint_storage_and_compare(spark):
    from lingo_db_spark.functions import chartype as ct
    df = spark.createDataFrame([("Alpha", "Apple"), ("Beta", "Cap")],
                               "a string, b string")
    got = df.select(ct.char1_code("a").alias("code"),
                    ct.char_eq("a", 1, "b", 1).alias("eq")).collect()
    assert got[0].code == 65 and got[0].eq is True
    assert got[1].code == 66 and got[1].eq is False


def test_char_value_truncates_no_pad(spark):
    from lingo_db_spark.functions import chartype as ct
    df = spark.createDataFrame([("abcdef",), ("ab",)], "s string")
    got = [r.c for r in df.select(ct.char_value("s", 4).alias("c")).collect()]
    assert got == ["abcd", "ab"]   # short values NOT padded to 4


# --- interval arithmetic ------------------------------------------------------

def test_month_interval_clamps_month_end(spark):
    """Jan 31 + 1 month clamps to Feb 28/29 (Spark & DuckDB agree; the
    reference's gandiva-derived kernel overflows instead — divergence
    documented in functions.date_add_interval)."""
    import datetime
    from lingo_db_spark import functions as lf
    from pyspark.sql import functions as F
    df = spark.sql("SELECT TIMESTAMP_NTZ '2023-01-31 10:00:00' AS t, "
                   "TIMESTAMP_NTZ '2024-01-31 00:00:00' AS leap")
    row = df.select(
        lf.date_add_interval("t", lf.interval_months(1)).alias("a"),
        lf.date_add_interval("leap", lf.interval_months(1)).alias("b"),
        lf.date_subtract_interval("t", lf.interval_years(1)).alias("c"),
    ).collect()[0]
    assert row.a == datetime.datetime(2023, 2, 28, 10, 0)
    assert row.b == datetime.datetime(2024, 2, 29, 0, 0)
    assert row.c == datetime.datetime(2022, 1, 31, 10, 0)


def test_daytime_interval_is_exact_duration(spark):
    import datetime
    from lingo_db_spark import functions as lf
    df = spark.sql("SELECT TIMESTAMP_NTZ '2023-03-25 23:30:00' AS t")
    row = df.select(
        lf.date_add_interval("t", lf.interval_daytime(days=1, hours=2,
                                                      mins=45)).alias("a")
    ).collect()[0]
    assert row.a == datetime.datetime(2023, 3, 27, 2, 15)


def test_string_rfind_and_diff_units(spark):
    from lingo_db_spark import functions as lf
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [("ababab",), ("xyz",), ("1click1",)], "s string")
    got = [r.p for r in df.select(
        lf.string_rfind("s", "ab").alias("p")).collect()]
    assert got == [4, -1, -1]
    got1 = [r.p for r in df.select(
        lf.string_rfind("s", "1").alias("p")).collect()]
    assert got1 == [-1, -1, 6]
    d = spark.sql("SELECT TIMESTAMP_NTZ '2024-01-01 00:00:00' AS a, "
                  "TIMESTAMP_NTZ '2024-01-01 02:59:59' AS b")
    row = d.select(lf.date_diff_hours("b", "a").alias("h"),
                   lf.date_diff_minutes("b", "a").alias("m"),
                   lf.date_diff_seconds("b", "a").alias("s")).collect()[0]
    # whole elapsed units, truncated — NOT boundary crossings
    assert (row.h, row.m, row.s) == (2, 179, 10799)
    # reversed arguments: C++ integer division truncates TOWARD ZERO,
    # so a -2:59:59 span is -2 hours / -179 minutes (not -3 / -180)
    rev = d.select(lf.date_diff_hours("a", "b").alias("h"),
                   lf.date_diff_minutes("a", "b").alias("m"),
                   lf.date_diff_seconds("a", "b").alias("s")).collect()[0]
    assert (rev.h, rev.m, rev.s) == (-2, -179, -10799)
    # sub-unit negative span truncates to 0, not -1
    d2 = spark.sql("SELECT TIMESTAMP_NTZ '2024-01-01 00:00:00' AS a, "
                   "TIMESTAMP_NTZ '2024-01-01 00:59:00' AS b")
    rev2 = d2.select(lf.date_diff_hours("a", "b").alias("h")).collect()[0]
    assert rev2.h == 0
