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
