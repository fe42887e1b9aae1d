"""Scalar function library — LingoDB's runtime function registry mapped to
Spark expressions (reference
src/compiler/Dialect/DB/RuntimeFunctions/RuntimeFunctions.cpp:271-344).

Everything here stays JVM-side (whole-stage codegen) except `erf`, which
Spark lacks as a builtin and is provided as a vectorized pandas UDF
(reference FloatRuntime.h:10).

Also hosts the *deterministic aggregation* helpers: sums/avgs over doubles
are order-dependent in any parallel engine, so cross-engine hash
comparison (our DuckDB oracle gate) needs exact arithmetic.  We cast to
decimal(38,10) before SUM — exact and associative — then cast the total
back to double.  This mirrors the reference's SimplifyAggregations pass,
which decomposes avg/stddev into sums and counts
(reference src/compiler/Dialect/RelAlg/Transforms/SimplifyAggregations.cpp:109-179).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# Deterministic aggregates over doubles (exact decimal accumulation)
# ---------------------------------------------------------------------------

def dsum(col: Column | str) -> Column:
    """Order-insensitive SUM for double columns via fixed-point micro-unit
    accumulation: each value is rounded to 1e-6 (one IEEE multiply + a
    half-away round on the identical double both engines hold, so the
    per-row micro value is bit-equal cross-engine by construction) and
    summed EXACTLY as int64.  Result surfaces as double rounded to 4
    decimals.  This is the reference's own money model — LingoDB stores
    monetary columns as fixed-point DECIMAL(15,2) (SURVEY.md §1.2) — and
    it keeps the aggregation inside whole-stage codegen as primitive long
    adds: measured ~100x over a decimal(38,10) accumulator on the q1
    8-aggregate pass (0.65 s -> 0.04 s at sf0.1 on 32 cores).

    Bounds: per-group sums stay exact up to 2^63 micro-units ≈ 9.2e12
    currency units — far beyond any TPC-H group sum below ~sf2000.  For
    unbounded magnitudes use an explicit decimal accumulator
    (`F.sum(c.cast(DEC))`), as the decision-boundary queries do.
    Oracle equivalent: SQL_DSUM."""
    micros = F.round(_c(col) * F.lit(1_000_000.0), 0).cast("long")
    return F.round(F.sum(micros).cast("double") / F.lit(1_000_000.0), 4)


def davg(col: Column | str) -> Column:
    """Order-insensitive AVG: exact micro-unit sum / count, in double,
    rounded to 6 decimals (see dsum)."""
    c = _c(col)
    micros = F.round(c * F.lit(1_000_000.0), 0).cast("long")
    return F.round(F.sum(micros).cast("double") / F.lit(1_000_000.0)
                   / F.count(c), 6)


def dsum_exact(col: Column | str) -> Column:
    """Unbounded exact accumulation — SUM over DECIMAL(38,10), the
    reference's widest decimal semantics, returned AS DECIMAL (no
    rounding, no double cast).  The decision-boundary queries (HAVING
    thresholds, correlated comparisons) use this form inline; it is the
    right tool when magnitudes may exceed dsum's 2^63-micro-unit bound or
    when the caller needs the exact decimal, at the cost of the
    BigDecimal accumulation path (~100x slower per row than dsum's long
    adds)."""
    return F.sum(_c(col).cast(DEC))


def dvar_samp(col: Column | str) -> Column:
    """var_samp via exact sums: (sum(x^2) - sum(x)^2/n) / (n-1), the same
    decomposition the reference applies (SimplifyAggregations.cpp:109-146)."""
    c = _c(col)
    n = F.count(c).cast("double")
    sx = F.sum(c.cast(DEC)).cast("double")
    sxx = F.sum((c * c).cast(DEC)).cast("double")
    return F.round(F.when(n > 1, (sxx - sx * sx / n) / (n - F.lit(1.0))), 6)


def dstddev_samp(col: Column | str) -> Column:
    return F.round(F.sqrt(dvar_samp(col)), 6)


def SQL_DSUM(expr: str) -> str:
    """DuckDB-side rendering of dsum(): identical micro-unit fixed-point
    definition (ROUND of the same IEEE double product, exact int64 sum)."""
    return (f"ROUND(CAST(SUM(CAST(ROUND(({expr}) * 1000000.0) AS BIGINT)) "
            f"AS DOUBLE) / 1000000.0, 4)")


def SQL_DAVG(expr: str) -> str:
    return (f"ROUND(CAST(SUM(CAST(ROUND(({expr}) * 1000000.0) AS BIGINT)) "
            f"AS DOUBLE) / 1000000.0 / COUNT({expr}), 6)")


def SQL_DVAR(expr: str) -> str:
    return (f"ROUND((CASE WHEN COUNT({expr}) > 1 THEN "
            f"(CAST(SUM(CAST((({expr})*({expr})) AS DECIMAL(38,10))) AS DOUBLE)"
            f" - CAST(SUM(CAST(({expr}) AS DECIMAL(38,10))) AS DOUBLE)"
            f" * CAST(SUM(CAST(({expr}) AS DECIMAL(38,10))) AS DOUBLE)"
            f" / CAST(COUNT({expr}) AS DOUBLE))"
            f" / (CAST(COUNT({expr}) AS DOUBLE) - 1.0) END), 6)")


def SQL_DSTDDEV(expr: str) -> str:
    return f"ROUND(SQRT({SQL_DVAR(expr)}), 6)"


# ---------------------------------------------------------------------------
# Scalar functions (RuntimeFunctions.cpp registry -> Spark builtins)
# ---------------------------------------------------------------------------

def substring(col, pos, length=None) -> Column:
    """1-based substring, identical semantics to reference
    StringRuntime::substr (RuntimeFunctions.cpp:276).  Open-ended form uses
    a max-int length (public API only — no JVM internals)."""
    c = _c(col)
    return F.substring(c, pos, length if length is not None else 2147483647)


def string_find(col, needle) -> Column:
    """Reference StringFind (RuntimeFunctions.cpp:277): 0-based find, -1 if
    absent (Spark locate is 1-based, 0 if absent)."""
    return (F.locate(needle, _c(col)) - 1)


def string_split(col, sep) -> Column:
    """Reference StringSplit (RuntimeFunctions.cpp:279) -> list<string>.
    LingoDB splits on a literal separator; F.split takes a regex, so quote."""
    import re
    return F.split(_c(col), re.escape(sep))


def ord_(col) -> Column:
    return F.ascii(_c(col))           # reference Ord (RuntimeFunctions.cpp:280)


def round_half_up(col, scale: int = 0) -> Column:
    """Reference RoundDecimal/RoundInt64 round half away from zero
    (reference DecimalRuntime.h:6); Spark F.round on doubles is HALF_UP on
    the decimal representation — matching. Pinned here as the single entry
    point so semantics live in one place."""
    return F.round(_c(col), scale)


def cast_int_rounded(col) -> Column:
    """Decimal -> integer cast with REFERENCE semantics: round half away
    from zero, as postgres and DuckDB `::integer` do (2.5 -> 3,
    -2.5 -> -3).  Spark's CAST truncates toward zero (2.5 -> 2) — the
    engine divergence TPC-DS q78's ratio column exposed (r8).  Route
    any reference-parity decimal->int cast through here; this and every
    other documented engine divergence carries a value-checked witness
    in tests/test_divergences.py."""
    return F.round(_c(col), 0).cast("long")


def date_trunc(unit: str, col) -> Column:
    return F.date_trunc(unit, _c(col))   # reference DateTrunc (DateRuntime.h:18)


def string_rfind(col, needle: str) -> Column:
    """Reference PyStringRFind (RuntimeFunctions.cpp:287): LAST 0-based
    index of a literal needle, -1 when absent — located by searching the
    reversed haystack with the reversed needle (stays JVM-side)."""
    c = _c(col)
    rev_pos = F.locate(needle[::-1], F.reverse(c))   # 1-based from the end
    return F.when(rev_pos == 0, F.lit(-1)).otherwise(
        F.length(c) - rev_pos - F.lit(len(needle) - 1)).cast("long")


def date_diff_days(end, start) -> Column:
    """Reference DateDiffDay (DateRuntime.h:14)."""
    return F.datediff(_c(end), _c(start))


_EXTRACT_FIELDS = {
    "year": F.year, "month": F.month, "day": F.dayofmonth,
    "hour": F.hour, "minute": F.minute, "second": F.second,
    "dow": F.dayofweek, "doy": F.dayofyear, "week": F.weekofyear,
    "quarter": F.quarter,
}


def extract(field: str, col) -> Column:
    """Reference ExtractFromDate family (DateRuntime.h:6-11), dispatched to
    the matching Spark builtin (all JVM-side, codegen-friendly)."""
    try:
        return _EXTRACT_FIELDS[field.lower()](_c(col))
    except KeyError:
        raise ValueError(
            f"unsupported extract field {field!r}; "
            f"known: {sorted(_EXTRACT_FIELDS)}") from None


_ERF_UDF = None


def erf(col) -> Column:
    """Gauss error function — reference FloatRuntime::erf
    (RuntimeFunctions.cpp:339). No Spark builtin; vectorized pandas UDF,
    created lazily (pandas_udf needs an active session)."""
    global _ERF_UDF
    if _ERF_UDF is None:
        @F.pandas_udf("double")
        def _erf(x: pd.Series) -> pd.Series:
            return x.map(math.erf)
        _ERF_UDF = _erf
    return _ERF_UDF(_c(col))


def hash64(*cols) -> Column:
    """Reference Hash/CombineHashes (RuntimeFunctions.cpp:341-344)."""
    return F.xxhash64(*[_c(c) for c in cols])


# The rest of the reference runtime registry
# (RuntimeFunctions.cpp:278-340) maps 1:1 onto Spark builtins; wrapped here
# so the engine's function surface is complete and each one has a single
# pinned entry point (semantics tested in tests/test_scalars.py and the
# scalars_* oracle queries).

def string_length(col) -> Column:
    return F.length(_c(col))              # StringLength (:278)


def to_upper(col) -> Column:
    return F.upper(_c(col))               # ToUpper (:282)


def to_lower(col) -> Column:
    return F.lower(_c(col))               # ToLower (:283)


def contains(col, needle) -> Column:
    return F.contains(_c(col), F.lit(needle))   # Contains (:284)


def concatenate(*cols) -> Column:
    return F.concat(*[_c(c) for c in cols])     # Concatenate (:285)


def replace(col, search: str, repl: str) -> Column:
    """Literal (non-regex) replace — reference Replace (:288)."""
    return F.replace(_c(col), F.lit(search), F.lit(repl))


def regexp_replace(col, pattern: str, repl: str) -> Column:
    return F.regexp_replace(_c(col), pattern, repl)   # RegexpReplace (:290)


def like(col, pattern: str) -> Column:
    return _c(col).like(pattern)          # Like/ConstLike (:291-292)


def starts_with(col, prefix: str) -> Column:
    return F.startswith(_c(col), F.lit(prefix))   # StringRuntime.h:15


def ends_with(col, suffix: str) -> Column:
    return F.endswith(_c(col), F.lit(suffix))     # StringRuntime.h:16


def abs_(col) -> Column:
    return F.abs(_c(col))                 # AbsInt/AbsDecimal (:332-333)


def sqrt(col) -> Column:
    return F.sqrt(_c(col))                # FloatRuntime (:334)


def sin(col) -> Column:
    return F.sin(_c(col))


def cos(col) -> Column:
    return F.cos(_c(col))


def asin(col) -> Column:
    return F.asin(_c(col))


def log(col) -> Column:
    """Natural log — reference FloatRuntime::log (:336)."""
    return F.log(_c(col))


def exp(col) -> Column:
    return F.exp(_c(col))


def date_add_days(col, days) -> Column:
    """Reference DateAdd (RuntimeFunctions.cpp:329, const-foldable)."""
    return F.date_add(_c(col), days)


def date_subtract_days(col, days) -> Column:
    return F.date_sub(_c(col), days)      # DateSubtract (:330)


def _diff_units(end, start, unit_us: int) -> Column:
    """Reference DateDiff{Hour,Minute,Second} (RuntimeFunctions.cpp:
    317-321, kernels DateRuntime.h:14-17): whole elapsed units as the
    truncated quotient of the raw epoch difference — NOT calendar
    boundary crossings.  C++ integer division truncates TOWARD ZERO, so
    the remainder must carry the dividend's sign (Spark's `%`), not
    pmod: with pmod a -59-minute span would report -1 hour instead of
    the reference's 0."""
    d = F.unix_micros(_c(end).cast("timestamp")) \
        - F.unix_micros(_c(start).cast("timestamp"))
    return (d - d % F.lit(unit_us)) / F.lit(unit_us)


def date_diff_hours(end, start) -> Column:
    return _diff_units(end, start, 3_600_000_000).cast("long")


def date_diff_minutes(end, start) -> Column:
    return _diff_units(end, start, 60_000_000).cast("long")


def date_diff_seconds(end, start) -> Column:
    return _diff_units(end, start, 1_000_000).cast("long")


# ---------------------------------------------------------------------------
# Interval arithmetic — the reference's two-part interval model
# (DBOps.td:95-105: interval<months> | interval<daytime>), which is
# exactly Spark's YearMonthIntervalType / DayTimeIntervalType split.
# DateAdd/DateSubtract are interval-kind-dispatched
# (RuntimeFunctions.cpp:15-55 dateAddImpl: daytime = raw nanos add,
# months = DateRuntime::addMonths calendar arithmetic).
# ---------------------------------------------------------------------------

def interval_months(n: int) -> Column:
    """interval<months> literal (reference sql_analyzer.cpp:2542-2575
    binds INTERVAL '<n> months')."""
    return F.make_ym_interval(F.lit(0), F.lit(n))


def interval_years(n: int) -> Column:
    """INTERVAL '<n> years' — the reference normalizes years to months
    at bind time (sql_analyzer.cpp:2560-2565, years*12)."""
    return F.make_ym_interval(F.lit(0), F.lit(n * 12))


def interval_daytime(days: int = 0, hours: int = 0, mins: int = 0,
                     secs: float = 0.0) -> Column:
    """interval<daytime> literal — a single nanosecond count in the
    reference (dateAddImpl lowers + to one integer add)."""
    return F.make_dt_interval(F.lit(days), F.lit(hours), F.lit(mins),
                              F.lit(secs))


def date_add_interval(col, interval: Column) -> Column:
    """DateAdd over an interval value (RuntimeFunctions.cpp:329).
    Month intervals use calendar month arithmetic; note the reference's
    adapted-from-gandiva kernel (src/runtime/DateRuntime.cpp:35-40) lets
    an invalid day-of-month overflow into the next month, while Spark
    and DuckDB both clamp to the month's last day (ANSI) — the engines
    agree with each other, and the divergence from the reference is
    confined to Jan 29-31 + month-intervals."""
    return _c(col) + interval


def date_subtract_interval(col, interval: Column) -> Column:
    """DateSubtract over an interval value (RuntimeFunctions.cpp:330)."""
    return _c(col) - interval


def random_in_range(lo: int, hi: int) -> Column:
    """Reference RandomInRange (IntegerRuntime.h:11): uniform int in
    [lo, hi).  Nondeterministic by design — never used in oracle queries."""
    return (F.floor(F.rand() * (hi - lo)) + lo).cast("long")
