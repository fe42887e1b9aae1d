"""Decimal(p,s) parity — the reference engine's decimal *type inference*
and *value semantics*, reproduced exactly on Spark.

Type inference (reference src/compiler/Dialect/DB/DBOps.cpp:237-273 and
src/compiler/frontend/sql_analyzer.cpp:3083-3111):

- mul:  raw (pa+pb, sa+sb), then adapted
- div:  scale' = max(6, sa+pb); prec' = (pa-sa) + sb + scale'; adapted
- mod:  (min(pa-sa, pb-sb) + max(sa,sb), max(sa,sb)) — not adapted
- adapt(p,s) (DBOps.cpp:98-107 getAdaptedDecimalTypeAfterMulDiv):
    ipart = p - s
    ipart > 32 and s > 6  -> (38, 6)
    ipart > 32 and s <= 6 -> (38, s)
    else                  -> (min(p,38), min(s, 38-ipart))
- AVG promotion (sql_analyzer.cpp:2636-2642): INT -> div-rule on
  (decimal(19,0), decimal(19,0)); decimal(p,s) -> div-rule on
  ((p,s), decimal(19,0)).  SUM keeps the argument type in the analyzer;
  the 128-bit runtime accumulator means the honest Spark rendering is a
  DECIMAL(38,s) sum (overflow widening).

Value semantics: decimal division and modulo lower to *scaled integer
division with truncation toward zero* (reference
src/compiler/Conversion/DBToStd/LowerToStd.cpp:1602-1603,
DecimalOpScaledLowering over arith::DivSIOp/RemSIOp) — NOT rounding.
Spark's native decimal `/` rounds HALF_UP, so `dec_div` reproduces
truncation exactly with an integer identity that stays inside
whole-stage codegen (no UDF):

    trunc(num / den) == (num - num % den) / den        (exact division)

Spark's decimal `%` takes the dividend's sign, so the identity truncates
toward zero for negatives too — the same result as arith::DivSIOp.
DuckDB's integer `//` also truncates toward zero (probed: -7//2 == -3),
so the SQL_* renderers below produce bit-identical oracle values.

Overflow contract: intermediates ride DECIMAL(38,0) (Spark's i128-backed
unscaled space) — the same 38-digit bound as the reference's __int128
runtime (include/lingodb/runtime/DecimalRuntime.h:6).  Values that
exceed it null out under Spark's non-ANSI mode instead of wrapping.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Type inference (pure, mirrors DBOps.cpp)
# ---------------------------------------------------------------------------

def adapt_mul_div(p: int, s: int) -> tuple[int, int]:
    """getAdaptedDecimalTypeAfterMulDiv (DBOps.cpp:98-107)."""
    ipart = p - s
    if ipart > 32 and s > 6:
        return 38, 6
    if ipart > 32:
        return 38, s
    return min(p, 38), min(s, 38 - ipart)


def mul_type(pa: int, sa: int, pb: int, sb: int) -> tuple[int, int]:
    """inferMulReturnType (DBOps.cpp:237-250)."""
    return adapt_mul_div(pa + pb, sa + sb)


def div_type(pa: int, sa: int, pb: int, sb: int) -> tuple[int, int]:
    """inferDivReturnType (DBOps.cpp:251-262)."""
    s = max(6, sa + pb)
    return adapt_mul_div(pa - sa + sb + s, s)


def mod_type(pa: int, sa: int, pb: int, sb: int) -> tuple[int, int]:
    """inferRemReturnType (DBOps.cpp:264-273)."""
    s = max(sa, sb)
    return min(pa - sa, pb - sb) + s, s


def avg_type(p: int | None = None, s: int | None = None) -> tuple[int, int]:
    """AVG result type (sql_analyzer.cpp:2636-2642).  No args = INT input."""
    if p is None:
        p, s = 19, 0
    return div_type(p, s, 19, 0)


def _dt(p: int, s: int) -> str:
    return f"decimal({p},{s})"


# ---------------------------------------------------------------------------
# Column operators (JVM expressions only — no UDFs)
# ---------------------------------------------------------------------------

def _pow10(k: int) -> Column:
    """10^k as a plain-notation decimal literal (scientific-notation
    Decimals like 1E+19 infer a bogus scale through F.lit)."""
    return F.lit(Decimal(10 ** k))


def _unscaled(c: Column, s: int) -> Column:
    """Exact unscaled integer of a decimal column (value * 10^s)."""
    if s == 0:
        return c.cast(_D38)
    return (c * _pow10(s)).cast(_D38)


def _rescale(q: Column, p: int, s: int) -> Column:
    """Exact decimal(p,s) from an unscaled DECIMAL(38,0) integer.

    Two paths.  When p+s <= 36, multiply by the 10^-s literal: the raw
    product type (min(p,36-s)+s+2, s) stays within 38 digits, so Spark's
    precision-loss adjustment never fires and the multiply is exact.
    Wider results (e.g. the AVG promotion types (31,21) and (38,19))
    leave no loss-free arithmetic rendering — every Spark op adds a
    carry digit and the adjustment would silently round past scale 6 —
    so the digits are assembled textually (sign + integer part + '.' +
    s fraction digits) and cast, which parses exactly.  All of it stays
    inside whole-stage codegen either way."""
    if s == 0:
        return q.cast(_dt(p, s))
    if p + s <= 36:
        k = 36 - s
        return (q.cast(_dt(k, 0))
                * F.lit(Decimal("0." + "0" * (s - 1) + "1"))).cast(_dt(p, s))
    raw = F.abs(q).cast("string")
    # lpad truncates strings longer than its target — pad conditionally.
    digits = F.when(F.length(raw) <= s, F.lpad(raw, s + 1, "0")).otherwise(raw)
    n = F.length(digits)
    text = F.concat(
        F.when(q < 0, F.lit("-")).otherwise(F.lit("")),
        F.substring(digits, F.lit(1), n - F.lit(s)),
        F.lit("."),
        F.substring(digits, n - F.lit(s) + F.lit(1), F.lit(s)),
    )
    return text.cast(_dt(p, s))


def dec_mul(a: Column, pa: int, sa: int, b: Column, pb: int, sb: int) -> Column:
    """a * b at the reference mul type.  Spark's native product carries the
    full (sa+sb) scale (exact); the cast to the adapted type rounds only
    when adapt() reduced the scale — same as the reference's rescale."""
    p, s = mul_type(pa, sa, pb, sb)
    return (a * b).cast(_dt(p, s))


def dec_div(a: Column, pa: int, sa: int, b: Column, pb: int, sb: int) -> Column:
    """a / b at the reference div type with reference TRUNCATION semantics
    (LowerToStd.cpp:1602).  NULL on division by zero (Spark non-ANSI),
    where the reference traps."""
    p, s = div_type(pa, sa, pb, sb)
    shift = s - sa + sb
    num = _unscaled(a, sa)
    den = _unscaled(b, sb)
    if shift > 0:
        num = (num * _pow10(shift)).cast(_D38)
    elif shift < 0:
        den = (den * _pow10(-shift)).cast(_D38)
    q = ((num - num % den) / den).cast(_D38)
    return _rescale(q, p, s)


def dec_mod(a: Column, pa: int, sa: int, b: Column, pb: int, sb: int) -> Column:
    """a % b at the reference mod type (RemSI: result sign = dividend's,
    matching Spark's decimal %)."""
    p, s = mod_type(pa, sa, pb, sb)
    sm = max(sa, sb)
    am = a if sa == sm else a.cast(_dt(min(pa + (sm - sa), 38), sm))
    bm = b if sb == sm else b.cast(_dt(min(pb + (sm - sb), 38), sm))
    return (am % bm).cast(_dt(p, s))


def dec_div_unscaled(a: Column, pa: int, sa: int,
                     b: Column, pb: int, sb: int) -> Column:
    """Version-proof rendering of `dec_div`: the reference-typed quotient's
    unscaled integer (value x 10^s at the div_type scale) as BIGINT.
    Callers must guarantee the unscaled magnitude fits int64 — true for
    every driver-gate use here ((17,6) over money: <= ~1e11).  Emitting the
    integer sidesteps every decimal parse/render/transport layer at the
    cross-engine compare."""
    p, s = div_type(pa, sa, pb, sb)
    shift = s - sa + sb
    num = _unscaled(a, sa)
    den = _unscaled(b, sb)
    if shift > 0:
        num = (num * _pow10(shift)).cast(_D38)
    elif shift < 0:
        den = (den * _pow10(-shift)).cast(_D38)
    return ((num - num % den) / den).cast(_D38).cast("long")


def dec_mod_unscaled(a: Column, pa: int, sa: int,
                     b: Column, pb: int, sb: int) -> Column:
    """Unscaled-integer rendering of `dec_mod` (mod_type scale) as BIGINT."""
    _, s = mod_type(pa, sa, pb, sb)
    sm = max(sa, sb)
    am = a if sa == sm else a.cast(_dt(min(pa + (sm - sa), 38), sm))
    bm = b if sb == sm else b.cast(_dt(min(pb + (sm - sb), 38), sm))
    return _unscaled(am % bm, s).cast("long")


def dec_sum(c: Column, s: int) -> Column:
    """SUM with overflow widening: DECIMAL(38,s) accumulator — the Spark
    rendering of the reference's __int128 runtime sum (DecimalRuntime.h:6).
    Spark's map-side partial aggregation applies; the accumulator is exact
    integer arithmetic, so the result is order-insensitive."""
    return F.sum(c.cast(_dt(38, s))).cast(_dt(38, s))


def dec_avg_unscaled(c: Column, p: int, s: int) -> Column:
    """Version-proof rendering of `dec_avg`: the promoted-type average's
    unscaled integer as a plain digit STRING (the (31,21)/(38,19)
    promotion scales overflow int64, so the digits travel as VARCHAR —
    Spark's DECIMAL(38,0)->string and DuckDB's HUGEINT->VARCHAR both emit
    sign + digits with no decimal point or exponent on every version)."""
    pr, sr = avg_type(p, s)
    total = F.sum(c.cast(_dt(38, s)))
    cnt = F.count(c)
    num = _unscaled(total, s)
    shift = sr - s
    if shift > 0:
        num = (num * _pow10(shift)).cast(_D38)
    den = cnt.cast(_D38)
    return ((num - num % den) / den).cast(_D38).cast("string")


def dec_avg(c: Column, p: int, s: int) -> Column:
    """AVG at the reference promotion type (sql_analyzer.cpp:2636-2642),
    computed exactly: decomposed into an exact DECIMAL(38,s) sum and a
    count (the reference's own SimplifyAggregations decomposition), then
    trunc-divided at the promoted scale in unscaled-integer space.
    Everything is a JVM aggregate + per-group scalar ops — fully
    map-side-combinable, no single-partition stage."""
    pr, sr = avg_type(p, s)
    total = F.sum(c.cast(_dt(38, s)))
    cnt = F.count(c)
    num = _unscaled(total, s)
    shift = sr - s
    if shift > 0:
        num = (num * _pow10(shift)).cast(_D38)
    den = cnt.cast(_D38)
    q = ((num - num % den) / den).cast(_D38)
    return _rescale(q, pr, sr)


# ---------------------------------------------------------------------------
# DuckDB oracle renderers — VERSION-ROBUST by construction.
#
# The round-3 driver gate hash-mismatched every query whose oracle used the
# old `_sql_rescale` (a CAST(q AS DECIMAL(38,0)) * DECIMAL(s+1,s) multiply
# whose raw precision exceeds DuckDB's 38-digit cap — exactly the corner
# whose overflow handling changed across DuckDB releases) while the plain-
# CAST queries passed.  These renderers therefore avoid every construct
# whose semantics ever varied between DuckDB versions:
#   * no decimal arithmetic that exceeds 38 raw digits (digits are
#     assembled TEXTUALLY, mirroring the Spark-side `_rescale`);
#   * `//` and `%` only on NON-NEGATIVE hugeints (trunc == floor there,
#     so either division convention gives the same answer); signs are
#     applied explicitly via CASE;
#   * power-of-ten factors above 10^18 are string-cast to HUGEINT (a bare
#     literal above int64 risks a double parse);
#   * no bare double->decimal casts (see SQL_CAST_DEC below).
# ---------------------------------------------------------------------------

def _sql_pow10(k: int) -> str:
    """10^k as a HUGEINT-safe SQL factor."""
    if k <= 18:
        return str(10 ** k)
    return f"CAST('{10 ** k}' AS HUGEINT)"


def _sql_unscaled(expr: str, s: int) -> str:
    """Exact unscaled HUGEINT of a decimal(_,s) expression.  The interior
    multiply is decimal x small-int (raw precision p+s+1 <= 38 for every
    source scale used here); its value is integer-exact, so the HUGEINT
    cast has nothing to round."""
    if s == 0:
        return f"CAST({expr} AS HUGEINT)"
    return f"CAST(({expr}) * {_sql_pow10(s)} AS HUGEINT)"


def _sql_rescale(q: str, p: int, s: int) -> str:
    """decimal(p,s) from an unscaled HUGEINT — textual assembly (sign +
    integer digits + '.' + s fraction digits), the same rendering the
    Spark side uses in `_rescale`.  String->decimal of an exact-scale
    literal parses exactly on every DuckDB version."""
    if s == 0:
        return f"CAST({q} AS DECIMAL({p},{s}))"
    m = _sql_pow10(s)
    aq = f"abs(CAST({q} AS HUGEINT))"
    return ("CAST(concat("
            f"CASE WHEN ({q}) < 0 THEN '-' ELSE '' END, "
            f"CAST({aq} // {m} AS VARCHAR), '.', "
            f"lpad(CAST({aq} % {m} AS VARCHAR), {s}, '0')"
            f") AS DECIMAL({p},{s}))")


def _sql_truncdiv(num: str, den: str) -> str:
    """Truncation-toward-zero division on HUGEINT expressions, independent
    of the engine's `//` sign convention: divide magnitudes (where trunc
    and floor agree) and apply the sign explicitly."""
    return (f"(CASE WHEN (({num}) < 0) <> (({den}) < 0) "
            f"THEN -1 ELSE 1 END) * (abs({num}) // abs({den}))")


def SQL_CAST_DEC(expr: str, p: int, s: int) -> str:
    """double -> decimal(p,s) with Spark's semantics (shortest-repr string,
    then HALF_UP): route through VARCHAR.  DuckDB's double->VARCHAR is the
    shortest round-trip repr (stable across versions) and string->decimal
    rounds half-away-from-zero — bit-identical to Spark's
    Decimal(Double.toString(x)) + HALF_UP, even for dirty doubles whose
    direct binary scaling would round the other way (0.145 -> 0.15 here,
    0.14 under binary scaling)."""
    return f"CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL({p},{s}))"


def SQL_DEC_DIV(a: str, pa: int, sa: int, b: str, pb: int, sb: int) -> str:
    p, s = div_type(pa, sa, pb, sb)
    shift = s - sa + sb
    num = _sql_unscaled(a, sa)
    den = _sql_unscaled(b, sb)
    if shift > 0:
        num = f"({num} * {_sql_pow10(shift)})"
    elif shift < 0:
        den = f"({den} * {_sql_pow10(-shift)})"
    return _sql_rescale(f"({_sql_truncdiv(num, den)})", p, s)


def SQL_DEC_MOD(a: str, pa: int, sa: int, b: str, pb: int, sb: int) -> str:
    """a % b at the reference mod type with C sign semantics (result takes
    the dividend's sign — arith::RemSIOp), rendered sign-explicitly so the
    engine's integer-% convention can't leak in."""
    p, s = mod_type(pa, sa, pb, sb)
    ua = _sql_unscaled(a, sa)
    ub = _sql_unscaled(b, sb)
    if sa < s:
        ua = f"({ua} * {_sql_pow10(s - sa)})"
    if sb < s:
        ub = f"({ub} * {_sql_pow10(s - sb)})"
    r = (f"(CASE WHEN ({ua}) < 0 THEN -1 ELSE 1 END)"
         f" * (abs({ua}) % abs({ub}))")
    return _sql_rescale(f"({r})", p, s)


def SQL_DEC_DIV_U(a: str, pa: int, sa: int, b: str, pb: int, sb: int) -> str:
    """`SQL_DEC_DIV` rendered as the unscaled BIGINT (skips `_sql_rescale`
    entirely — no string assembly, no decimal parse at compare time)."""
    p, s = div_type(pa, sa, pb, sb)
    shift = s - sa + sb
    num = _sql_unscaled(a, sa)
    den = _sql_unscaled(b, sb)
    if shift > 0:
        num = f"({num} * {_sql_pow10(shift)})"
    elif shift < 0:
        den = f"({den} * {_sql_pow10(-shift)})"
    return f"CAST({_sql_truncdiv(num, den)} AS BIGINT)"


def SQL_DEC_MOD_U(a: str, pa: int, sa: int, b: str, pb: int, sb: int) -> str:
    """`SQL_DEC_MOD` rendered as the unscaled BIGINT."""
    p, s = mod_type(pa, sa, pb, sb)
    ua = _sql_unscaled(a, sa)
    ub = _sql_unscaled(b, sb)
    if sa < s:
        ua = f"({ua} * {_sql_pow10(s - sa)})"
    if sb < s:
        ub = f"({ub} * {_sql_pow10(s - sb)})"
    return (f"CAST((CASE WHEN ({ua}) < 0 THEN -1 ELSE 1 END)"
            f" * (abs({ua}) % abs({ub})) AS BIGINT)")


def SQL_DEC_AVG_U(expr: str, p: int, s: int) -> str:
    """`SQL_DEC_AVG` rendered as the unscaled digit STRING (promotion
    scales overflow int64; HUGEINT->VARCHAR is sign+digits everywhere)."""
    pr, sr = avg_type(p, s)
    num = f"SUM({_sql_unscaled(expr, s)})"
    shift = sr - s
    if shift > 0:
        num = f"({num} * {_sql_pow10(shift)})"
    den = f"CAST(COUNT({expr}) AS HUGEINT)"
    return f"CAST({_sql_truncdiv(num, den)} AS VARCHAR)"


def SQL_DEC_AVG(expr: str, p: int, s: int) -> str:
    """AVG at the reference promotion type: sum the per-row unscaled
    HUGEINTs directly (no DECIMAL(38,s) intermediate whose re-unscaling
    would exceed 38 digits), shift, trunc-divide by the count."""
    pr, sr = avg_type(p, s)
    num = f"SUM({_sql_unscaled(expr, s)})"
    shift = sr - s
    if shift > 0:
        num = f"({num} * {_sql_pow10(shift)})"
    den = f"CAST(COUNT({expr}) AS HUGEINT)"
    return _sql_rescale(f"({_sql_truncdiv(num, den)})", pr, sr)
