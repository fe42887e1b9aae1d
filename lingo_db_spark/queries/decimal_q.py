"""Decimal(p,s) end-to-end parity queries — decimal-typed columns flowing
through ×, ÷, %, AVG promotion, and SUM overflow widening, typed by the
reference's inference rules (reference src/compiler/Dialect/DB/
DBOps.cpp:98-273, src/compiler/frontend/sql_analyzer.cpp:2636-2642) and
valued by the reference's truncating scaled-integer division
(src/compiler/Conversion/DBToStd/LowerToStd.cpp:1599-1603).

The driver tables store money as DOUBLE, so each query materializes
decimal-typed columns with an explicit CAST applied identically on both
engines (the same IEEE double rounds to the same decimal).  Every output
column is CAST to the reference-inferred (p,s) on BOTH sides — the gate
compares schemas and repr()-hashes, and Decimal repr carries scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lingo_db_spark.catalog import load_table
from lingo_db_spark.functions import decimal as dec
from lingo_db_spark.queries import register, sorted_result

# Decimal views of the driver's double columns, shared by every query here.
# Routed through SQL_CAST_DEC (via-VARCHAR) so the oracle's double->decimal
# rounding matches Spark's shortest-repr + HALF_UP semantics on every DuckDB
# version and every data drop — a direct CAST(double AS DECIMAL) rounds
# differently on dirty doubles under newer DuckDB releases.
_PRICE = dec.SQL_CAST_DEC("l_extendedprice", 12, 2)        # (12,2)
_QTY1 = dec.SQL_CAST_DEC("l_quantity", 4, 1)               # (4,1)
_QTY0 = dec.SQL_CAST_DEC("l_quantity", 19, 0)              # (19,0) int-like
_DISC = dec.SQL_CAST_DEC("1.0 - l_discount", 4, 2)         # (4,2)


def _lineitem_dec(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
        F.col("l_quantity").cast("decimal(4,1)").alias("qty1"),
        F.col("l_quantity").cast("decimal(19,0)").alias("qty0"),
        (F.lit(1.0) - F.col("l_discount")).cast("decimal(4,2)").alias("disc"),
    )


@register("decimal_mul_sum", f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(CAST({_PRICE} * {_DISC} AS DECIMAL(16,4))
                AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS sum_disc_price,
       CAST(SUM(CAST({_PRICE} AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS sum_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""")
def decimal_mul_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal × at the reference mul type — mul_type(12,2, 4,2) = (16,4),
    DBOps.cpp:237-250 — then SUM overflow widening to the DECIMAL(38,s)
    accumulator (the reference's __int128 runtime, DecimalRuntime.h:6).
    The product is exact at scale 4, so × and SUM are bit-exact
    cross-engine.  Plain hash-agg shape: map-side partial sums, one
    shuffle on the group keys."""
    li = _lineitem_dec(spark, sf_dir)
    return sorted_result(
        li.groupBy("l_returnflag", "l_linestatus").agg(
            dec.dec_sum(dec.dec_mul(F.col("price"), 12, 2,
                                    F.col("disc"), 4, 2), 4)
               .alias("sum_disc_price"),
            dec.dec_sum(F.col("price"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        ), "l_returnflag", "l_linestatus")


@register("decimal_div_mod", f"""
SELECT l_orderkey, l_linenumber,
       {dec.SQL_DEC_DIV_U(_PRICE, 12, 2, _QTY1, 4, 1)} AS unit_price_u,
       {dec.SQL_DEC_MOD_U(_PRICE, 12, 2, _QTY1, 4, 1)} AS price_mod_qty_u
FROM lineitem
WHERE l_orderkey < 400
ORDER BY l_orderkey, l_linenumber
""")
def decimal_div_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal ÷ and % at reference types — div_type(12,2, 4,1) = (17,6),
    mod_type(12,2, 4,1) = (5,2) — with the reference's TRUNCATING division
    (LowerToStd.cpp:1602, arith::DivSIOp on the scaled unscaled value),
    which Spark's HALF_UP `/` would get wrong by one ulp on half the rows.

    Driver-gate encoding is VERSION-PROOF (r3/r4 lesson): outputs are the
    quotient/remainder UNSCALED integers as BIGINT — no decimal
    parse/render/transport sits between the engines at compare time.  The
    decimal-typed form stays gated as `decimal_div_mod_typed` (local) and
    value-pinned in tests/test_decimal.py."""
    li = _lineitem_dec(spark, sf_dir).filter(F.col("l_orderkey") < 400)
    return (li.select(
        "l_orderkey", "l_linenumber",
        dec.dec_div_unscaled(F.col("price"), 12, 2, F.col("qty1"), 4, 1)
           .alias("unit_price_u"),
        dec.dec_mod_unscaled(F.col("price"), 12, 2, F.col("qty1"), 4, 1)
           .alias("price_mod_qty_u"),
    ).orderBy("l_orderkey", "l_linenumber"))


@register("decimal_div_mod_typed", f"""
SELECT l_orderkey, l_linenumber,
       {dec.SQL_DEC_DIV(_PRICE, 12, 2, _QTY1, 4, 1)} AS unit_price,
       {dec.SQL_DEC_MOD(_PRICE, 12, 2, _QTY1, 4, 1)} AS price_mod_qty
FROM lineitem
WHERE l_orderkey < 400
ORDER BY l_orderkey, l_linenumber
""", driver_attestable=False)
def decimal_div_mod_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal-typed twin of `decimal_div_mod` — DECIMAL(17,6)/(5,2)
    outputs end-to-end, kept for the local oracle gate where the DuckDB
    version is known (1.0.0)."""
    li = _lineitem_dec(spark, sf_dir).filter(F.col("l_orderkey") < 400)
    return (li.select(
        "l_orderkey", "l_linenumber",
        dec.dec_div(F.col("price"), 12, 2, F.col("qty1"), 4, 1)
           .alias("unit_price"),
        dec.dec_mod(F.col("price"), 12, 2, F.col("qty1"), 4, 1)
           .alias("price_mod_qty"),
    ).orderBy("l_orderkey", "l_linenumber"))


@register("decimal_avg_promote", f"""
SELECT l_returnflag,
       {dec.SQL_DEC_AVG_U(_PRICE, 12, 2)} AS avg_price_u,
       {dec.SQL_DEC_AVG_U(_QTY0, 19, 0)} AS avg_qty_u,
       CAST(SUM({dec._sql_unscaled(_PRICE, 2)}) AS BIGINT) AS sum_price_c,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""")
def decimal_avg_promote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVG decimal promotion (sql_analyzer.cpp:2636-2642):
    avg(decimal(12,2)) -> div-rule vs decimal(19,0) -> DECIMAL(31,21);
    avg(int-like decimal(19,0)) -> DECIMAL(38,19).  Computed exactly as
    sum/count trunc-divided in unscaled 128-bit space — no double detour,
    so all 21 fractional digits match the oracle bit-for-bit.

    Driver-gate encoding is VERSION-PROOF: the promoted averages travel as
    unscaled digit STRINGS (their magnitudes exceed int64), the sum as
    integer cents BIGINT.  Decimal-typed twin: `decimal_avg_promote_typed`."""
    li = _lineitem_dec(spark, sf_dir)
    return sorted_result(
        li.groupBy("l_returnflag").agg(
            dec.dec_avg_unscaled(F.col("price"), 12, 2).alias("avg_price_u"),
            dec.dec_avg_unscaled(F.col("qty0"), 19, 0).alias("avg_qty_u"),
            (dec.dec_sum(F.col("price"), 2) * 100).cast("decimal(38,0)")
                .cast("long").alias("sum_price_c"),
            F.count(F.lit(1)).alias("n"),
        ), "l_returnflag")


@register("decimal_avg_promote_typed", f"""
SELECT l_returnflag,
       {dec.SQL_DEC_AVG(_PRICE, 12, 2)} AS avg_price,
       {dec.SQL_DEC_AVG(_QTY0, 19, 0)} AS avg_qty,
       CAST(SUM(CAST({_PRICE} AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS sum_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""", driver_attestable=False)
def decimal_avg_promote_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal-typed twin of `decimal_avg_promote` — DECIMAL(31,21)/(38,19)
    outputs end-to-end, kept for the local oracle gate (DuckDB 1.0.0)."""
    li = _lineitem_dec(spark, sf_dir)
    return sorted_result(
        li.groupBy("l_returnflag").agg(
            dec.dec_avg(F.col("price"), 12, 2).alias("avg_price"),
            dec.dec_avg(F.col("qty0"), 19, 0).alias("avg_qty"),
            dec.dec_sum(F.col("price"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        ), "l_returnflag")


_VALUES_AB = """(VALUES (CAST(-7.00 AS DECIMAL(12,2)), CAST(3.00 AS DECIMAL(12,2))),
             (CAST(7.00 AS DECIMAL(12,2)), CAST(3.00 AS DECIMAL(12,2))),
             (CAST(-7.00 AS DECIMAL(12,2)), CAST(-3.00 AS DECIMAL(12,2))),
             (CAST(0.07 AS DECIMAL(12,2)), CAST(0.03 AS DECIMAL(12,2))),
             (CAST(100.00 AS DECIMAL(12,2)), CAST(7.00 AS DECIMAL(12,2)))
     ) t(a, b)"""


def _literal_ab(spark: SparkSession) -> DataFrame:
    from decimal import Decimal as D
    rows = [(D("-7.00"), D("3.00")), (D("7.00"), D("3.00")),
            (D("-7.00"), D("-3.00")), (D("0.07"), D("0.03")),
            (D("100.00"), D("7.00"))]
    return spark.createDataFrame(rows, "a decimal(12,2), b decimal(12,2)")


@register("decimal_literal_arith", f"""
SELECT CAST(a * 100 AS BIGINT) AS a_c,
       CAST(b * 100 AS BIGINT) AS b_c,
       {dec.SQL_DEC_DIV_U('a', 12, 2, 'b', 12, 2)} AS quot_u,
       {dec.SQL_DEC_MOD_U('a', 12, 2, 'b', 12, 2)} AS rem_u,
       CAST(CAST(a * b AS DECIMAL(24,4)) * 10000 AS BIGINT) AS prod_u
FROM {_VALUES_AB}
ORDER BY a, b
""")
def decimal_literal_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal decimal arithmetic pinning the sign corners of truncating
    division (reference arith::DivSIOp: -7/3 = -2, never -3) and the mul
    rule at (12,2)x(12,2) = raw (24,4).  Five rows, no table scan: the
    const_relation path (RelAlgOps.td const_relation).

    Driver-gate encoding is VERSION-PROOF: every column is the unscaled
    integer as BIGINT (a/b as cents, quot at scale 14, rem at scale 2,
    prod at scale 4) — no decimal type crosses the compare.  Decimal-typed
    twin: `decimal_literal_arith_typed`."""
    df = _literal_ab(spark)
    return (df.select(
        (F.col("a") * 100).cast("decimal(38,0)").cast("long").alias("a_c"),
        (F.col("b") * 100).cast("decimal(38,0)").cast("long").alias("b_c"),
        dec.dec_div_unscaled(F.col("a"), 12, 2, F.col("b"), 12, 2)
           .alias("quot_u"),
        dec.dec_mod_unscaled(F.col("a"), 12, 2, F.col("b"), 12, 2)
           .alias("rem_u"),
        (dec.dec_mul(F.col("a"), 12, 2, F.col("b"), 12, 2) * 10000)
            .cast("decimal(38,0)").cast("long").alias("prod_u"),
    ).orderBy("a_c", "b_c"))


@register("decimal_literal_arith_typed", f"""
SELECT a, b,
       {dec.SQL_DEC_DIV('a', 12, 2, 'b', 12, 2)} AS quot,
       {dec.SQL_DEC_MOD('a', 12, 2, 'b', 12, 2)} AS rem,
       CAST(a * b AS DECIMAL(24,4)) AS prod,
       CAST(a * b AS DECIMAL(38,4)) AS prod_wide
FROM {_VALUES_AB}
ORDER BY a, b
""", driver_attestable=False)
def decimal_literal_arith_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal-typed twin of `decimal_literal_arith` — DECIMAL(26,14)/
    (12,2)/(24,4)/(38,4) outputs end-to-end, local oracle gate only."""
    df = _literal_ab(spark)
    return (df.select(
        "a", "b",
        dec.dec_div(F.col("a"), 12, 2, F.col("b"), 12, 2).alias("quot"),
        dec.dec_mod(F.col("a"), 12, 2, F.col("b"), 12, 2).alias("rem"),
        dec.dec_mul(F.col("a"), 12, 2, F.col("b"), 12, 2).alias("prod"),
        (F.col("a") * F.col("b")).cast("decimal(38,4)").alias("prod_wide"),
    ).orderBy("a", "b"))
