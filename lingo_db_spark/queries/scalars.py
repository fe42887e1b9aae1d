"""Scalar-function correctness queries — pins the semantics of the engine's
function library (lingo_db_spark.functions) against the DuckDB oracle, the
analogue of the reference's per-kernel lit tests in test/lit/DB/
(boolops.mlir, casts.mlir, compare.mlir, dates.mlir, decimalops.mlir,
nulls.mlir, stringops.mlir) over the runtime registry
(reference src/compiler/Dialect/DB/RuntimeFunctions/RuntimeFunctions.cpp).

Cross-engine hazards handled here:
- round() at a .5 boundary of 2-decimal doubles can differ between engines
  (binary representation): oracle queries round at scale 3 (no boundary);
  the half-away-from-zero rule itself is pinned on literals in
  tests/test_scalars.py.
- transcendentals (sqrt/log/exp) may differ by 1 ulp between libms: results
  rounded to 6 decimals.
- EXTRACT returns int32 in Spark, int64 in DuckDB: cast to BIGINT on the
  Spark side.
- xxhash64 and DuckDB's hash are different functions: hashes are compared
  via distinct-count preservation, not value equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lingo_db_spark import functions as lf
from lingo_db_spark.catalog import load_table
from lingo_db_spark.queries import register


@register("scalars_string", """
SELECT c_custkey,
       substr(c_name, 1, 8) AS name8,
       substr(c_name, 10) AS name_tail,
       upper(c_mktsegment) AS seg_up,
       lower(c_name) AS name_lo,
       length(c_name) AS name_len,
       strpos(c_name, '1') - 1 AS find_one,
       c_name || ':' || c_mktsegment AS joined,
       replace(c_name, 'Customer', 'Cust') AS name_repl,
       regexp_replace(c_name, '[0-9]+', '#') AS name_nodigit,
       (c_name LIKE 'Customer%1') AS like_flag,
       starts_with(c_name, 'Customer') AS sw,
       ends_with(c_name, '7') AS ew,
       string_split(c_name, '#')[1] AS first_tok,
       CAST(ascii(c_mktsegment) AS BIGINT) AS seg_ord
FROM customer
WHERE c_custkey < 200
ORDER BY c_custkey
""")
def scalars_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String kernel batch — reference StringRuntime registry rows
    (RuntimeFunctions.cpp:276-292): Substring (1-based, open-ended form),
    StringFind (0-based, -1 absent), ToUpper/ToLower, StringLength,
    Concatenate, Replace, RegexpReplace, Like, startsWith/endsWith,
    StringSplit, Ord."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    name = F.col("c_name")
    return (cust.select(
        "c_custkey",
        lf.substring(name, 1, 8).alias("name8"),
        lf.substring(name, 10).alias("name_tail"),
        lf.to_upper("c_mktsegment").alias("seg_up"),
        lf.to_lower(name).alias("name_lo"),
        lf.string_length(name).cast("long").alias("name_len"),
        lf.string_find(name, "1").cast("long").alias("find_one"),
        lf.concatenate(name, F.lit(":"), F.col("c_mktsegment")).alias("joined"),
        lf.replace(name, "Customer", "Cust").alias("name_repl"),
        lf.regexp_replace(name, "[0-9]+", "#").alias("name_nodigit"),
        lf.like(name, "Customer%1").alias("like_flag"),
        lf.starts_with(name, "Customer").alias("sw"),
        lf.ends_with(name, "7").alias("ew"),
        lf.string_split(name, "#").getItem(0).alias("first_tok"),
        lf.ord_("c_mktsegment").cast("long").alias("seg_ord"),
    ).orderBy("c_custkey"))


@register("scalars_math", """
SELECT c_custkey,
       abs(c_acctbal) AS abs_bal,
       round(c_acctbal, 3) AS bal_r3,
       round(sqrt(abs(c_acctbal)), 6) AS bal_sqrt,
       round(ln(abs(c_acctbal) + 1.0), 6) AS bal_ln,
       round(exp(c_acctbal / 10000.0), 6) AS bal_exp,
       round(sin(c_acctbal), 6) AS bal_sin,
       round(cos(c_acctbal), 6) AS bal_cos,
       CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
       CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
       c_custkey % 7 AS key_mod
FROM customer
WHERE c_custkey < 200
ORDER BY c_custkey
""")
def scalars_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math kernel batch — reference AbsInt/AbsDecimal, RoundDecimal,
    Sqrt/Log/Exp/Sin/Cos (RuntimeFunctions.cpp:293-340) plus floor/ceil/mod
    from the db-dialect arithmetic ops (DBOps.td:397-440)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    bal = F.col("c_acctbal")
    return (cust.select(
        "c_custkey",
        lf.abs_(bal).alias("abs_bal"),
        lf.round_half_up(bal, 3).alias("bal_r3"),
        F.round(lf.sqrt(lf.abs_(bal)), 6).alias("bal_sqrt"),
        F.round(lf.log(lf.abs_(bal) + 1.0), 6).alias("bal_ln"),
        F.round(lf.exp(bal / 10000.0), 6).alias("bal_exp"),
        F.round(lf.sin(bal), 6).alias("bal_sin"),
        F.round(lf.cos(bal), 6).alias("bal_cos"),
        F.floor(bal).cast("long").alias("bal_floor"),
        F.ceil(bal).cast("long").alias("bal_ceil"),
        (F.col("c_custkey") % 7).alias("key_mod"),
    ).orderBy("c_custkey"))


@register("scalars_datetime", """
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
       CAST(extract(month FROM o_orderdate) AS BIGINT) AS mo,
       CAST(extract(day FROM o_orderdate) AS BIGINT) AS dom,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
            AS INTEGER) AS days_since,
       CAST(o_orderdate AS DATE) + 30 AS due_date
FROM orders
WHERE o_orderkey < 500
ORDER BY o_orderkey
""")
def scalars_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time kernel batch — reference DateTrunc, ExtractFromDate
    family, DateDiffDay, DateAdd (RuntimeFunctions.cpp:316-330,
    DateRuntime.h:6-18)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    od = F.col("o_orderdate")
    return (orders.select(
        "o_orderkey",
        lf.date_trunc("month", od).alias("month_start"),
        lf.extract("year", od).cast("long").alias("yr"),
        lf.extract("month", od).cast("long").alias("mo"),
        lf.extract("day", od).cast("long").alias("dom"),
        lf.date_diff_days(od, F.lit("1995-01-01").cast("timestamp_ntz"))
          .alias("days_since"),
        lf.date_add_days(od, 30).alias("due_date"),
    ).orderBy("o_orderkey"))


@register("scalars_condexpr", """
SELECT o_orderkey,
       CASE WHEN o_orderpriority = '1-URGENT' THEN 'hot'
            WHEN o_orderpriority IN ('2-HIGH', '3-MEDIUM') THEN 'warm'
            ELSE 'cold' END AS heat,
       coalesce(NULLIF(o_orderstatus, 'O'), 'open') AS status_label,
       (o_totalprice BETWEEN 100000.0 AND 200000.0) AS mid_range,
       (o_orderstatus = 'F' AND o_totalprice > 150000.0)
         OR o_orderpriority = '1-URGENT' AS flagged,
       NOT (o_orderstatus = 'O') AS closed,
       (NULLIF(o_orderstatus, 'O') IS NULL) AS was_open
FROM orders
WHERE o_orderkey < 500
ORDER BY o_orderkey
""")
def scalars_condexpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / boolean / null-handling batch — searched CASE
    (sql_mlir_translator.cpp:975-1110), db.between (DBOps.td:501-509),
    db.oneof IN-list (:511-520), three-valued and/or/not (:522-545),
    db.null/isnull + coalesce (:293-361)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    prio, status, price = (F.col("o_orderpriority"), F.col("o_orderstatus"),
                           F.col("o_totalprice"))
    return (orders.select(
        "o_orderkey",
        F.when(prio == "1-URGENT", "hot")
         .when(prio.isin("2-HIGH", "3-MEDIUM"), "warm")
         .otherwise("cold").alias("heat"),
        F.coalesce(F.nullif(status, F.lit("O")), F.lit("open"))
         .alias("status_label"),
        price.between(100000.0, 200000.0).alias("mid_range"),
        (((status == "F") & (price > 150000.0)) | (prio == "1-URGENT"))
         .alias("flagged"),
        (~(status == "O")).alias("closed"),
        F.isnull(F.nullif(status, F.lit("O"))).alias("was_open"),
    ).orderBy("o_orderkey"))


@register("scalars_cast", """
SELECT o_orderkey,
       CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
       CAST(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(18,2)) * 100
            AS BIGINT) AS price_cents,
       CAST(o_orderkey AS DOUBLE) AS key_dbl,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST('42' AS BIGINT) + o_orderkey AS from_str,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
FROM orders
WHERE o_orderkey < 500
ORDER BY o_orderkey
""")
def scalars_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast lattice batch — db.cast (DBOps.td:547-554) and the
    string<->number/date cast kernels (StringRuntime.h:17-33).
    double->int follows the engine's C-style truncation (DuckDB's
    bare CAST rounds instead, so the oracle spells trunc() explicitly).
    double->decimal routes through VARCHAR in the oracle: Spark casts via
    the double's shortest string repr + HALF_UP, which a direct DuckDB
    CAST only matches on some versions/values (see SQL_CAST_DEC).

    Driver-gate encoding is VERSION-PROOF (r3/r4 red row): the
    double->decimal(18,2) result travels as integer cents BIGINT, so no
    decimal type crosses the compare.  Decimal-typed twin:
    `scalars_cast_typed` (local gate)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return (orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast("long").alias("price_int"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("decimal(38,0)").cast("long").alias("price_cents"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        (F.lit("42").cast("long") + F.col("o_orderkey")).alias("from_str"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
    ).orderBy("o_orderkey"))


@register("scalars_cast_typed", """
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(18,2)) AS price_dec
FROM orders
WHERE o_orderkey < 500
ORDER BY o_orderkey
""", driver_attestable=False)
def scalars_cast_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal-typed twin of `scalars_cast`'s double->DECIMAL(18,2)
    column, kept for the local oracle gate (DuckDB 1.0.0)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return (orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price_dec"),
    ).orderBy("o_orderkey"))


@register("scalars_hash_distinct", """
SELECT COUNT(DISTINCT hash(c_name)) AS n_hashes,
       COUNT(DISTINCT c_name) AS n_names
FROM customer
""")
def scalars_hash_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash kernel — reference Hash/CombineHashes
    (RuntimeFunctions.cpp:341-344).  xxhash64 and DuckDB's hash are
    different algorithms, so the check is distinct-count preservation
    (collision-free on this cardinality), not value equality."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.agg(
        F.countDistinct(lf.hash64("c_name")).alias("n_hashes"),
        F.countDistinct("c_name").alias("n_names"))


def _erf_values_oracle() -> str:
    """VALUES-pinned erf oracle: DuckDB has no erf(), so the oracle is a
    literal table of the exact expected doubles.  Sound because the
    input grid is DERIVED FROM THE KEY, not from data values:
    x = (c_custkey - 100) / 100.0 is the same IEEE computation on both
    sides, and the pinned literal is repr(math.erf(x)) — the very
    kernel the Spark pandas UDF applies (functions.erf) — so equality
    is exact, not approximate.  Literals carry an e0 suffix so DuckDB
    types them DOUBLE (a bare decimal literal would become
    DECIMAL(18,16) and round-trip differently in the last ulp)."""
    import math
    vals = []
    for k in range(0, 200):
        r = repr(math.erf((k - 100) / 100.0))
        assert "e" not in r and "E" not in r, r
        vals.append(f"({k}, {r}e0)")
    return ("SELECT c.c_custkey, v.erf_x FROM customer c JOIN (VALUES "
            + ", ".join(vals)
            + ") AS v(k, erf_x) ON c.c_custkey = v.k ORDER BY c_custkey")


@register("scalars_erf", _erf_values_oracle())
def scalars_erf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gauss error function — reference FloatRuntime::erf
    (RuntimeFunctions.cpp:339), the one registry function with no Spark
    builtin: vectorized (Arrow-batched) pandas UDF, never row-at-a-time.
    The input is the deterministic key-derived grid
    (c_custkey - 100) / 100.0 ∈ (-1, 1) so the DuckDB oracle can be a
    VALUES table of exact expected outputs (see _erf_values_oracle);
    exact kernel values are additionally pinned in
    tests/test_scalars.py."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return (cust.select(
        "c_custkey",
        lf.erf((F.col("c_custkey") - 100) / F.lit(100.0)).alias("erf_x"),
    ).orderBy("c_custkey"))


@register("scalars_char_semantics", """
SELECT c_custkey,
       ascii(substr(c_mktsegment, 1, 1)) AS seg_c1_code,
       substr(c_mktsegment, 1, 4) AS seg_c4,
       (ascii(substr(c_mktsegment, 1, 1)) = ascii(substr(c_name, 1, 1)))
         AS eq_char1,
       (substr(c_mktsegment, 1, 4) = substr(c_name, 1, 4)) AS eq_char4,
       (substr(c_mktsegment, 1, 2) =
        rpad(substr(c_mktsegment, 1, 2), 4, ' ')) AS eq_unequal_len
FROM customer
WHERE c_custkey < 300
ORDER BY c_custkey
""")
def scalars_char_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """char(n) semantics (functions/chartype.py) — the reference's
    fixed-char model: char(1) stored/compared as i32 codepoint
    (LowerToStd.cpp:164-166, 384-388), char(n>1) stored as the raw
    string, and UNEQUAL-length comparison promoting both sides to plain
    string (sql_analyzer.cpp:2985-2992) — so char(2) 'BU' = char(4)
    'BU  ' is FALSE (trailing spaces significant), where ANSI padded
    CHAR comparison would say TRUE.  The oracle spells the same
    unpadded-compare semantics explicitly."""
    from lingo_db_spark.functions import chartype as ct
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    seg, name = F.col("c_mktsegment"), F.col("c_name")
    seg_c2 = ct.char_value(seg, 2)
    seg_c2_padded4 = F.rpad(ct.char_value(seg, 2), 4, " ")
    return (cust.select(
        "c_custkey",
        ct.char1_code(seg).alias("seg_c1_code"),
        ct.char_value(seg, 4).alias("seg_c4"),
        ct.char_eq(seg, 1, name, 1).alias("eq_char1"),
        ct.char_eq(ct.char_value(seg, 4), 4, ct.char_value(name, 4), 4)
          .alias("eq_char4"),
        ct.char_eq(seg_c2, 2, seg_c2_padded4, 4).alias("eq_unequal_len"),
    ).orderBy("c_custkey"))


@register("scalars_interval_arith", """
SELECT o_orderkey,
       o_orderdate,
       o_orderdate + INTERVAL 3 MONTH  AS plus_3mo,
       o_orderdate + INTERVAL 2 YEAR   AS plus_2yr,
       o_orderdate - INTERVAL 14 MONTH AS minus_14mo,
       o_orderdate + INTERVAL 100 DAY  AS plus_100d,
       o_orderdate + INTERVAL 100 DAY + INTERVAL 36 HOUR AS plus_100d_36h,
       CAST(year(o_orderdate + INTERVAL 3 MONTH) AS BIGINT) AS yr_rolled
FROM orders
WHERE o_orderkey < 400
ORDER BY o_orderkey
""")
def scalars_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-typed arithmetic — the reference's two-part interval
    model (DBOps.td:95-105): year-month intervals via calendar month
    arithmetic (DateRuntime.cpp:35-40, years normalized to months at
    bind time, sql_analyzer.cpp:2560-2565) and day-time intervals as a
    plain duration add (dateAddImpl, RuntimeFunctions.cpp:15-22).
    Month-end days clamp identically in Spark and DuckDB.  The day
    offset is 100 (not 90) because DuckDB's subexpression elimination
    considers INTERVAL 3 MONTH == INTERVAL 90 DAY (month~30d interval
    equality) and would fold the two additions into one."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    d = F.col("o_orderdate")
    return (orders.select(
        "o_orderkey",
        "o_orderdate",
        lf.date_add_interval(d, lf.interval_months(3)).alias("plus_3mo"),
        lf.date_add_interval(d, lf.interval_years(2)).alias("plus_2yr"),
        lf.date_subtract_interval(d, lf.interval_months(14)).alias("minus_14mo"),
        lf.date_add_interval(d, lf.interval_daytime(days=100)).alias("plus_100d"),
        lf.date_add_interval(
            lf.date_add_interval(d, lf.interval_daytime(days=100)),
            lf.interval_daytime(hours=36)).alias("plus_100d_36h"),
        F.year(lf.date_add_interval(d, lf.interval_months(3)))
         .cast("long").alias("yr_rolled"),
    ).orderBy("o_orderkey"))


@register("scalars_datetime_units", """
SELECT user_id,
       CAST((epoch_us(hi) - epoch_us(lo)) // 3600000000 AS BIGINT) AS span_h,
       CAST((epoch_us(hi) - epoch_us(lo)) // 60000000 AS BIGINT) AS span_min,
       CAST((epoch_us(hi) - epoch_us(lo)) // 1000000 AS BIGINT) AS span_s,
       CAST(CASE WHEN strpos(reverse(ename), '1') = 0 THEN -1
                 ELSE length(ename) - strpos(reverse(ename), '1') END
            AS BIGINT) AS rfind_1
FROM (
  SELECT user_id, MIN(ts) AS lo, MAX(ts) AS hi,
         MAX(event_type) AS ename
  FROM events GROUP BY user_id)
ORDER BY user_id
""")
def scalars_datetime_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DateDiffHour/Minute/Second (RuntimeFunctions.cpp:317-321 — whole
    elapsed units from the raw epoch difference, not calendar boundary
    crossings, which is what DuckDB's date_diff would count) and
    PyStringRFind (:287, last 0-based index, -1 absent) over per-user
    event spans.  The oracle spells the identical integer arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    g = (ev.groupBy("user_id")
         .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"),
              F.max("event_type").alias("ename")))
    return (g.select(
        "user_id",
        lf.date_diff_hours("hi", "lo").alias("span_h"),
        lf.date_diff_minutes("hi", "lo").alias("span_min"),
        lf.date_diff_seconds("hi", "lo").alias("span_s"),
        lf.string_rfind("ename", "1").alias("rfind_1"),
    ).orderBy("user_id"))


@register("scalars_fuzzy_match", """
SELECT c_custkey,
       CAST(levenshtein(c_name, 'Customer#000000001') AS BIGINT) AS edit_dist,
       (levenshtein(c_name, 'Customer#000000001') <= 2) AS is_near
FROM customer
WHERE c_custkey < 300
ORDER BY c_custkey
""")
def scalars_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching — Levenshtein edit distance (the entity-
    resolution scalar; identical DP definition in both engines), with a
    near-match predicate at distance <= 2.  A full fuzzy self-join would
    compose this with the n-gram bucket candidates from the dedup
    family (never all-pairs)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    d = F.levenshtein(F.col("c_name"), F.lit("Customer#000000001"))
    return (cust.select("c_custkey",
                        d.cast("long").alias("edit_dist"),
                        (d <= 2).alias("is_near"))
            .orderBy("c_custkey"))
