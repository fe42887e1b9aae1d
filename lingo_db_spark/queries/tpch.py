"""TPC-H-flavored benchmark queries, adapted to the driver's synthetic
schema (TESTDATA.md — no partsupp, prices are doubles, dates are
timestamps).  These mirror the reference's primary benchmark suite
(reference resources/sql/tpch/*.sql, 22 queries; correctness gate
test/sqlite-datasets/tpchSf1.test) and exercise the RelAlg spine:
basetable, selection, map, aggregation, join (inner/outer/semi/anti),
topk, sort, exists/in subqueries (reference RelAlgOps.td:108-528).

Every aggregate over doubles goes through the exact-decimal helpers so
Spark's parallel summation hash-matches the single-threaded DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lingo_db_spark.catalog import load_table
from lingo_db_spark.functions import (
    DEC,
    SQL_DAVG,
    SQL_DSUM,
    davg,
    dsum,
)
from lingo_db_spark.queries import register


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {SQL_DSUM('l_quantity')} AS sum_qty,
       {SQL_DSUM('l_extendedprice')} AS sum_base_price,
       {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {SQL_DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {SQL_DAVG('l_quantity')} AS avg_qty,
       {SQL_DAVG('l_extendedprice')} AS avg_price,
       {SQL_DAVG('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("tpch_q1", _Q1_ORACLE)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: scan -> filter -> 8-way agg -> sort.
    Reference resources/sql/tpch/1.sql; relalg.aggregation
    (RelAlgOps.td:223-238).  Filter pushes to parquet; aggregation is
    partial->shuffle->final (map-side combine), the Spark analogue of the
    reference's 64-way thread-local pre-aggregation
    (PreAggregationHashtable.h:8-40)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # No pre-agg repartition: micro-unit sums are primitive long adds, so
    # the partial aggregate collapses 600k rows to 6 groups at scan speed
    # even on few splits — map-side combine + the 6-row final shuffle is
    # the optimal shape at every scale (measured: a forced spread costs
    # 2x here).
    flt = li.filter(F.col("l_shipdate") <= _ts("1998-09-02 00:00:00"))
    return (
        flt.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q3_ORACLE = f"""
SELECT l_orderkey,
       {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register("tpch_q3", _Q3_ORACLE)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: 3-way join -> agg -> top-10.
    Reference resources/sql/tpch/3.sql; relalg.topk (RelAlgOps.td:179-193)
    plans as TakeOrderedAndProject (no full sort).  customer scales with SF,
    so no forced broadcast hint — AQE's size-based choice broadcasts the
    filtered side only while it actually fits (a hard-coded hint would OOM
    at SF100)."""
    cutoff = _ts("1998-03-15 00:00:00")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT * FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("tpch_q4", _Q4_ORACLE)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order priority check: EXISTS correlated subquery, rewritten as a
    max-per-key pre-aggregation instead of a semijoin.
    Reference resources/sql/tpch/4.sql; relalg.exists + ImplicitToExplicit
    rewrite to semijoin (reference ImplicitToExplicitJoins.cpp).

    Why not join(..., 'left_semi'): Spark's left-semi hash join must BUILD
    on the right side — here the unbounded lineitem fact (a left-semi SHJ
    hashes all of lineitem; a planner broadcast of the pruned scan is the
    estimate-driven fact-broadcast hazard).  The correlated predicate is a
    monotone comparison, so EXISTS(l_shipdate > o_orderdate) is exactly
    max(l_shipdate) > o_orderdate: pre-aggregate lineitem per orderkey
    (map-side partial max, shuffle carries one row per key) and inner-join
    1:1 against the order window.  The window lower bound is pushed into
    the lineitem scan (orders in the window have o_orderdate >= lo, so a
    witness row must have l_shipdate > lo — no witness is lost).
    Measured at sf1: 2.9 s (semi) -> 0.83 s.  At 100 TB the shuffle
    carries distinct orderkeys instead of all lineitems."""
    lo = _ts("1996-07-01 00:00:00")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo)
        & (F.col("o_orderdate") < _ts("1996-10-01 00:00:00")))
    last_ship = (load_table(spark, sf_dir, "lineitem")
                 .filter(F.col("l_shipdate") > lo)
                 .groupBy("l_orderkey")
                 .agg(F.max("l_shipdate").alias("max_ship")))
    matched = orders.join(
        last_ship,
        (orders.o_orderkey == last_ship.l_orderkey)
        & (last_ship.max_ship > orders.o_orderdate),
    )
    return (matched.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


_Q5_ORACLE = f"""
SELECT n_name, {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC
"""


@register("tpch_q5", _Q5_ORACLE)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-way join with a same-nation constraint.
    Reference resources/sql/tpch/5.sql.  Join order: facts joined first on
    their shared keys.  Only region/nation (fixed-size dims) carry explicit
    broadcast hints; supplier/customer scale with SF, so their join strategy
    is left to AQE's size-based decision."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00")))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


_Q6_ORACLE = f"""
SELECT {SQL_DSUM('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("tpch_q6", _Q6_ORACLE)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting revenue change: pure scan+filter+scalar agg — the
    predicate-pushdown showcase (all four filters reach the parquet scan).
    Reference resources/sql/tpch/6.sql; relalg.selection + db.between
    (DBOps.td:501-509)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year, {SQL_DSUM('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                       AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("tpch_q7", _Q7_ORACLE)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping: self-joined dimension (nation x2) + disjunctive
    cross-nation predicate.  Reference resources/sql/tpch/7.sql.
    The two-nation membership filter is pushed into the n1/n2 dimension
    scans (shrinks both broadcasts and every downstream probe); only the
    cross-pair disjunction remains a residual filter after the joins."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(_ts("1996-01-01 00:00:00"),
                                    _ts("1997-12-31 00:00:00")))
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation_pair = ("NATION_1", "NATION_2")
    n1 = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*nation_pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*nation_pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q10_ORACLE = f"""
SELECT c_custkey, c_name,
       {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
       c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("tpch_q10", _Q10_ORACLE)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned item reporting: fact-fact join + dim joins + top-20.
    Reference resources/sql/tpch/10.sql."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00")))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    from lingo_db_spark.operators.groupby_reduce import grouped_by_key
    return (
        grouped_by_key(
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey),
            # ReduceGroupByKeys (reference Passes.cpp:37): c_custkey is the
            # customer pk, so name/acctbal/nation are re-attached via `any`
            # instead of widening the shuffle key.
            pk=["c_custkey"],
            dependents=["c_name", "c_acctbal", "n_name"],
            aggs={"revenue": dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")))})
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("tpch_q13", _Q13_ORACLE)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution: outer join + COUNT(col) null
    semantics (unmatched rows count 0) + re-aggregation.  Reference
    resources/sql/tpch/13.sql; the groupjoin candidate pattern
    (reference OptimizeImplementations.cpp:771-850) — expressed as
    join+agg, which Spark plans as one shuffle on c_custkey."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q14_ORACLE = f"""
SELECT CAST(100.0 AS DOUBLE) * {SQL_DSUM("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
       / {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


@register("tpch_q14", _Q14_ORACLE)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect: conditional aggregation (CASE inside SUM).
    Reference resources/sql/tpch/14.sql; db-dialect CASE -> F.when."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-10-01 00:00:00")))
    part = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg((F.lit(100.0) * dsum(promo) / dsum(disc)).alias("promo_revenue"))
    )


_Q18_ORACLE = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {SQL_DSUM('l_quantity')} AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(38,10))) > 300)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


@register("tpch_q18", _Q18_ORACLE)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customer: IN (grouped subquery with HAVING) -> semi
    join.  Reference resources/sql/tpch/18.sql; relalg.in
    (RelAlgOps.td:523-528).  The HAVING sum accumulates in dsum's exact
    int64 micro-units (r12 — see below) so the > 300 decision boundary
    can't flip with summation order.

    Single-pass form: because the outer query re-groups by o_orderkey
    (orders/customer are key-unique), the HAVING aggregate IS the output
    sum_qty — so lineitem is aggregated once, the >300 filter shrinks it
    to the rare qualifying orders, and only that tiny set joins
    orders/customer (the same re-aggregation elimination the reference's
    unnesting applies; at scale this replaces an orders><lineitem fact
    join with a probe of a few thousand rows).

    The aggregate is dsum's micro-unit long accumulation, not a
    DECIMAL(38,10) buffer (r12, from the sf1 audit: q18 was the spot
    outlier at 4.2 s — a 1.5M-group Decimal128 hash aggregate over the
    whole fact; q1's 4-group decimal pass hid the per-group cost).
    Exactness of the > 300 boundary is unchanged: l_quantity is
    integral by the TPC-H spec (dbgen: 1..50), so the micro-unit sum
    and the decimal sum are the same number, and dsum stays exact to
    2^63 micro-units per group regardless."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(dsum("l_quantity").alias("sum_qty"))
           .filter(F.col("sum_qty") > 300)
           .select("l_orderkey", "sum_qty"))
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


_Q19_ORACLE = f"""
SELECT {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 1 AND 20)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        AND l_quantity BETWEEN 10 AND 30)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        AND l_quantity BETWEEN 20 AND 40))
"""


@register("tpch_q19", _Q19_ORACLE)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue: equi join + disjunction of conjunctive range
    predicates.  Reference resources/sql/tpch/19.sql — the classic test
    that the OR-of-ANDs stays a *residual* filter on one equi hash join
    rather than degrading to a nested-loop."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
    )


_Q22_ORACLE = f"""
SELECT cntrycode, COUNT(*) AS numcust, {SQL_DSUM('c_acctbal')} AS totacctbal
FROM (
  SELECT c_nationkey % 10 AS cntrycode, c_acctbal
  FROM customer
  WHERE c_acctbal > (SELECT {SQL_DAVG('c_acctbal')} FROM customer
                     WHERE c_acctbal > 0.0)
    AND NOT EXISTS (SELECT * FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
"""


@register("tpch_q22", _Q22_ORACLE)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity: scalar subquery + NOT EXISTS anti join
    (customers above average balance with no *recent* orders — the date
    restriction keeps the anti join non-vacuous on the driver's synthetic
    data, where every customer has at least one historical order).
    Reference resources/sql/tpch/22.sql; relalg.getscalar
    (RelAlgOps.td:507-513) + antisemijoin (RelAlgOps.td:307-316).
    The scalar average is computed once and broadcast into the filter —
    Spark's subquery-as-literal via a cross join of a 1-row aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2000-01-01 00:00:00"))
    avg_bal = (cust.filter(F.col("c_acctbal") > 0.0)
               .agg(davg("c_acctbal").alias("avg_bal")))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select((F.col("c_nationkey") % 10).alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(F.count(F.lit(1)).alias("numcust"),
             dsum("c_acctbal").alias("totacctbal"))
        .orderBy("cntrycode")
    )
