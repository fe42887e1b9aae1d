"""Decorrelation-class query shapes (TPC-DS / JOB style) — the query
patterns the reference gates with its TPC-DS + JOB suites
(reference resources/sql/tpcds/, resources/sql/job/, CI
.github/workflows/workflow-ubuntu-latest-x86_64.yml:168-193) that the
TPC-H spine does not reach: correlated scalar aggregates in WHERE and
HAVING, EXISTS under OR, CTEs consumed 3+ times, window-over-join,
scalar subqueries in the SELECT list, INTERSECT chains, and
channel-union ROLLUP.  Each maps to the reference's Unnesting.cpp
decorrelation (src/compiler/Dialect/RelAlg/Transforms/Unnesting.cpp:18-333)
— here Catalyst's DecorrelateInnerQuery / RewritePredicateSubquery
renderings, with plan tests in tests/test_dsq.py asserting the rewrite
to joins (no per-row subquery re-execution).

Most shapes run as RAW SQL through spark.sql with the IDENTICAL string
as the DuckDB oracle (the reference's own interface is SQL text,
SURVEY.md §3.1), so what is verified is precisely "paste the reference
user's TPC-DS-style SQL and get the right answer".  Monetary comparison
happens in exact int64 micro-units (see functions.dsum): avg thresholds
are re-rendered as SUM/COUNT cross-multiplications so no float decides
a boundary row differently across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lingo_db_spark.catalog import load_table, register_views
from lingo_db_spark.queries import register

# Exact fixed-point rendering of a money expression (dialect-common).
def _micros(expr: str) -> str:
    return f"CAST(ROUND(({expr}) * 1000000.0) AS BIGINT)"


def _sql_query(name: str, sql: str, tables: tuple[str, ...], doc: str):
    """Register a raw-SQL query whose oracle is the identical string."""
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, tables)
        return spark.sql(sql)
    fn.__name__ = name
    fn.__doc__ = doc
    register(name, sql)(fn)
    return fn


# ---------------------------------------------------------------------------
# 1. TPC-DS q1 shape: CTE + correlated scalar aggregate threshold
# ---------------------------------------------------------------------------

_Q_CORR_AVG = f"""
WITH ct AS (
  SELECT c_custkey, c_nationkey,
         CAST(SUM({_micros('o_totalprice')}) AS BIGINT) AS tm
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey, c_nationkey)
SELECT c1.c_custkey,
       ROUND(CAST(c1.tm AS DOUBLE) / 1000000.0, 4) AS total_spend
FROM ct c1
WHERE c1.tm * 10 * (SELECT COUNT(*) FROM ct c2
                    WHERE c2.c_nationkey = c1.c_nationkey)
      > 12 * (SELECT CAST(SUM(tm) AS BIGINT) FROM ct c2
              WHERE c2.c_nationkey = c1.c_nationkey)
ORDER BY c1.c_custkey
"""

_sql_query(
    "ds_correlated_avg_threshold", _Q_CORR_AVG,
    ("customer", "orders"),
    """TPC-DS q1 shape (reference resources/sql/tpcds/1.sql): customers
    whose total spend exceeds 1.2x the average for their nation, with the
    average correlated on the outer row's nation.  Two correlated scalar
    aggregates over the same CTE; the avg is cross-multiplied into exact
    int64 arithmetic (tm * 10 * count > 12 * sum) so no float decides a
    boundary row.  Catalyst decorrelates both into aggregate + join
    (DecorrelateInnerQuery — the Spark analogue of reference
    Unnesting.cpp:18-333); plan-asserted in tests/test_dsq.py.""")


# ---------------------------------------------------------------------------
# 2. TPC-DS q6 shape: correlated per-category average in WHERE
# ---------------------------------------------------------------------------

_Q_ABOVE_TYPE_AVG = f"""
SELECT p1.p_partkey, p1.p_type,
       ROUND(p1.p_retailprice, 2) AS p_retailprice
FROM part p1
WHERE {_micros('p1.p_retailprice')} * 100
        * (SELECT COUNT(*) FROM part p2 WHERE p2.p_type = p1.p_type)
      > 105 * (SELECT CAST(SUM({_micros('p2.p_retailprice')}) AS BIGINT)
               FROM part p2 WHERE p2.p_type = p1.p_type)
ORDER BY p1.p_partkey
"""

_sql_query(
    "ds_above_category_avg", _Q_ABOVE_TYPE_AVG,
    ("part",),
    """TPC-DS q6 shape (resources/sql/tpcds/6.sql `i_current_price > 1.2 *
    (select avg(...) where same category)`): parts priced 5%+ above their
    type's average (the synthetic price spread is ±5%, so the TPC-DS 1.2
    factor would select nothing — the threshold is chosen to yield a
    non-vacuous result set at the verification scale), the
    correlated-aggregate-on-self pattern.  Decorrelates to one hash
    aggregate over part grouped by p_type joined back — NOT a per-row
    rescan of part (plan-asserted).""")


# ---------------------------------------------------------------------------
# 3. TPC-DS q10/q35 shape: EXISTS under OR (disjunctive existence)
# ---------------------------------------------------------------------------

_Q_EXISTS_OR = """
SELECT c.c_custkey, c.c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
   OR EXISTS (SELECT 1 FROM orders o JOIN lineitem l
                ON l.l_orderkey = o.o_orderkey
              WHERE o.o_custkey = c.c_custkey AND l.l_quantity > 45)
ORDER BY c.c_custkey
"""

_sql_query(
    "ds_exists_under_or", _Q_EXISTS_OR,
    ("customer", "orders", "lineitem"),
    """TPC-DS q10 shape (resources/sql/tpcds/10.sql `exists (...) and
    (exists (...) or exists (...))`): disjunctive EXISTS cannot become a
    plain semi join — each branch becomes a mark/existence join whose
    boolean feeds the OR (the reference's relalg.markjoin,
    RelAlgOps.td:380-391; Catalyst plans ExistenceJoin).  Plan-asserted:
    two existence joins, no per-row subquery.""")


# ---------------------------------------------------------------------------
# 4. TPC-DS q11 shape: CTE consumed 4x (year-over-year growth vs cohort)
# ---------------------------------------------------------------------------

@register("ds_year_total_cte_reuse", f"""
WITH yt AS (
  SELECT c_custkey, CAST(year(o_orderdate) AS INT) AS yr,
         CAST(SUM({_micros('o_totalprice')}) AS BIGINT) AS tm
  FROM customer JOIN orders ON c_custkey = o_custkey
  WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY c_custkey, year(o_orderdate))
SELECT a.c_custkey,
       ROUND(CAST(a.tm AS DOUBLE) / 1000000.0, 4) AS total_1995,
       ROUND(CAST(b.tm AS DOUBLE) / 1000000.0, 4) AS total_1996
FROM yt a JOIN yt b ON a.c_custkey = b.c_custkey
WHERE a.yr = 1995 AND b.yr = 1996
  AND b.tm > a.tm
  AND b.tm * (SELECT COUNT(*) FROM yt c WHERE c.yr = 1996)
      > (SELECT CAST(SUM(tm) AS BIGINT) FROM yt c WHERE c.yr = 1996)
ORDER BY a.c_custkey
""")
def ds_year_total_cte_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q11/q4 shape (resources/sql/tpcds/11.sql year_total CTE
    consumed 4x): per-customer yearly totals, self-joined 1995-vs-1996 for
    growth, then filtered against the 1996 cohort average (two more
    consumers).  The reference materializes multi-consumer subtrees
    (relalg.tmp via IntroduceTmp.cpp; CommonSubtreeElimination.cpp);
    Catalyst has no general CSE, so the engine persists the CTE explicitly
    — one aggregation feeds all four consumers (plan asserts
    InMemoryTableScan).  Exact int64 micro-unit money throughout."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    micros = F.round(F.col("o_totalprice") * 1_000_000.0, 0).cast("long")
    yt = (cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
          .withColumn("yr", F.year("o_orderdate").cast("int"))
          .filter(F.col("yr").isin(1995, 1996))
          .groupBy("c_custkey", "yr")
          .agg(F.sum(micros).alias("tm"))
          .persist())
    y96 = yt.filter(F.col("yr") == 1996)
    cohort = y96.agg(F.count(F.lit(1)).alias("n_96"),
                     F.sum("tm").alias("sum_96"))
    a = yt.filter(F.col("yr") == 1995).select(
        "c_custkey", F.col("tm").alias("tm_95"))
    b = y96.select("c_custkey", F.col("tm").alias("tm_96"))
    out = (a.join(b, "c_custkey")
           .filter(F.col("tm_96") > F.col("tm_95"))
           .crossJoin(F.broadcast(cohort))
           .filter(F.col("tm_96") * F.col("n_96") > F.col("sum_96"))
           .select("c_custkey",
                   F.round(F.col("tm_95").cast("double") / 1e6, 4)
                   .alias("total_1995"),
                   F.round(F.col("tm_96").cast("double") / 1e6, 4)
                   .alias("total_1996")))
    return out.orderBy("c_custkey")


# ---------------------------------------------------------------------------
# 5. TPC-DS q47/q88 shape: window functions over a multi-way join
# ---------------------------------------------------------------------------

@register("ds_window_over_join", f"""
WITH m AS (
  SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr,
         CAST(month(o_orderdate) AS INT) AS mo,
         CAST(SUM({_micros('o_totalprice')}) AS BIGINT) AS rev_m
  FROM nation
  JOIN customer ON n_nationkey = c_nationkey
  JOIN orders   ON c_custkey = o_custkey
  WHERE year(o_orderdate) = 1996
  GROUP BY n_name, year(o_orderdate), month(o_orderdate))
SELECT n_name, yr, mo,
       ROUND(CAST(rev_m AS DOUBLE) / 1000000.0, 4) AS revenue,
       CAST(RANK() OVER (PARTITION BY n_name ORDER BY rev_m DESC, mo)
            AS BIGINT) AS rnk,
       ROUND(CAST(rev_m AS DOUBLE) * 100.0
             / CAST(SUM(rev_m) OVER (PARTITION BY n_name) AS DOUBLE), 6)
         AS pct_of_year
FROM m
QUALIFY rnk <= 3
ORDER BY n_name, rnk
""")
def ds_window_over_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q47/q88 shape: aggregate over a 3-way join, then two window
    functions over the aggregate (rank of month within nation-year +
    share of the nation's yearly revenue), filtered on the rank (QUALIFY
    in the oracle).  The window input is the month x nation aggregate —
    tiny relative to the joined data — so the window cost is negligible
    and partitioned by nation (no global window).  Share division happens
    on identical int64s in both engines, so the doubles agree bitwise."""
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    micros = F.round(F.col("o_totalprice") * 1_000_000.0, 0).cast("long")
    m = (F.broadcast(nation)
         .join(cust, F.col("n_nationkey") == F.col("c_nationkey"))
         .join(orders, F.col("c_custkey") == F.col("o_custkey"))
         .filter(F.year("o_orderdate") == 1996)
         .groupBy("n_name",
                  F.year("o_orderdate").cast("int").alias("yr"),
                  F.month("o_orderdate").cast("int").alias("mo"))
         .agg(F.sum(micros).alias("rev_m")))
    w_rank = Window.partitionBy("n_name").orderBy(
        F.col("rev_m").desc(), F.col("mo"))
    w_all = Window.partitionBy("n_name")
    out = (m.withColumn("rnk", F.rank().over(w_rank).cast("long"))
           .withColumn("pct_of_year",
                       F.round(F.col("rev_m").cast("double") * 100.0
                               / F.sum("rev_m").over(w_all).cast("double"), 6))
           .filter(F.col("rnk") <= 3)
           .select("n_name", "yr", "mo",
                   F.round(F.col("rev_m").cast("double") / 1e6, 4)
                   .alias("revenue"),
                   "rnk", "pct_of_year"))
    return out.orderBy("n_name", "rnk")


# ---------------------------------------------------------------------------
# 6. TPC-DS q9 shape: scalar subqueries in the SELECT list
# ---------------------------------------------------------------------------

_Q_SCALAR_SELECT = f"""
SELECT CASE WHEN (SELECT COUNT(*) FROM lineitem
                  WHERE l_quantity BETWEEN 1 AND 10) > 6000
            THEN (SELECT CAST(SUM({_micros('l_extendedprice')}) AS BIGINT)
                  FROM lineitem WHERE l_quantity BETWEEN 1 AND 10)
            ELSE (SELECT CAST(SUM({_micros('l_extendedprice')}) AS BIGINT)
                  FROM lineitem WHERE l_quantity BETWEEN 11 AND 20)
       END AS bucket1,
       CASE WHEN (SELECT COUNT(*) FROM lineitem
                  WHERE l_quantity BETWEEN 21 AND 30) > 6000
            THEN (SELECT CAST(SUM({_micros('l_extendedprice')}) AS BIGINT)
                  FROM lineitem WHERE l_quantity BETWEEN 21 AND 30)
            ELSE (SELECT CAST(SUM({_micros('l_extendedprice')}) AS BIGINT)
                  FROM lineitem WHERE l_quantity BETWEEN 31 AND 40)
       END AS bucket2
"""

_sql_query(
    "ds_scalar_subqueries_select", _Q_SCALAR_SELECT,
    ("lineitem",),
    """TPC-DS q9 shape (resources/sql/tpcds/9.sql): CASE branches chosen
    by scalar-subquery counts, each branch itself a scalar aggregate
    subquery — six independent uncorrelated scalar subqueries in one
    SELECT list over zero base rows (the reference's relalg.getscalar,
    RelAlgOps.td:507-513).  Spark executes each as a subquery stage and
    folds the result in; exact int64 sums on both engines.""")


# ---------------------------------------------------------------------------
# 7. TPC-DS q38/q87 shape: INTERSECT chain + count
# ---------------------------------------------------------------------------

_Q_INTERSECT3 = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_loyal
FROM (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
  INTERSECT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
  INTERSECT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
) t
"""

_sql_query(
    "ds_intersect_years", _Q_INTERSECT3,
    ("orders",),
    """TPC-DS q38 shape (resources/sql/tpcds/38.sql): customers active in
    all three consecutive years via an INTERSECT chain, counted.  Each
    INTERSECT is a distinct + semi-join pipeline (reference
    relalg.intersect with distinct semantics, RelAlgOps.td:438-440).""")


# ---------------------------------------------------------------------------
# 8. TPC-DS q5/q77 shape: channel UNION ALL + ROLLUP over the union
# ---------------------------------------------------------------------------

_Q_CHANNELS = f"""
WITH ch AS (
  SELECT 'open' AS channel, n_name,
         CAST(SUM({_micros('o_totalprice')}) AS BIGINT) AS rev_m
  FROM nation JOIN customer ON n_nationkey = c_nationkey
  JOIN orders ON c_custkey = o_custkey
  WHERE o_orderstatus = 'O'
  GROUP BY n_name
  UNION ALL
  SELECT 'finished' AS channel, n_name,
         CAST(SUM({_micros('o_totalprice')}) AS BIGINT) AS rev_m
  FROM nation JOIN customer ON n_nationkey = c_nationkey
  JOIN orders ON c_custkey = o_custkey
  WHERE o_orderstatus = 'F'
  GROUP BY n_name)
SELECT COALESCE(channel, '<all>') AS channel,
       COALESCE(n_name, '<all>') AS n_name,
       ROUND(CAST(SUM(rev_m) AS DOUBLE) / 1000000.0, 4) AS revenue
FROM ch
GROUP BY ROLLUP(channel, n_name)
ORDER BY channel, n_name
"""

_sql_query(
    "ds_channels_rollup", _Q_CHANNELS,
    ("nation", "customer", "orders"),
    """TPC-DS q5/q77 shape (resources/sql/tpcds/5.sql): per-"channel"
    aggregates UNION ALLed, then ROLLUP over the union for channel and
    grand totals — aggregate-over-union-of-aggregates.  Exact int64
    micro-units survive the re-aggregation, so the rollup totals equal
    the oracle's bit-for-bit.""")


# ---------------------------------------------------------------------------
# 9. Correlated scalar aggregate in HAVING
# ---------------------------------------------------------------------------

_Q_HAVING_CORR = f"""
SELECT c.c_nationkey,
       CAST(SUM({_micros('c.c_acctbal')}) AS BIGINT) AS cust_bal_m
FROM customer c
GROUP BY c.c_nationkey
HAVING SUM({_micros('c.c_acctbal')})
       > 3 * (SELECT COALESCE(CAST(SUM({_micros('s.s_acctbal')}) AS BIGINT),
                              0)
              FROM supplier s WHERE s.s_nationkey = c.c_nationkey)
ORDER BY c.c_nationkey
"""

_sql_query(
    "ds_correlated_having", _Q_HAVING_CORR,
    ("customer", "supplier"),
    """Correlated scalar aggregate in HAVING (the TPC-DS q23/q30 flavor
    the verdict called out): nations where customer balances exceed 3x
    the nation's supplier balances, the inner aggregate correlated on the
    GROUP BY key.  COALESCE handles nations with no suppliers (the
    empty-subquery-is-NULL corner, reference relalg.getscalar NULL-if-
    empty semantics).  Decorrelates to two aggregates + one join.""")


# ---------------------------------------------------------------------------
# 10. TPC-DS q16/q94 shape: EXISTS and NOT EXISTS on the same table
# ---------------------------------------------------------------------------

_Q_EXISTS_NOTEXISTS = """
SELECT o1.o_orderkey, o1.o_orderpriority
FROM orders o1
WHERE year(o1.o_orderdate) = 1997
  AND EXISTS (SELECT 1 FROM lineitem l1
              WHERE l1.l_orderkey = o1.o_orderkey AND l1.l_discount > 0.05)
  AND NOT EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = o1.o_orderkey
                    AND l2.l_quantity > 48)
ORDER BY o1.o_orderkey
"""

_sql_query(
    "ds_exists_notexists", _Q_EXISTS_NOTEXISTS,
    ("orders", "lineitem"),
    """TPC-DS q16/q94 shape (resources/sql/tpcds/16.sql: `exists(other
    warehouse) and not exists(returns)`): a semi join and an anti join
    against the same fact table with different residual predicates on one
    outer row.  Catalyst plans LeftSemi + LeftAnti back-to-back
    (reference relalg.semijoin + relalg.antisemijoin).""")


# ---------------------------------------------------------------------------
# 11. JOB-style: many-way join with string predicates on several dims
# ---------------------------------------------------------------------------

_Q_JOB_CHAIN = f"""
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(SUM({_micros('l_extendedprice * (1 - l_discount)')})
                  AS DOUBLE) / 1000000.0, 4) AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN supplier ON s_nationkey = n_nationkey
JOIN lineitem ON l_suppkey = s_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN part     ON p_partkey = l_partkey
WHERE r_name IN ('AMERICA', 'ASIA')
  AND p_name LIKE '%gi%'
  AND p_type IN ('ECONOMY', 'PROMO', 'STANDARD')
  AND c_mktsegment <> 'AUTOMOBILE'
  AND o_orderpriority LIKE '1%'
GROUP BY n_name
ORDER BY n_name
"""

_sql_query(
    "job_style_join_chain", _Q_JOB_CHAIN,
    ("region", "nation", "supplier", "lineitem", "orders", "customer",
     "part"),
    """JOB-class shape (reference resources/sql/job/: IMDB queries are
    6-10-way joins whose selectivity lives in LIKE/IN string predicates
    on several dimensions at once — what the reference's DPhyp +
    sample-based estimation orders, OptimizeJoinOrder.cpp:121-126).
    Seven-way join, string filters on part/customer/orders, written
    dimension-first so the small filtered sides build the hash tables;
    with stats-backed catalog tables (stats.py) CBO reorders it
    regardless of the written order.""")


# ---------------------------------------------------------------------------
# 12. TPC-DS q51 shape: cumulative windows over two channels, full outer
# ---------------------------------------------------------------------------

@register("ds_cumulative_channels", f"""
WITH o AS (
  SELECT CAST(year(o_orderdate) AS INT) AS yr,
         CAST(month(o_orderdate) AS INT) AS mo,
         CAST(SUM(CASE WHEN o_orderstatus = 'O'
                       THEN {_micros('o_totalprice')} ELSE 0 END) AS BIGINT)
           AS open_m,
         CAST(SUM(CASE WHEN o_orderstatus = 'F'
                       THEN {_micros('o_totalprice')} ELSE 0 END) AS BIGINT)
           AS fin_m
  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2),
c AS (
  SELECT yr, mo,
         CAST(SUM(open_m) OVER (ORDER BY yr, mo
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS BIGINT)
           AS cum_open,
         CAST(SUM(fin_m) OVER (ORDER BY yr, mo
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT)
           AS cum_fin
  FROM o)
SELECT yr, mo,
       ROUND(CAST(cum_open AS DOUBLE) / 1000000.0, 4) AS cum_open_rev,
       ROUND(CAST(cum_fin AS DOUBLE) / 1000000.0, 4) AS cum_fin_rev
FROM c
WHERE cum_open > cum_fin
ORDER BY yr, mo
""")
def ds_cumulative_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q51 shape (resources/sql/tpcds/51.sql: per-channel
    cumulative sums compared month by month): monthly open-vs-finished
    revenue, running totals over the month sequence, months where the
    open channel leads.  The cumulative window runs over the
    24-row month aggregate — bounded input, so the empty-PARTITION BY
    frame is constant-sized, the same discipline as the token-budget
    prefix scan.  Exact int64 micro-units decide the comparison."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996))
    micros = F.round(F.col("o_totalprice") * 1_000_000.0, 0).cast("long")
    monthly = (orders.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"))
        .agg(F.sum(F.when(F.col("o_orderstatus") == "O", micros)
                   .otherwise(F.lit(0))).alias("open_m"),
             F.sum(F.when(F.col("o_orderstatus") == "F", micros)
                   .otherwise(F.lit(0))).alias("fin_m")))
    w = (Window.orderBy("yr", "mo")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (monthly
           .withColumn("cum_open", F.sum("open_m").over(w).cast("long"))
           .withColumn("cum_fin", F.sum("fin_m").over(w).cast("long")))
    return (cum.filter(F.col("cum_open") > F.col("cum_fin"))
            .select("yr", "mo",
                    F.round(F.col("cum_open").cast("double") / 1e6, 4)
                    .alias("cum_open_rev"),
                    F.round(F.col("cum_fin").cast("double") / 1e6, 4)
                    .alias("cum_fin_rev"))
            .orderBy("yr", "mo"))
