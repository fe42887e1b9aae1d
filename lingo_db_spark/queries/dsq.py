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


# ---------------------------------------------------------------------------
# 13. TPC-DS q88 shape: 8x self-scan, single-row cross of band counts
# ---------------------------------------------------------------------------

def _band(lo: int, hi: int, col: str) -> str:
    """One q88-style time-band scan: a quantity band plus the q88
    OR-of-conjunction demographic filter, rendered on lineitem."""
    return f"""(SELECT CAST(COUNT(*) AS BIGINT) AS {col}
 FROM lineitem, orders
 WHERE l_orderkey = o_orderkey
   AND l_quantity BETWEEN {lo} AND {hi}
   AND ((l_discount <= 0.02 AND l_tax <= 0.04)
     OR (l_discount >= 0.05 AND l_tax <= 0.02)
     OR (l_discount >= 0.09))
   AND o_orderstatus <> 'P') {col}_s"""


_Q_TIME_BANDS = ("SELECT * FROM\n " + ",\n ".join(
    _band(1 + 6 * i, 6 + 6 * i, f"b{i + 1}") for i in range(8)))

_sql_query(
    "ds_time_band_counts", _Q_TIME_BANDS,
    ("lineitem", "orders"),
    """TPC-DS q88 shape (resources/sql/tpcds/88.sql): EIGHT independent
    scans of the same fact join, each counting one band (q88: eight
    half-hour time bands x household-demographics OR-cascade; here eight
    quantity bands x a discount/tax OR-cascade), cross-joined into a
    single 1x8 row.  Every cross input is exactly one row, so the
    BroadcastNestedLoop chain is constant-size — the only legal
    cartesian.  Each band scan pushes its band predicate into the
    parquet scan independently.""")


# ---------------------------------------------------------------------------
# 14. TPC-DS q64 shape: HAVING-filtered CTE + two-snapshot self-join
# ---------------------------------------------------------------------------

_Q_TWO_SNAPSHOT = f"""
WITH refunded AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CASE WHEN l_returnflag = 'R'
                  THEN {_micros('l_extendedprice')} ELSE 0 END) * 2
         > SUM({_micros('l_extendedprice')})),
snap AS (
  SELECT c_custkey, c_name, CAST(year(o_orderdate) AS INT) AS yr,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM({_micros('o_totalprice')}) AS BIGINT) AS tot_m
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  WHERE o_orderkey IN (SELECT l_orderkey FROM refunded)
  GROUP BY c_custkey, c_name, year(o_orderdate))
SELECT s1.c_custkey, s1.c_name,
       s1.cnt AS cnt_1995, s2.cnt AS cnt_1996,
       ROUND(CAST(s1.tot_m AS DOUBLE) / 1000000.0, 4) AS total_1995,
       ROUND(CAST(s2.tot_m AS DOUBLE) / 1000000.0, 4) AS total_1996
FROM snap s1
JOIN snap s2 ON s1.c_custkey = s2.c_custkey
WHERE s1.yr = 1995 AND s2.yr = 1996
  AND s2.tot_m >= s1.tot_m
ORDER BY s1.c_custkey
"""

_sql_query(
    "ds_two_snapshot_self_join", _Q_TWO_SNAPSHOT,
    ("lineitem", "customer", "orders"),
    """TPC-DS q64 shape (resources/sql/tpcds/64.sql: cs_ui HAVING-filtered
    CTE gates the fact rows, cross_sales is built once and self-joined on
    two year snapshots with a cross-snapshot comparison).  Here: orders
    where returned value exceeds half the total (the cs_ui
    sale > 2*refund analogue, inverted), per-customer yearly snapshots
    over the gated set, 1995-vs-1996 self-join keeping customers whose
    spend did not shrink.  The IN over the CTE decorrelates to a semi
    join; the snapshot CTE feeds both sides of the self-join.""")


# ---------------------------------------------------------------------------
# 15. TPC-DS q57/q47 shape: windowed deviation from yearly average + lag/lead
# ---------------------------------------------------------------------------

_Q_WINDOWED_DEVIATION = f"""
WITH v1 AS (
  SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr,
         CAST(month(o_orderdate) AS INT) AS mo,
         CAST(SUM({_micros('o_totalprice')}) AS BIGINT) AS rev_m
  FROM nation
  JOIN customer ON n_nationkey = c_nationkey
  JOIN orders   ON c_custkey = o_custkey
  WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY n_name, year(o_orderdate), month(o_orderdate)),
v2 AS (
  SELECT n_name, yr, mo, rev_m,
         CAST(SUM(rev_m) OVER (PARTITION BY n_name, yr) AS BIGINT)
           AS year_sum,
         CAST(COUNT(*) OVER (PARTITION BY n_name, yr) AS BIGINT) AS year_n,
         LAG(rev_m)  OVER (PARTITION BY n_name ORDER BY yr, mo) AS prev_rev,
         LEAD(rev_m) OVER (PARTITION BY n_name ORDER BY yr, mo) AS next_rev
  FROM v1)
SELECT n_name, yr, mo,
       ROUND(CAST(rev_m AS DOUBLE) / 1000000.0, 4) AS revenue,
       ROUND(CAST(year_sum AS DOUBLE) / CAST(year_n AS DOUBLE)
             / 1000000.0, 4) AS avg_monthly,
       ROUND(CAST(prev_rev AS DOUBLE) / 1000000.0, 4) AS prev_revenue,
       ROUND(CAST(next_rev AS DOUBLE) / 1000000.0, 4) AS next_revenue
FROM v2
WHERE year_n = 12
  AND abs(rev_m * year_n - year_sum) * 10 > year_sum
  AND prev_rev IS NOT NULL AND next_rev IS NOT NULL
ORDER BY n_name, yr, mo
"""

_sql_query(
    "ds_windowed_deviation", _Q_WINDOWED_DEVIATION,
    ("nation", "customer", "orders"),
    """TPC-DS q57/q47 shape (resources/sql/tpcds/57.sql: v1 computes
    monthly sums + avg-over-year window + rank, v2 self-joins rn-1/rn+1
    for the neighboring months, filtered on deviation from the yearly
    average).  LAG/LEAD over the same ordering replaces q57's triple
    self-join on rn (identical semantics, one window pass instead of two
    extra joins — the rewrite both engines' optimizers would want).  The
    deviation threshold |rev - avg| > 0.1*avg is cross-multiplied into
    exact int64 (|rev*n - sum|*10 > sum) so no float decides a row.""")


# ---------------------------------------------------------------------------
# 16. JOB shape: 5-way join, LIKE / NOT LIKE cascade on three dims
# ---------------------------------------------------------------------------

_Q_JOB_LIKE_CASCADE = """
SELECT MIN(p_name) AS min_part_name,
       MIN(s_name) AS min_supplier_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM part p, supplier s, lineitem l, nation n, region r
WHERE l.l_partkey = p.p_partkey
  AND l.l_suppkey = s.s_suppkey
  AND s.s_nationkey = n.n_nationkey
  AND n.n_regionkey = r.r_regionkey
  AND p.p_name LIKE '%ol%'
  AND p.p_name NOT LIKE '%old%'
  AND p.p_type LIKE '%ROMO%'
  AND s.s_name NOT LIKE '%0001%'
  AND n.n_name LIKE '%A%'
  AND r.r_name <> 'EUROPE'
"""

_sql_query(
    "job_like_cascade_minagg", _Q_JOB_LIKE_CASCADE,
    ("part", "supplier", "lineitem", "nation", "region"),
    """JOB shape (reference resources/sql/job/8a.sql: comma-join list,
    `note LIKE '%(Japan)%' AND note NOT LIKE '%(USA)%' AND name LIKE
    '%Yo%' AND name NOT LIKE '%Yu%'`, MIN() aggregates, no GROUP BY):
    the selectivity lives entirely in LIKE/NOT-LIKE string predicates
    spread over three dimensions of a 5-way join.  All string filters
    push to the dimension scans; the join order question (smallest
    filtered dim first) is what JOB exists to stress — stats-backed CBO
    (stats.py) plus AQE handle it here.""")


# ---------------------------------------------------------------------------
# 17. JOB shape: disjunctive LIKE + date band over a 6-way join
# ---------------------------------------------------------------------------

_Q_JOB_DISJUNCTIVE = f"""
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       ROUND(CAST(SUM({_micros('l_extendedprice * (1 - l_discount)')})
                  AS DOUBLE) / 1000000.0, 4) AS revenue
FROM region, nation, customer, orders, lineitem, part
WHERE n_regionkey = r_regionkey
  AND c_nationkey = n_nationkey
  AND o_custkey = c_custkey
  AND l_orderkey = o_orderkey
  AND l_partkey = p_partkey
  AND (p_name LIKE '%red%' OR p_name LIKE '%blue%' OR p_name LIKE '%anvil%')
  AND (c_name LIKE '%19%' OR c_mktsegment IN ('BUILDING', 'MACHINERY'))
  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                      AND TIMESTAMP '1996-12-31 23:59:59'
  AND r_name IN ('AMERICA', 'AFRICA', 'ASIA')
  AND o_orderpriority NOT LIKE '5%'
GROUP BY n_name
ORDER BY n_name
"""

_sql_query(
    "job_disjunctive_like_chain", _Q_JOB_DISJUNCTIVE,
    ("region", "nation", "customer", "orders", "lineitem", "part"),
    """JOB shape, disjunctive variant (resources/sql/job/ queries whose
    filters are OR-of-LIKE over one dim plus IN-lists over another): a
    6-way comma join where OR blocks per-column pushdown statistics but
    each disjunct is still scan-evaluable.  The OR-of-LIKE stays inside
    the part/customer scans (no join blow-up), the date band pushes to
    the orders scan.""")


# ---------------------------------------------------------------------------
# 18. TPC-DS q36/q70 shape: ROLLUP hierarchy + rank within parent level
# ---------------------------------------------------------------------------

_Q_ROLLUP_RANK = f"""
WITH agg AS (
  SELECT r_name, n_name,
         CAST(SUM({_micros('o_totalprice')}) AS BIGINT) AS rev_m,
         CAST(GROUPING(r_name) + GROUPING(n_name) AS INT) AS lochierarchy,
         CAST(GROUPING(n_name) AS INT) AS g_nation
  FROM region
  JOIN nation   ON n_regionkey = r_regionkey
  JOIN customer ON c_nationkey = n_nationkey
  JOIN orders   ON o_custkey = c_custkey
  GROUP BY ROLLUP(r_name, n_name))
SELECT COALESCE(r_name, '<all>') AS r_name,
       COALESCE(n_name, '<all>') AS n_name,
       ROUND(CAST(rev_m AS DOUBLE) / 1000000.0, 4) AS revenue,
       lochierarchy,
       CAST(RANK() OVER (
         PARTITION BY lochierarchy,
                      CASE WHEN g_nation = 0 THEN r_name END
         ORDER BY rev_m DESC, COALESCE(n_name, '')) AS BIGINT)
         AS rank_within_parent
FROM agg
ORDER BY lochierarchy DESC, r_name, n_name
"""

_sql_query(
    "ds_rollup_hierarchy_rank", _Q_ROLLUP_RANK,
    ("region", "nation", "customer", "orders"),
    """TPC-DS q36/q70 shape (resources/sql/tpcds/70.sql: `rank() over
    (partition by grouping(s_state)+grouping(s_county), case when
    grouping(s_county)=0 then s_state end order by sumsales desc)`):
    ROLLUP over a region->nation hierarchy, then each rollup LEVEL
    ranked within its parent — nations within their region, regions
    within the grand total — via GROUPING()-derived partition keys.
    GROUPING() is computed inside the CTE (both engines agree on its
    0/1 encoding) and the window partitions on it.""")


# ---------------------------------------------------------------------------
# 19. TPC-DS q78 shape: cross-channel ratio with null-preserving left join
# ---------------------------------------------------------------------------

_Q_CROSSCHANNEL = f"""
WITH open_ch AS (
  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
         CAST(SUM({_micros('o_totalprice')}) AS BIGINT) AS tot_m
  FROM orders WHERE o_orderstatus = 'O'
  GROUP BY o_custkey, year(o_orderdate)),
fin_ch AS (
  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
         CAST(SUM({_micros('o_totalprice')}) AS BIGINT) AS tot_m
  FROM orders WHERE o_orderstatus = 'F'
  GROUP BY o_custkey, year(o_orderdate))
SELECT o.o_custkey, o.yr,
       ROUND(CAST(o.tot_m AS DOUBLE) / 1000000.0, 4) AS open_total,
       ROUND(CAST(COALESCE(f.tot_m, 0) AS DOUBLE) / 1000000.0, 4)
         AS fin_total
FROM open_ch o
LEFT JOIN fin_ch f ON o.o_custkey = f.o_custkey AND o.yr = f.yr
WHERE COALESCE(f.tot_m, 0) * 2 < o.tot_m
ORDER BY o.o_custkey, o.yr
"""

_sql_query(
    "ds_crosschannel_ratio", _Q_CROSSCHANNEL,
    ("orders",),
    """TPC-DS q78 shape (resources/sql/tpcds/78.sql: store/web/catalog
    per-customer-year totals LEFT-JOINed, rows kept where one channel
    dominates, COALESCE for channel-absent customers): two channel CTEs
    from the same fact (disjoint status slices), null-preserving left
    join on the two-part key, exact int64 dominance predicate
    (coalesce(f,0)*2 < o).  The unmatched-right NULL corner is the
    point — it must coalesce, not drop.""")


# ---------------------------------------------------------------------------
# 20. TPC-DS q93 shape: returns-adjusted totals, bottom-k
# ---------------------------------------------------------------------------

_Q_RETURNS_ADJUSTED = f"""
SELECT o_custkey,
       ROUND(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 0
                      ELSE {_micros('l_extendedprice * (1 - l_discount)')}
                      END) AS DOUBLE) / 1000000.0, 4) AS act_revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_custkey
ORDER BY act_revenue, o_custkey
LIMIT 100
"""

_sql_query(
    "ds_returns_adjusted_bottomk", _Q_RETURNS_ADJUSTED,
    ("lineitem", "orders"),
    """TPC-DS q93 shape (resources/sql/tpcds/93.sql: sales joined to
    returns, per-item quantity/price recomputed net of the returned
    part, `order by sumsales limit 100`): revenue with returned
    lineitems zeroed out, BOTTOM-100 customers — an ascending top-k
    (TakeOrderedAndProject), tie-broken on the key for cross-engine
    determinism.""")


# ---------------------------------------------------------------------------
# 21. TPC-DS q54 shape: IN over a UNION of channel subqueries
# ---------------------------------------------------------------------------

_Q_UNION_IN = """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
WHERE c_custkey IN (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION
  SELECT o_custkey FROM orders
  WHERE o_orderstatus = 'F' AND year(o_orderdate) = 1997)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

_sql_query(
    "ds_union_in_subquery", _Q_UNION_IN,
    ("customer", "orders"),
    """TPC-DS q54 shape (resources/sql/tpcds/54.sql: `cs_sold_date_sk in
    (select d_date_sk ...)` with the candidate set built from a UNION of
    catalog and web channels): membership against a UNION (distinct) of
    two differently-filtered scans of the same fact — plans as
    distinct-union then LeftSemi, never a per-row subquery.""")


# ---------------------------------------------------------------------------
# 22. TPC-DS q34/q73 shape: HAVING COUNT BETWEEN, joined back to customers
# ---------------------------------------------------------------------------

_Q_FREQ_BAND = """
WITH freq AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders
  GROUP BY o_custkey
  HAVING COUNT(*) BETWEEN 15 AND 20)
SELECT c_custkey, c_name, cnt
FROM customer JOIN freq ON c_custkey = o_custkey
ORDER BY cnt DESC, c_custkey
"""

_sql_query(
    "ds_having_count_band", _Q_FREQ_BAND,
    ("customer", "orders"),
    """TPC-DS q34/q73 shape (resources/sql/tpcds/73.sql: ticket counts
    per household HAVING cnt between 1 and 5, joined back to customer,
    `order by cnt desc`): an aggregate gated by a COUNT band re-joined
    to the dimension — the grouped side is the small side after the
    HAVING, so it builds the hash table / broadcasts.""")


# ---------------------------------------------------------------------------
# 23. TPC-DS q31 shape: QoQ growth ratios compared across two channels
# ---------------------------------------------------------------------------

_Q_QOQ_GROWTH = f"""
WITH oq AS (
  SELECT n_name, CAST(quarter(o_orderdate) AS INT) AS qtr,
         CAST(SUM({_micros('o_totalprice')}) AS BIGINT) AS rev_m
  FROM nation JOIN customer ON n_nationkey = c_nationkey
  JOIN orders ON c_custkey = o_custkey
  WHERE year(o_orderdate) = 1996 AND o_orderstatus = 'O'
  GROUP BY n_name, quarter(o_orderdate)),
fq AS (
  SELECT n_name, CAST(quarter(o_orderdate) AS INT) AS qtr,
         CAST(SUM({_micros('o_totalprice')}) AS BIGINT) AS rev_m
  FROM nation JOIN customer ON n_nationkey = c_nationkey
  JOIN orders ON c_custkey = o_custkey
  WHERE year(o_orderdate) = 1996 AND o_orderstatus = 'F'
  GROUP BY n_name, quarter(o_orderdate))
SELECT o1.n_name,
       ROUND(CAST(o2.rev_m AS DOUBLE) / CAST(o1.rev_m AS DOUBLE), 6)
         AS open_q2_over_q1,
       ROUND(CAST(f2.rev_m AS DOUBLE) / CAST(f1.rev_m AS DOUBLE), 6)
         AS fin_q2_over_q1
FROM oq o1 JOIN oq o2 ON o1.n_name = o2.n_name
JOIN fq f1 ON f1.n_name = o1.n_name
JOIN fq f2 ON f2.n_name = o1.n_name
WHERE o1.qtr = 1 AND o2.qtr = 2 AND f1.qtr = 1 AND f2.qtr = 2
  AND o1.rev_m > 0 AND f1.rev_m > 0
  AND CAST(o2.rev_m AS DOUBLE) * CAST(f1.rev_m AS DOUBLE)
      > CAST(f2.rev_m AS DOUBLE) * CAST(o1.rev_m AS DOUBLE)
ORDER BY o1.n_name
"""

_sql_query(
    "ds_qoq_growth_channels", _Q_QOQ_GROWTH,
    ("nation", "customer", "orders"),
    """TPC-DS q31 shape (resources/sql/tpcds/31.sql: store vs web
    quarter-over-quarter growth ratios joined per county across 3
    quarters, `web_q1_q2_increase > store_q1_q2_increase`): two channel
    CTEs each self-joined across quarters, the RATIO COMPARISON
    cross-multiplied (o2*f1 > f2*o1).  The micro-unit operands (~1e12)
    are each exactly representable in a double (< 2^53) and the int64
    product would overflow, so the comparison runs on IEEE double
    products — identical operations, identical rounding, identical
    verdicts on both engines.""")


# ---------------------------------------------------------------------------
# 24. TPC-DS q41 shape: NOT EXISTS over an OR-cascade dimension subquery
# ---------------------------------------------------------------------------

_Q_NOTEXISTS_OR = """
SELECT DISTINCT p_name, p_type
FROM part p1
WHERE p_size BETWEEN 1 AND 25
  AND NOT EXISTS (
    SELECT 1 FROM part p2
    WHERE p2.p_brand = p1.p_brand
      AND ((p2.p_type = 'PROMO' AND p2.p_size IN (38, 39))
        OR (p2.p_type = 'STANDARD' AND p2.p_size IN (47, 48))))
ORDER BY p_name, p_type
"""

_sql_query(
    "ds_notexists_or_cascade", _Q_NOTEXISTS_OR,
    ("part",),
    """TPC-DS q41 shape (resources/sql/tpcds/41.sql: item names where NO
    sibling item of the same manufacturer matches a large OR-cascade of
    attribute conjunctions): correlated NOT EXISTS on a self-scan whose
    inner predicate is a disjunction of conjunction blocks — plans as a
    LeftAnti join against the OR-filtered self-scan, never a per-row
    rescan.""")


# ---------------------------------------------------------------------------
# 25. TPC-DS q21 shape: conditional-count ratio per group with HAVING band
# ---------------------------------------------------------------------------

_Q_COND_COUNT_RATIO = """
SELECT s_name, n_name,
       CAST(SUM(CASE WHEN year(l_shipdate) = 1996 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_1996,
       CAST(SUM(CASE WHEN year(l_shipdate) = 1997 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_1997
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN lineitem ON l_suppkey = s_suppkey
WHERE year(l_shipdate) IN (1996, 1997)
GROUP BY s_name, n_name
HAVING SUM(CASE WHEN year(l_shipdate) = 1996 THEN 1 ELSE 0 END) * 2
       < SUM(CASE WHEN year(l_shipdate) = 1997 THEN 1 ELSE 0 END) * 3
   AND SUM(CASE WHEN year(l_shipdate) = 1997 THEN 1 ELSE 0 END) * 2
       < SUM(CASE WHEN year(l_shipdate) = 1996 THEN 1 ELSE 0 END) * 3
ORDER BY s_name
"""

_sql_query(
    "ds_conditional_count_band", _Q_COND_COUNT_RATIO,
    ("supplier", "nation", "lineitem"),
    """TPC-DS q21 shape (resources/sql/tpcds/21.sql: inventory counted
    into before/after-date buckets per (warehouse,item), kept where the
    ratio sits inside [2/3, 3/2]): conditional-sum bucketing inside one
    aggregation, both HAVING bounds cross-multiplied into exact integer
    comparisons — one scan, one shuffle, no self-join.""")


# ---------------------------------------------------------------------------
# 26. TPC-DS q59 shape: week-over-week shifted self-join of one aggregate
# ---------------------------------------------------------------------------

_Q_WOW_SHIFT = f"""
WITH wk AS (
  SELECT CAST(year(o_orderdate) AS INT) AS yr,
         CAST(weekofyear(o_orderdate) AS INT) AS wk,
         CAST(SUM({_micros('o_totalprice')}) AS BIGINT) AS rev_m
  FROM orders
  WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY year(o_orderdate), weekofyear(o_orderdate))
SELECT a.wk,
       ROUND(CAST(a.rev_m AS DOUBLE) / 1000000.0, 4) AS rev_1995,
       ROUND(CAST(b.rev_m AS DOUBLE) / 1000000.0, 4) AS rev_1996,
       ROUND(CAST(b.rev_m AS DOUBLE) / CAST(a.rev_m AS DOUBLE), 6)
         AS yoy_ratio
FROM wk a JOIN wk b ON a.wk = b.wk
WHERE a.yr = 1995 AND b.yr = 1996 AND a.wk BETWEEN 2 AND 52
ORDER BY a.wk
"""

_sql_query(
    "ds_week_shift_self_join", _Q_WOW_SHIFT,
    ("orders",),
    """TPC-DS q59 shape (resources/sql/tpcds/59.sql: per-store weekly
    sales CTE joined to ITSELF shifted 52 weeks, each week's ratio
    this-year/last-year): one weekly aggregate consumed twice under a
    shifted equi-join — the time-shift self-join every retail dashboard
    runs.  weekofyear is ISO-8601 in both Spark and DuckDB; week 1 and
    53 excluded (they straddle year boundaries differently by year).""")


# ---------------------------------------------------------------------------
# 27. TPC-DS q89 shape: deviation-from-window-average filter, top-k
# ---------------------------------------------------------------------------

_Q_AVG_DEVIATION_TOPK = f"""
WITH m AS (
  SELECT p_type, c_mktsegment, CAST(month(o_orderdate) AS INT) AS mo,
         CAST(SUM({_micros('l_extendedprice')}) AS BIGINT) AS rev_m
  FROM part
  JOIN lineitem ON l_partkey = p_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  WHERE year(o_orderdate) = 1996
  GROUP BY p_type, c_mktsegment, month(o_orderdate)),
w AS (
  SELECT p_type, c_mktsegment, mo, rev_m,
         CAST(SUM(rev_m) OVER (PARTITION BY p_type, c_mktsegment)
              AS BIGINT) AS grp_sum,
         CAST(COUNT(*) OVER (PARTITION BY p_type, c_mktsegment)
              AS BIGINT) AS grp_n
  FROM m)
SELECT p_type, c_mktsegment, mo,
       ROUND(CAST(rev_m AS DOUBLE) / 1000000.0, 4) AS revenue,
       ROUND(CAST(grp_sum AS DOUBLE) / CAST(grp_n AS DOUBLE)
             / 1000000.0, 4) AS avg_monthly
FROM w
WHERE grp_n = 12 AND abs(rev_m * grp_n - grp_sum) * 4 > grp_sum
ORDER BY CAST(abs(rev_m * grp_n - grp_sum) AS DOUBLE)
           / CAST(grp_sum AS DOUBLE) DESC,
         p_type, c_mktsegment, mo
LIMIT 50
"""

_sql_query(
    "ds_avg_deviation_topk", _Q_AVG_DEVIATION_TOPK,
    ("part", "lineitem", "orders", "customer"),
    """TPC-DS q89 shape (resources/sql/tpcds/89.sql: monthly sales vs
    avg-over-category window, `case when avg <> 0 then abs(sum-avg)/avg
    end > 0.1`, order by the deviation, limit 100): deviation filter and
    ORDER BY both derived from the window aggregate; the filter
    cross-multiplied exact, the sort key a deterministic double ratio of
    identical int64s with full tie-break.""")


# ---------------------------------------------------------------------------
# 28. TPC-DS q33/q56 shape: three-channel UNION ALL of restricted aggs
# ---------------------------------------------------------------------------

_Q_THREE_CHANNEL_UNION = f"""
WITH seg AS (
  SELECT p_brand FROM part WHERE p_type IN ('ECONOMY', 'PROMO')),
ch1 AS (
  SELECT p_brand, CAST(SUM({_micros('l_extendedprice')}) AS BIGINT) AS rev_m
  FROM part JOIN lineitem ON l_partkey = p_partkey
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'O' AND p_brand IN (SELECT p_brand FROM seg)
  GROUP BY p_brand),
ch2 AS (
  SELECT p_brand, CAST(SUM({_micros('l_extendedprice')}) AS BIGINT) AS rev_m
  FROM part JOIN lineitem ON l_partkey = p_partkey
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F' AND p_brand IN (SELECT p_brand FROM seg)
  GROUP BY p_brand),
ch3 AS (
  SELECT p_brand, CAST(SUM({_micros('l_extendedprice')}) AS BIGINT) AS rev_m
  FROM part JOIN lineitem ON l_partkey = p_partkey
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'P' AND p_brand IN (SELECT p_brand FROM seg)
  GROUP BY p_brand)
SELECT p_brand,
       ROUND(CAST(SUM(rev_m) AS DOUBLE) / 1000000.0, 4) AS total_revenue
FROM (SELECT * FROM ch1 UNION ALL SELECT * FROM ch2
      UNION ALL SELECT * FROM ch3) u
GROUP BY p_brand
ORDER BY p_brand
"""

_sql_query(
    "ds_three_channel_union", _Q_THREE_CHANNEL_UNION,
    ("part", "lineitem", "orders"),
    """TPC-DS q33/q56 shape (resources/sql/tpcds/33.sql: three channel
    CTEs — store/catalog/web — each restricted by the same IN-subquery
    over a category slice, UNION ALLed and re-aggregated): the
    restricted-dimension semi-join repeats per channel, then
    aggregate-over-union-of-aggregates.  Exact int64 partials survive
    the re-aggregation bit-for-bit.""")


# ---------------------------------------------------------------------------
# 29. TPC-DS q23 shape: two scalar-CTE thresholds gating a fact aggregate
# ---------------------------------------------------------------------------

_Q_SCALAR_CTE_GATES = f"""
WITH freq_parts AS (
  SELECT l_partkey
  FROM lineitem
  GROUP BY l_partkey
  HAVING COUNT(*) > 30),
big_spenders AS (
  SELECT o_custkey
  FROM orders
  GROUP BY o_custkey
  HAVING CAST(SUM({_micros('o_totalprice')}) AS BIGINT) >
    (SELECT CAST(MAX(t) AS BIGINT) / 2 FROM (
       SELECT SUM({_micros('o_totalprice')}) AS t
       FROM orders GROUP BY o_custkey) mx))
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(CAST(SUM({_micros('l_extendedprice')}) AS DOUBLE)
             / 1000000.0, 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_partkey IN (SELECT l_partkey FROM freq_parts)
  AND o_custkey IN (SELECT o_custkey FROM big_spenders)
"""

_sql_query(
    "ds_scalar_cte_gates", _Q_SCALAR_CTE_GATES,
    ("lineitem", "orders"),
    """TPC-DS q23 shape (resources/sql/tpcds/23a.sql: frequent_ss_items +
    best_ss_customer CTEs — one a frequency HAVING, one a
    spend-above-half-of-max HAVING with a nested scalar subquery over
    another aggregate — both gating the final fact aggregate via IN):
    two semi-join gates, one of them against a threshold derived from a
    scalar subquery over a second aggregation of the same fact.""")


# ---------------------------------------------------------------------------
# 30. TPC-DS q12/q98 shape: revenue share of class within category (window)
# ---------------------------------------------------------------------------

_Q_REVENUE_SHARE = f"""
WITH a AS (
  SELECT p_type, p_brand,
         CAST(SUM({_micros('l_extendedprice')}) AS BIGINT) AS rev_m
  FROM part JOIN lineitem ON l_partkey = p_partkey
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                        AND TIMESTAMP '1996-03-31 23:59:59'
  GROUP BY p_type, p_brand)
SELECT p_type, p_brand,
       ROUND(CAST(rev_m AS DOUBLE) / 1000000.0, 4) AS revenue,
       ROUND(CAST(rev_m AS DOUBLE) * 100.0
             / CAST(SUM(rev_m) OVER (PARTITION BY p_type) AS DOUBLE), 6)
         AS revenueratio
FROM a
ORDER BY p_type, revenueratio DESC, p_brand
"""

_sql_query(
    "ds_revenue_share_window", _Q_REVENUE_SHARE,
    ("part", "lineitem", "orders"),
    """TPC-DS q12/q98 shape (resources/sql/tpcds/98.sql: `i_current_price
    * 100 / sum(...) over (partition by i_class) as revenueratio` over a
    30-day date band): per-brand revenue share within its type via a
    partition-total window over the aggregate, ordered by the ratio.
    The ratio divides identical int64s on both engines — bit-equal
    doubles, deterministic ordering with brand tie-break.""")


# ---------------------------------------------------------------------------
# 31. JOB shape: redundant transitive equi-join closure + MIN aggregates
# ---------------------------------------------------------------------------

_Q_JOB_TRANSITIVE = """
SELECT MIN(o.o_orderpriority) AS min_priority,
       MIN(p.p_name) AS min_part_name,
       MIN(s.s_name) AS min_supplier,
       COUNT(*) AS n
FROM orders o, lineitem l1, lineitem l2, part p, supplier s
WHERE o.o_orderkey = l1.l_orderkey
  AND o.o_orderkey = l2.l_orderkey
  AND l1.l_orderkey = l2.l_orderkey
  AND l1.l_linenumber < l2.l_linenumber
  AND l1.l_partkey = p.p_partkey
  AND l2.l_suppkey = s.s_suppkey
  AND p.p_type = 'ECONOMY'
  AND p.p_name NOT LIKE '%green%'
  AND (p.p_name LIKE '%red%' OR p.p_name LIKE '%blue%')
  AND o.o_orderpriority = '1-URGENT'
"""

_sql_query(
    "job_transitive_equijoin_minagg", _Q_JOB_TRANSITIVE,
    ("orders", "lineitem", "part", "supplier"),
    """JOB 1a shape (reference resources/sql/job/1a.sql: `t.id =
    mc.movie_id AND t.id = mi_idx.movie_id AND mc.movie_id =
    mi_idx.movie_id` + `not like` + OR-of-LIKE + MIN aggregates):
    comma-style many-way join whose equi-predicates form a REDUNDANT
    transitive closure — the optimizer must recognize the implied
    equivalence class and join each pair once, not re-filter
    post-cartesian — over a same-table double scan (two lineitem roles
    per order, JOB's cast_info pattern).  Single-row MIN/COUNT output,
    exactly JOB's result contract."""
)


# ---------------------------------------------------------------------------
# 32. JOB shape: same dimension consumed through two aliased roles
# ---------------------------------------------------------------------------

_Q_JOB_SELFALIAS = """
WITH key_pairs AS (
  SELECT c.c_nationkey AS ck, s.s_nationkey AS sk,
         COUNT(*) AS n_pairs,
         MIN(c.c_name) AS min_customer
  FROM customer c, supplier s, orders o, lineitem l
  WHERE o.o_custkey = c.c_custkey
    AND l.l_orderkey = o.o_orderkey
    AND l.l_suppkey = s.s_suppkey
  GROUP BY c.c_nationkey, s.s_nationkey)
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(SUM(n_pairs) AS BIGINT) AS n_pairs,
       MIN(min_customer) AS min_customer
FROM key_pairs
JOIN nation n1 ON ck = n1.n_nationkey
JOIN nation n2 ON sk = n2.n_nationkey
WHERE n1.n_name LIKE 'NATION_1%'
  AND n2.n_name LIKE 'NATION_2%'
  AND n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name
ORDER BY cust_nation, supp_nation
"""

_sql_query(
    "job_selfalias_dim_reuse", _Q_JOB_SELFALIAS,
    ("customer", "nation", "supplier", "orders", "lineitem"),
    """JOB 16b shape (resources/sql/job/16b.sql: name AS n + aka_name AS
    an both keyed on person_id): one dimension table consumed under TWO
    aliased roles (nation as customer-geography and supplier-geography)
    with LIKE role filters and an inter-role inequality.

    Plan posture, probe-driven: the naive flat form (all six relations
    in one WHERE) let the join reorderer treat n1<>n2 as a join edge and
    cross (customer |><| n1) x (supplier |><| n2) in a nested loop
    BEFORE the fact chain connects them — measured 62x at the 10x probe
    (SCALE.md).  This form aggregates through the all-equi fact chain
    first (group keys = the two nation FKs, ≤625 groups at any scale),
    then decorates the tiny pair table with the doubly-aliased dim and
    applies the role filters — ratio 1.2 at 10x, and the shape the
    reference's DPhyp would also pick (dims joined last when the
    cross-filter is non-selective)."""
)


# ---------------------------------------------------------------------------
# 33. TPC-DS q49 shape: per-channel return-ratio dual-rank top-k union
# ---------------------------------------------------------------------------

_Q_RETURN_RATIO_RANK = """
WITH by_channel AS (
  SELECT o.o_orderpriority AS channel, l.l_partkey AS item,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                       THEN CAST(ROUND(l.l_quantity) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS ret_qty,
         CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
  GROUP BY o.o_orderpriority, l.l_partkey),
ranked AS (
  SELECT channel, item, ret_qty, qty,
         RANK() OVER (PARTITION BY channel
                      ORDER BY ret_qty * 1000000 / qty DESC, item) AS rr,
         RANK() OVER (PARTITION BY channel
                      ORDER BY ret_qty DESC, item) AS ra
  FROM by_channel WHERE qty > 0)
SELECT channel, item, ret_qty, qty,
       CAST(rr AS BIGINT) AS ratio_rank, CAST(ra AS BIGINT) AS amount_rank
FROM ranked
WHERE rr <= 5 OR ra <= 5
ORDER BY channel, rr, ra, item
"""

_sql_query(
    "ds_return_ratio_dual_rank", _Q_RETURN_RATIO_RANK,
    ("lineitem", "orders"),
    """TPC-DS q49 shape (reference resources/sql/tpcds/49.sql: per
    channel, items dual-ranked by currency ratio and return ratio, kept
    if either rank <= 10, channels unioned): here the three priority
    channels share one scan, each item carries RANK() by exact integer
    return-ratio (cross-multiplied to micros — no float decides a rank)
    and by amount, kept if either rank <= 5.  Two windows over one
    aggregate, disjunctive rank filter."""
)


# ---------------------------------------------------------------------------
# 34. TPC-DS q72 shape: date-offset residual join (late shipments)
# ---------------------------------------------------------------------------

_Q_DATE_OFFSET_JOIN = """
SELECT o.o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate
                          + INTERVAL '60' DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS late_ships,
       MIN(c.c_mktsegment) AS min_segment
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""

_sql_query(
    "ds_date_offset_lateness", _Q_DATE_OFFSET_JOIN,
    ("lineitem", "orders", "customer"),
    """TPC-DS q72 shape (resources/sql/tpcds/72.sql `d3.d_date >
    d1.d_date + 5` — a date-arithmetic condition between columns of
    two joined tables): equi-join with an INTERVAL-offset comparison
    computed per row (the lateness band), aggregated per priority.
    The interval add is the year-month/day-time arithmetic of
    functions/__init__ at the SQL surface; identical text on DuckDB."""
)
