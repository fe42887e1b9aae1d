"""Relational-operator coverage queries — one oracle-checked query per
RelAlg operator family beyond the TPC-H spine (reference
include/lingodb/compiler/Dialect/RelAlg/IR/RelAlgOps.td):

- relalg.window / relalg.rank (RelAlgOps.td:254-266, 479-485): frames,
  default frame, desc order, whole-partition frame
  (frame semantics: sql_analyzer.cpp:2424-2492, defaults :2426-2435).
- relalg.union/intersect/except with ALL/DISTINCT set semantics
  (RelAlgOps.td:409-444; fixture model test/sqlite-small/setops.test).
- relalg.projection distinct (RelAlgOps.td:394-407) and DISTINCT
  aggregates (split-subaggregation lowering RelAlgToSubOp.cpp:2561-2676).
- aggrfn min/max/stddev_samp/var_samp (RelAlgOps.td:71-85).
- rollup + GROUPING() (sql_mlir_translator.cpp:1705-1760,
  sql_analyzer.cpp:2858-2871).
- fullouterjoin, singlejoin (scalar subquery), markjoin (NOT IN),
  collectionjoin (collect_list), null-safe equality join
  (RelAlgOps.td:335-391; db.compare isa DBOps.td:466).
- const_relation / VALUES (RelAlgOps.td:108-118), CTEs, LIMIT+OFFSET.

Every query is deterministic (unique-key tie-breaks; exact-decimal sums)
so the cross-engine value hash is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lingo_db_spark.catalog import load_table, register_views
from lingo_db_spark.functions import DEC, SQL_DSTDDEV, SQL_DVAR, dstddev_samp, dsum, dvar_samp
from lingo_db_spark.queries import register


def _dec_sum_over(col, w) -> F.Column:
    """Exact-decimal SUM over a window, surfaced as a rounded double (same
    doctrine as functions.dsum, applied to window frames)."""
    return F.round(F.sum(F.col(col).cast(DEC)).over(w).cast("double"), 4)


_SQL_WSUM = ("ROUND(CAST(SUM(CAST({c} AS DECIMAL(38,10))) OVER ({w}) "
             "AS DOUBLE), 4)")


# ---------------------------------------------------------------------------
# Window functions (relalg.window / relalg.rank)
# ---------------------------------------------------------------------------

@register("window_rank", """
SELECT o_orderkey, o_orderpriority, rnk
FROM (
  SELECT o_orderkey, o_orderpriority,
         RANK() OVER (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders)
WHERE rnk <= 3
ORDER BY o_orderpriority, rnk, o_orderkey
""")
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per priority class via RANK — relalg.rank
    (RelAlgOps.td:479-485).  Partitioned window: each partition sorts
    independently after a hash shuffle on the partition key; no global
    sort, so the shape scales with partition count."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (orders
            .withColumn("rnk", F.rank().over(w).cast("long"))
            .filter(F.col("rnk") <= 3)
            .select("o_orderkey", "o_orderpriority", "rnk")
            .orderBy("o_orderpriority", "rnk", "o_orderkey"))


@register("window_row_number", """
SELECT o_custkey, o_orderkey, rn
FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders)
WHERE rn <= 2
ORDER BY o_custkey, rn
""")
def window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First two orders per customer via ROW_NUMBER with a unique-key
    tie-break (deterministic across engines)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (orders
            .withColumn("rn", F.row_number().over(w).cast("long"))
            .filter(F.col("rn") <= 2)
            .select("o_custkey", "o_orderkey", "rn")
            .orderBy("o_custkey", "rn"))


@register("window_sum_frame", f"""
SELECT o_custkey, o_orderkey,
       {_SQL_WSUM.format(c='o_totalprice',
                         w='PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey '
                           'ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW')} AS running_total
FROM orders
WHERE o_custkey < 300
ORDER BY o_custkey, o_orderkey
""")
def window_sum_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer with an explicit ROWS frame —
    relalg.window with rows_between (RelAlgOps.td:257); the reference
    executes arbitrary frames via a segment tree
    (RelAlgToSubOp.cpp:2406-2470), Spark's WindowExec is the analogue."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (orders
            .select("o_custkey", "o_orderkey",
                    _dec_sum_over("o_totalprice", w).alias("running_total"))
            .orderBy("o_custkey", "o_orderkey"))


@register("window_default_frame", f"""
SELECT o_custkey, o_orderkey,
       {_SQL_WSUM.format(c='o_totalprice',
                         w='PARTITION BY o_custkey ORDER BY o_orderdate')} AS peer_running
FROM orders
WHERE o_custkey < 300
ORDER BY o_custkey, o_orderkey
""")
def window_default_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY without an explicit frame = RANGE unbounded-to-current —
    *peers share the frame total* (reference default-frame rule,
    sql_analyzer.cpp:2426-2435).  Ordering on the non-unique o_orderdate
    makes the peer semantics observable: same-date orders get the same
    running value in both engines."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    return (orders
            .select("o_custkey", "o_orderkey",
                    _dec_sum_over("o_totalprice", w).alias("peer_running"))
            .orderBy("o_custkey", "o_orderkey"))


@register("window_frame_bounded", f"""
SELECT o_custkey, o_orderkey,
       {_SQL_WSUM.format(c='o_totalprice',
                         w='PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC '
                           'ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING')} AS neighborhood
FROM orders
WHERE o_custkey < 300
ORDER BY o_custkey, o_orderkey
""")
def window_frame_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding frame over a DESC ordering (frame edge cases from
    SURVEY §7 hard-parts #4: first/last rows see truncated frames)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
         .rowsBetween(-1, 1))
    return (orders
            .select("o_custkey", "o_orderkey",
                    _dec_sum_over("o_totalprice", w).alias("neighborhood"))
            .orderBy("o_custkey", "o_orderkey"))


@register("window_whole_partition", f"""
SELECT o_custkey, o_orderkey,
       {_SQL_WSUM.format(c='o_totalprice', w='PARTITION BY o_custkey')} AS cust_total,
       COUNT(*) OVER (PARTITION BY o_custkey) AS cust_orders
FROM orders
WHERE o_custkey < 300
ORDER BY o_custkey, o_orderkey
""")
def window_whole_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION BY without ORDER BY = whole-partition frame (the other
    reference default, sql_analyzer.cpp:2426-2435): every row carries its
    partition's total."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = Window.partitionBy("o_custkey")
    return (orders
            .select("o_custkey", "o_orderkey",
                    _dec_sum_over("o_totalprice", w).alias("cust_total"),
                    F.count(F.lit(1)).over(w).alias("cust_orders"))
            .orderBy("o_custkey", "o_orderkey"))


# ---------------------------------------------------------------------------
# Set operations (relalg.union/intersect/except, ALL vs DISTINCT)
# ---------------------------------------------------------------------------

_URGENT = "o_orderpriority IN ('1-URGENT', '2-HIGH')"


@register("setop_union_all", f"""
SELECT k, COUNT(*) AS cnt FROM (
  SELECT o_custkey AS k FROM orders WHERE {_URGENT}
  UNION ALL
  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0
) GROUP BY k ORDER BY k
""")
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL preserves duplicates (relalg.union all,
    RelAlgOps.td:409-436) — re-aggregated so the duplicate counts are what
    the hash verifies."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    a = (orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
         .select(F.col("o_custkey").alias("k")))
    b = (cust.filter(F.col("c_acctbal") > 5000.0)
         .select(F.col("c_custkey").alias("k")))
    return (a.unionAll(b).groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy("k"))


@register("setop_union_distinct", f"""
SELECT k FROM (
  SELECT o_custkey AS k FROM orders WHERE {_URGENT}
  UNION
  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0
) ORDER BY k
""")
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT collapses duplicates across both inputs."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    a = (orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
         .select(F.col("o_custkey").alias("k")))
    b = (cust.filter(F.col("c_acctbal") > 5000.0)
         .select(F.col("c_custkey").alias("k")))
    return a.union(b).distinct().orderBy("k")


@register("setop_intersect_all", f"""
SELECT k, COUNT(*) AS cnt FROM (
  SELECT o_custkey AS k FROM orders WHERE {_URGENT}
  INTERSECT ALL
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000.0
) GROUP BY k ORDER BY k
""")
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL multiset semantics: each key appears
    min(count_left, count_right) times (relalg.intersect all,
    RelAlgOps.td:438-440) — the corner users get wrong vs INTERSECT."""
    orders = load_table(spark, sf_dir, "orders")
    a = (orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
         .select(F.col("o_custkey").alias("k")))
    b = (orders.filter(F.col("o_totalprice") > 400000.0)
         .select(F.col("o_custkey").alias("k")))
    return (a.intersectAll(b).groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy("k"))


@register("setop_except_all", f"""
SELECT k, COUNT(*) AS cnt FROM (
  SELECT o_custkey AS k FROM orders WHERE {_URGENT}
  EXCEPT ALL
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000.0
) GROUP BY k ORDER BY k
""")
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL multiset semantics: max(count_left - count_right, 0)
    occurrences survive (relalg.except all, RelAlgOps.td:442-444)."""
    orders = load_table(spark, sf_dir, "orders")
    a = (orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
         .select(F.col("o_custkey").alias("k")))
    b = (orders.filter(F.col("o_totalprice") > 400000.0)
         .select(F.col("o_custkey").alias("k")))
    return (a.exceptAll(b).groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy("k"))


@register("setop_except_distinct", f"""
SELECT k FROM (
  SELECT o_custkey AS k FROM orders WHERE {_URGENT}
  EXCEPT
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000.0
) ORDER BY k
""")
def setop_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT: set difference over distinct keys."""
    orders = load_table(spark, sf_dir, "orders")
    a = (orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
         .select(F.col("o_custkey").alias("k")))
    b = (orders.filter(F.col("o_totalprice") > 400000.0)
         .select(F.col("o_custkey").alias("k")))
    return a.subtract(b).orderBy("k")


# ---------------------------------------------------------------------------
# DISTINCT projection + DISTINCT aggregates
# ---------------------------------------------------------------------------

@register("projection_distinct", """
SELECT DISTINCT c_nationkey, c_mktsegment
FROM customer
ORDER BY c_nationkey, c_mktsegment
""")
def projection_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """relalg.projection with distinct set semantics
    (RelAlgOps.td:394-407)."""
    cust = load_table(spark, sf_dir, "customer")
    return (cust.select("c_nationkey", "c_mktsegment").distinct()
            .orderBy("c_nationkey", "c_mktsegment"))


@register("agg_distinct_multi", """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_custs,
       COUNT(DISTINCT o_orderpriority) AS n_prios,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""")
def agg_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates over different columns in one
    aggregation — the reference lowers this by splitting per-distinct-set
    subaggregations and rejoining by group key
    (RelAlgToSubOp.cpp:2561-2676); Spark plans the same shape via Expand."""
    orders = load_table(spark, sf_dir, "orders")
    return (orders.groupBy("o_orderstatus")
            .agg(F.countDistinct("o_custkey").alias("n_custs"),
                 F.countDistinct("o_orderpriority").alias("n_prios"),
                 F.count(F.lit(1)).alias("n_orders"))
            .orderBy("o_orderstatus"))


@register("agg_minmax", """
SELECT l_returnflag,
       MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
       MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship,
       MAX(l_extendedprice) AS max_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""")
def agg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggrfn min/max over numeric and temporal columns
    (RelAlgOps.td:71-85) — order-insensitive, so no decimal detour."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.min("l_quantity").alias("min_qty"),
                 F.max("l_quantity").alias("max_qty"),
                 F.min("l_shipdate").alias("first_ship"),
                 F.max("l_shipdate").alias("last_ship"),
                 F.max("l_extendedprice").alias("max_price"))
            .orderBy("l_returnflag"))


@register("agg_stats_var", f"""
SELECT l_returnflag,
       {SQL_DVAR('l_quantity')} AS var_qty,
       {SQL_DSTDDEV('l_quantity')} AS std_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""")
def agg_stats_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """var_samp / stddev_samp via the exact-sum decomposition the
    reference's SimplifyAggregations pass applies
    (SimplifyAggregations.cpp:109-146): sum(x), sum(x^2), n."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(dvar_samp("l_quantity").alias("var_qty"),
                 dstddev_samp("l_quantity").alias("std_qty"))
            .orderBy("l_returnflag"))


@register("rollup_grouping", f"""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
       {{dsum}} AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
""".format(dsum="ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE), 4)"))
def rollup_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() markers — the reference translates rollup to
    N+1 unioned aggregations (sql_mlir_translator.cpp:1705-1760) and binds
    GROUPING() (sql_analyzer.cpp:2858-2871); Spark's Expand-based rollup
    is one pass.  GROUPING() columns disambiguate real NULL keys from
    subtotal rows.  Cast to int to match DuckDB's return type."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(dsum("l_quantity").alias("sum_qty"),
                 F.count(F.lit(1)).alias("n"),
                 F.grouping("l_returnflag").cast("long").alias("g_flag"),
                 F.grouping("l_linestatus").cast("long").alias("g_status"))
            .select("l_returnflag", "l_linestatus", "g_flag", "g_status",
                    "sum_qty", "n")
            .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus"))


# ---------------------------------------------------------------------------
# Join corners
# ---------------------------------------------------------------------------

@register("join_fullouter", """
SELECT COALESCE(a.k, b.k) AS custkey,
       COALESCE(a.n_early, 0) AS n_early, COALESCE(b.n_late, 0) AS n_late
FROM (SELECT o_custkey AS k, COUNT(*) AS n_early FROM orders
      WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00' GROUP BY o_custkey) a
FULL OUTER JOIN
     (SELECT o_custkey AS k, COUNT(*) AS n_late FROM orders
      WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00' GROUP BY o_custkey) b
ON a.k = b.k
ORDER BY custkey
""")
def join_fullouter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """relalg.fullouterjoin (RelAlgOps.td:335-348): null-extension on both
    sides, COALESCE folding the two key columns."""
    orders = load_table(spark, sf_dir, "orders")
    early = (orders.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
             .groupBy(F.col("o_custkey").alias("k"))
             .agg(F.count(F.lit(1)).alias("n_early")))
    late = (orders.filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz"))
            .groupBy(F.col("o_custkey").alias("k2"))
            .agg(F.count(F.lit(1)).alias("n_late")))
    return (early.join(late, early.k == late.k2, "full")
            .select(F.coalesce(early.k, late.k2).alias("custkey"),
                    F.coalesce("n_early", F.lit(0)).alias("n_early"),
                    F.coalesce("n_late", F.lit(0)).alias("n_late"))
            .orderBy("custkey"))


@register("join_theta", """
SELECT r_name, n_name
FROM region JOIN nation ON n_regionkey > r_regionkey
ORDER BY r_name, n_name
""")
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta (non-equi) join — relalg.join with an arbitrary
    predicate region (RelAlgOps.td:280-295).  No equi conjunct exists, so
    this degenerates to broadcast nested-loop: acceptable only because
    both sides are fixed-size dims (the reference makes the same
    hash-impossible fallback, OptimizeImplementations.cpp:144-175)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (region.join(nation, nation.n_regionkey > region.r_regionkey)
            .select("r_name", "n_name").orderBy("r_name", "n_name"))


@register("join_nullsafe", """
SELECT a.n_nationkey AS key_a, b.n_nationkey AS key_b
FROM (SELECT n_nationkey, NULLIF(n_regionkey, 0) AS rk FROM nation) a
JOIN (SELECT n_nationkey, NULLIF(n_regionkey, 0) AS rk FROM nation) b
  ON a.rk IS NOT DISTINCT FROM b.rk
ORDER BY key_a, key_b
""")
def join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=>) — reference db.compare `isa`
    predicate (DBOps.td:466): NULL keys match each other, unlike plain
    `=`.  NULLIF manufactures NULL keys from region 0."""
    nation = load_table(spark, sf_dir, "nation")
    a = nation.select(F.col("n_nationkey").alias("key_a"),
                      F.nullif(F.col("n_regionkey"), F.lit(0)).alias("rk_a"))
    b = nation.select(F.col("n_nationkey").alias("key_b"),
                      F.nullif(F.col("n_regionkey"), F.lit(0)).alias("rk_b"))
    return (a.join(b, a.rk_a.eqNullSafe(b.rk_b))
            .select("key_a", "key_b").orderBy("key_a", "key_b"))


@register("join_single_scalar", """
SELECT n_name,
       (SELECT MAX(s_acctbal) FROM supplier WHERE s_nationkey = n_nationkey)
         AS top_balance
FROM nation
ORDER BY n_name
""")
def join_single_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — relalg.singlejoin
    (RelAlgOps.td:350-364): at most one value per outer row, NULL-extended
    when the subquery is empty.  Expressed in SQL so Catalyst performs the
    single-join rewrite itself."""
    register_views(spark, sf_dir, ("nation", "supplier"))
    return spark.sql("""
        SELECT n_name,
               (SELECT MAX(s_acctbal) FROM supplier
                WHERE s_nationkey = n_nationkey) AS top_balance
        FROM nation ORDER BY n_name""")


@register("join_mark_notin", """
SELECT c_custkey FROM customer
WHERE c_nationkey NOT IN
      (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
ORDER BY c_custkey
""")
def join_mark_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (subquery) — relalg.markjoin territory
    (RelAlgOps.td:380-391): Catalyst plans a null-aware anti join, the
    three-valued-logic-correct form (the NULL-in-subquery corner is pinned
    by tests/test_semantics.py).  Expressed in SQL to exercise that
    rewrite rather than a hand-built left_anti."""
    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql("""
        SELECT c_custkey FROM customer
        WHERE c_nationkey NOT IN
              (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
        ORDER BY c_custkey""")


@register("collectionjoin_list", """
SELECT n_name,
       ARRAY_TO_STRING(LIST_SORT(LIST(s_name)), ',') AS suppliers
FROM nation JOIN supplier ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""")
def collectionjoin_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """relalg.collectionjoin / relalg.getlist (RelAlgOps.td:366-378,
    515-521): nest matching rows into a list column.  Sorted and joined to
    a string so the cross-engine hash is order-independent."""
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    return (nation.join(supp, supp.s_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.array_join(F.sort_array(F.collect_list("s_name")), ",")
                 .alias("suppliers"))
            .orderBy("n_name"))


# ---------------------------------------------------------------------------
# VALUES / CTE / LIMIT+OFFSET
# ---------------------------------------------------------------------------

@register("const_relation_values", """
SELECT v.region_label, COUNT(*) AS n_nations
FROM (VALUES (0, 'zone-a'), (1, 'zone-b'), (2, 'zone-c'))
       AS v(rkey, region_label)
JOIN nation ON n_regionkey = v.rkey
GROUP BY v.region_label
ORDER BY v.region_label
""")
def const_relation_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES relation — relalg.const_relation
    (RelAlgOps.td:108-118) — joined against a base table."""
    nation = load_table(spark, sf_dir, "nation")
    values = spark.createDataFrame(
        [(0, "zone-a"), (1, "zone-b"), (2, "zone-c")],
        "rkey INT, region_label STRING")
    return (nation.join(F.broadcast(values),
                        nation.n_regionkey == values.rkey)
            .groupBy("region_label")
            .agg(F.count(F.lit(1)).alias("n_nations"))
            .orderBy("region_label"))


@register("cte_top_nations", """
WITH nation_rev AS (
  SELECT n_name,
         ROUND(CAST(SUM(CAST(s_acctbal AS DECIMAL(38,10))) AS DOUBLE), 4)
           AS total_bal,
         COUNT(*) AS n_supp
  FROM nation JOIN supplier ON s_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, total_bal, n_supp FROM nation_rev
WHERE n_supp >= 2
ORDER BY total_bal DESC, n_name
""")
def cte_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-recursive CTE through spark.sql — the reference's WITH clause
    (parser.y with_clause; no recursion, matching the reference's
    non-recursive-only support)."""
    register_views(spark, sf_dir, ("nation", "supplier"))
    return spark.sql("""
        WITH nation_rev AS (
          SELECT n_name,
                 ROUND(CAST(SUM(CAST(s_acctbal AS DECIMAL(38,10))) AS DOUBLE), 4)
                   AS total_bal,
                 COUNT(*) AS n_supp
          FROM nation JOIN supplier ON s_nationkey = n_nationkey
          GROUP BY n_name)
        SELECT n_name, total_bal, n_supp FROM nation_rev
        WHERE n_supp >= 2
        ORDER BY total_bal DESC, n_name""")


@register("limit_offset", """
SELECT o_orderkey, o_custkey FROM orders
ORDER BY o_orderkey
LIMIT 10 OFFSET 5
""")
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT + OFFSET (reference select_limit grammar,
    parser.y) — deterministic because the sort key is unique."""
    orders = load_table(spark, sf_dir, "orders")
    return (orders.select("o_orderkey", "o_custkey")
            .orderBy("o_orderkey").offset(5).limit(10))


# ---------------------------------------------------------------------------
# GroupJoin / shared materialization / any_value
# ---------------------------------------------------------------------------

@register("groupjoin_fused", """
SELECT n_name,
       COALESCE(n_supp, 0) AS n_supp,
       ROUND(COALESCE(total_bal, 0.0), 4) AS total_bal
FROM nation LEFT JOIN (
  SELECT s_nationkey, COUNT(*) AS n_supp,
         CAST(SUM(CAST(s_acctbal AS DECIMAL(38,10))) AS DOUBLE) AS total_bal
  FROM supplier GROUP BY s_nationkey) g
ON n_nationkey = g.s_nationkey
ORDER BY n_name
""")
def groupjoin_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """relalg.groupjoin (RelAlgOps.td:240-253) in its outer form: nation
    keys are duplicate-free, supplier aggregates BEFORE the join (eager
    aggregation, OptimizeImplementations.cpp:671-850) — the raw supplier
    table is never shuffled, only one row per nation."""
    from lingo_db_spark.operators.groupjoin import group_join
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    gj = group_join(
        nation, supp, "n_nationkey", "s_nationkey",
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("s_acctbal").cast(DEC)).cast("double").alias("bal"),
        behavior="outer")
    return (gj.select(
        "n_name",
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        F.round(F.coalesce("bal", F.lit(0.0)), 4).alias("total_bal"))
        .orderBy("n_name"))


@register("tmp_shared_subtree", """
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey)
SELECT 'high' AS bucket, COUNT(*) AS n_custs, MAX(n_orders) AS extreme
FROM per_cust WHERE n_orders > 12
UNION ALL
SELECT 'low' AS bucket, COUNT(*) AS n_custs, MIN(n_orders) AS extreme
FROM per_cust WHERE n_orders <= 12
ORDER BY bucket
""")
def tmp_shared_subtree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """relalg.tmp — shared materialization of a multi-consumer subtree
    (RelAlgOps.td:499-505; IntroduceTmp.cpp): the per-customer aggregate
    is computed once (.cache()) and consumed by two branches of a union.
    Catalyst has no general common-subtree elimination (SURVEY §4.1 row
    17), so the engine introduces the tmp explicitly."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (orders.groupBy("o_custkey")
                .agg(F.count(F.lit(1)).alias("n_orders"))).cache()
    high = (per_cust.filter(F.col("n_orders") > 12)
            .agg(F.count(F.lit(1)).alias("n_custs"),
                 F.max("n_orders").alias("extreme"))
            .select(F.lit("high").alias("bucket"), "n_custs", "extreme"))
    low = (per_cust.filter(F.col("n_orders") <= 12)
           .agg(F.count(F.lit(1)).alias("n_custs"),
                F.min("n_orders").alias("extreme"))
           .select(F.lit("low").alias("bucket"), "n_custs", "extreme"))
    return high.unionAll(low).orderBy("bucket")


@register("subquery_all", """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_acctbal > ALL (SELECT s_acctbal FROM supplier WHERE s_nationkey = 0)
ORDER BY s_suppkey
""")
def subquery_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified ALL subquery (reference sql_mlir_translator.cpp:540-700
    translates ALL via aggregated subquery + getscalar).  Spark SQL has no
    `> ALL` form, so the engine applies the same rewrite the reference
    does: `x > ALL (S)` == `count(S) = 0 OR x > MAX(S)` for null-free S
    (s_acctbal is NOT NULL) — the empty-set branch is the vacuous-truth
    corner a bare MAX rewrite gets wrong (MAX of empty is NULL, which
    would silently drop every row).  The 1-row aggregate broadcasts into
    the filter."""
    supp = load_table(spark, sf_dir, "supplier")
    bound = (supp.filter(F.col("s_nationkey") == 0)
             .agg(F.max("s_acctbal").alias("__bound"),
                  F.count(F.lit(1)).alias("__cnt")))
    return (supp.crossJoin(F.broadcast(bound))
            .filter((F.col("__cnt") == 0)
                    | (F.col("s_acctbal") > F.col("__bound")))
            .select("s_suppkey", "s_name", "s_acctbal")
            .orderBy("s_suppkey"))


@register("grouping_sets", f"""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_prio,
       COUNT(*) AS n,
       {{dsum}} AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
""".format(dsum="ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE), 4)"))
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind the reference's
    rollup translation, sql_mlir_translator.cpp:1705-1760 — the reference
    parses cube/grouping-sets but ships only rollup; Spark supports the
    general form, so the engine exposes it).  One Expand-based pass, not
    N+1 unioned scans."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
               COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10)))
                          AS DOUBLE), 4) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
    """)


@register("renaming_columns", """
SELECT n_nationkey AS nation_id, n_name AS nation, r_name AS region
FROM nation JOIN region ON n_regionkey = r_regionkey
ORDER BY nation_id
""")
def renaming_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedicated relalg.renaming query (RelAlgOps.td:207-221): bulk column
    renames via withColumnsRenamed (not per-expression aliases) flowing
    through a join — renames must not break the join resolution."""
    nation = load_table(spark, sf_dir, "nation").withColumnsRenamed(
        {"n_nationkey": "nation_id", "n_name": "nation"})
    region = load_table(spark, sf_dir, "region").withColumnsRenamed(
        {"r_name": "region"})
    return (nation.join(F.broadcast(region),
                        nation.n_regionkey == region.r_regionkey)
            .select("nation_id", "nation", "region")
            .orderBy("nation_id"))


@register("agg_any_value", """
SELECT n_nationkey,
       ANY_VALUE(n_name) AS nation_name,
       COUNT(*) AS n_custs
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_nationkey
ORDER BY n_nationkey
""")
def agg_any_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggrfn `any` (RelAlgOps.td:71-85) — the reference uses it to carry
    functionally-dependent columns through a group-by (ReduceGroupByKeys);
    deterministic here because n_name is 1:1 with the group key."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (cust.join(F.broadcast(nation),
                      cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_nationkey")
            .agg(F.any_value("n_name").alias("nation_name"),
                 F.count(F.lit(1)).alias("n_custs"))
            .orderBy("n_nationkey"))


@register("window_ntile_lag_lead", """
SELECT o_custkey, o_orderkey,
       NTILE(4) OVER w AS quartile,
       LAG(o_orderkey)  OVER w AS prev_order,
       LEAD(o_orderkey) OVER w AS next_order,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND UNBOUNDED FOLLOWING)
         AS last_order
FROM orders
WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""")
def window_ntile_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation/distribution window functions — NTILE, LAG, LEAD,
    FIRST_VALUE (default frame) and LAST_VALUE (whole-partition frame,
    because the default frame's LAST_VALUE is just the current row).
    Unique-key ordering keeps every engine's answer identical."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (orders
            .select("o_custkey", "o_orderkey",
                    F.ntile(4).over(w).cast("long").alias("quartile"),
                    F.lag("o_orderkey").over(w).alias("prev_order"),
                    F.lead("o_orderkey").over(w).alias("next_order"),
                    F.first("o_orderkey").over(w).alias("first_order"),
                    F.last("o_orderkey").over(wfull).alias("last_order"))
            .orderBy("o_custkey", "o_orderkey"))


@register("window_range_frame", """
SELECT o_orderkey, o_custkey, price_c,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_near,
       CAST(SUM(price_c) OVER w AS BIGINT) AS sum_near,
       CAST(SUM(price_c) OVER w2 AS BIGINT) AS sum_below
FROM (SELECT o_orderkey, o_custkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders WHERE o_custkey < 300)
WINDOW w  AS (PARTITION BY o_custkey ORDER BY price_c
              RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING),
       w2 AS (PARTITION BY o_custkey ORDER BY price_c
              RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey
""")
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames with CONSTANT VALUE offsets (reference analyzer
    sql_analyzer.cpp:2424-2492: ROWS/RANGE with `<const> PRECEDING |
    FOLLOWING`; segment-tree frame evaluation RelAlgToSubOp.cpp:
    2406-2470): peers are selected by ORDER-BY-value distance, not row
    position — orders within $50 / $100 of each order's price in the
    same customer's history.  Money is held in exact integer cents so
    the frame boundary comparisons are identical across engines;
    RANGE frames are peer-inclusive, so the result is deterministic
    even with tied prices."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    priced = orders.select(
        "o_orderkey", "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_c"))
    w = (Window.partitionBy("o_custkey").orderBy("price_c")
         .rangeBetween(-5000, 5000))
    w2 = (Window.partitionBy("o_custkey").orderBy("price_c")
          .rangeBetween(-10000, Window.currentRow))
    return (priced
            .select("o_orderkey", "o_custkey", "price_c",
                    F.count(F.lit(1)).over(w).cast("long").alias("n_near"),
                    F.sum("price_c").over(w).cast("long").alias("sum_near"),
                    F.sum("price_c").over(w2).cast("long").alias("sum_below"))
            .orderBy("o_orderkey"))


@register("generate_unnest", """
SELECT o_orderkey, part_idx, part_val
FROM (
  SELECT o_orderkey,
         generate_subscripts(string_split(o_orderpriority, '-'), 1) AS part_idx,
         unnest(string_split(o_orderpriority, '-')) AS part_val
  FROM orders
  WHERE o_orderkey < 200)
ORDER BY o_orderkey, part_idx
""")
def generate_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tuple generation from a nested value — the reference's
    subop.generate surface (SubOperatorOps.td:566-581: generate tuples
    from an imperative region, used for VALUES and unnest) and the
    runtime list type (DBOps.td:141-159, StringSplit returns
    list<string>, RuntimeFunctions.cpp:279).  Spark: posexplode of the
    split array; index is 1-based to match SQL generate_subscripts."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return (orders
            .select("o_orderkey",
                    F.posexplode(F.split("o_orderpriority", "-"))
                    .alias("part_idx0", "part_val"))
            .select("o_orderkey",
                    (F.col("part_idx0") + 1).cast("long").alias("part_idx"),
                    "part_val")
            .orderBy("o_orderkey", "part_idx"))


@register("setop_intersect_distinct", """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY o_custkey
""")
def setop_intersect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT with DISTINCT semantics (reference relalg.intersect
    set_semantic=distinct, RelAlgOps.td:438-440) — customers having both
    open and finished orders, each exactly once."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.intersect(f).orderBy("o_custkey")


@register("cube_grouping", """
SELECT COALESCE(l_returnflag, '<all>') AS l_returnflag,
       COALESCE(l_linestatus, '<all>') AS l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(l_quantity * 1000000.0) AS BIGINT)) AS BIGINT)
         AS qty_m
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
""")
def cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 2^n grouping sets in one Expand pass.  The reference
    PARSES cube but leaves it disabled (SURVEY.md §2.2: only ROLLUP is
    translated, sql_mlir_translator.cpp:1705-1760), so this is engine
    surface beyond reference parity, expressed with the same GROUPING()
    machinery the rollup/grouping-sets queries pin."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_m = F.round(F.col("l_quantity") * 1_000_000.0, 0).cast("long")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(qty_m).alias("qty_m"),
                 F.grouping("l_returnflag").cast("long").alias("g_rf"),
                 F.grouping("l_linestatus").cast("long").alias("g_ls"))
            .select(F.coalesce("l_returnflag", F.lit("<all>"))
                    .alias("l_returnflag"),
                    F.coalesce("l_linestatus", F.lit("<all>"))
                    .alias("l_linestatus"),
                    "g_rf", "g_ls", "n", "qty_m")
            .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus"))


@register("window_rank_family", """
SELECT o_custkey, o_orderkey,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
       ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
       ROUND(CUME_DIST() OVER w, 6) AS cdist
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
ORDER BY o_custkey, o_orderkey
""")
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — DENSE_RANK / PERCENT_RANK /
    CUME_DIST (beyond the reference frontend's RANK + ROW_NUMBER,
    sql_analyzer.cpp:2494-2501).  Unique ordering key makes every
    engine's answer identical; the ratios divide identical small ints,
    so doubles agree bitwise."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return (orders.select(
        "o_custkey", "o_orderkey",
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"))
        .orderBy("o_custkey", "o_orderkey"))


@register("pivot_event_counts", """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click') AS click,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'view') AS view
FROM events
WHERE user_id < 50
GROUP BY user_id
ORDER BY user_id
""")
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — long-to-wide reshaping with an explicit value list
    (df.groupBy().pivot(col, values): giving the values keeps the plan a
    single pass and, at scale, avoids the collect-distinct pre-query an
    open pivot needs).  The oracle spells the same reshape as
    conditional aggregation — which is also exactly how Catalyst lowers
    PIVOT.  Engine surface beyond the reference (no PIVOT in its
    grammar)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    out = (ev.groupBy("user_id")
           .pivot("event_type", ["click", "purchase", "view"])
           .agg(F.count(F.lit(1))))
    # pivot emits NULL for absent combinations; count semantics want 0.
    return (out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c)
          for c in ("click", "purchase", "view")])
        .orderBy("user_id"))


@register("unpivot_quality_dims", """
SELECT doc_id, metric, ROUND(val, 6) AS val
FROM (
  SELECT doc_id,
         CAST(n_chars AS DOUBLE) AS chars,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE)
           AS words
  FROM documents WHERE doc_id < 200)
UNPIVOT (val FOR metric IN (chars, words))
ORDER BY doc_id, metric
""")
def unpivot_quality_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — wide-to-long reshaping (df.unpivot, Spark's melt):
    one metric row per (doc, dimension).  Dialect-common UNPIVOT syntax
    in the oracle; narrow JVM expand, no shuffle."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    wide = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("chars"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "),
                                               F.lit(""))) + 1)
        .cast("double").alias("words"))
    return (wide.unpivot("doc_id", ["chars", "words"], "metric", "val")
            .select("doc_id", "metric", F.round("val", 6).alias("val"))
            .orderBy("doc_id", "metric"))
