"""Decorrelation-class query shapes, tranche 2 (TPC-DS / JOB style) —
the gated-suite patterns round 4's 35 shapes had not yet covered
(reference resources/sql/tpcds/95.sql, 4.sql/11.sql, 17.sql/25.sql and
resources/sql/job/21a/28a/29a.sql; CI
.github/workflows/workflow-ubuntu-latest-x86_64.yml:168-193):

  q95  -> ds_double_exists_shared_cte  (two IN-subqueries over ONE
          shared self-join CTE, the second reached through another table)
  q4/11-> ds_year_total_ratio          (UNION ALL year_total CTE
          consumed four ways; cross-channel year-over-year ratio compare)
  q17/25-> ds_quantity_chain_stats     (sale -> return -> re-purchase
          chain through three aliased scans of the same date carrier,
          with exact count/avg/variance stats per group)
  29a  -> job_ten_way_min_chain        (9-relation all-equi chain with
          4 aliased dim scans and MIN aggregates, no GROUP BY)
  21a/28a-> job_mixed_predicate_chain  (NOT LIKE / IS NULL / IN-list /
          OR-of-LIKE / <> predicate mix over a 6-relation chain)
  q51  -> ds_fullouter_cumulative_compare (FULL OUTER join of two
          cumulative-window series, MAX-gap-fill, band filter)
  q78  -> ds_returns_excluded_ratio    (returns excluded via
          null-filtered LEFT JOIN -> anti join, cross-channel join)
  q14  -> ds_intersect_in_membership   (INTERSECT CTE consumed as an
          IN-membership + scalar above-average gate)
  q54  -> ds_scalar_range_bounds       (date band bounded by scalar
          subqueries, not literals)
  q44  -> ds_rank_position_join        (opposite-order rankings joined
          on rank position, dim decorated twice)

Raw SQL through spark.sql with the IDENTICAL string as the DuckDB oracle
(the reference's interface is SQL text, SURVEY.md §3.1).  Money runs in
exact int64 micro-units; variance is (n*Sxx - Sx^2) over exact integer
sums with DECIMAL(19,0) widening (the r5 bb.py lesson: int64 band
products wrap in Spark / raise in DuckDB past ~1e18), so no float or
overflow decides a row differently across engines.

100 TB posture: every join is equi (plan-asserted no-cartesian in
tests/test_dsq2.py); the q95 self-join CTE is DISTINCT-reduced before
reuse (bounded ~7 lineitems/order fan-out); the q17 chain joins through
(custkey, partkey) pairs — 10x probed via tools/scale_probe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lingo_db_spark.catalog import register_views
from lingo_db_spark.queries import register
from lingo_db_spark.queries.dsq import _micros, _sql_query


def _persist_once(df: DataFrame) -> DataFrame:
    """Idempotent persist: repeated executions in a long-lived session
    must reuse the CacheManager's existing entry, not stack
    'already cached' re-persists (storageLevel consults the cache by
    canonicalized plan, so a re-built identical DataFrame sees it)."""
    sl = df.storageLevel
    if not (sl.useMemory or sl.useDisk):
        df.persist()
    return df


# ---------------------------------------------------------------------------
# 1. TPC-DS q95: double IN over one shared self-join CTE
# ---------------------------------------------------------------------------

_MULTI_SUPP = """
  SELECT DISTINCT l1.l_orderkey AS okey
  FROM lineitem l1, lineitem l2
  WHERE l1.l_orderkey = l2.l_orderkey
    AND l1.l_suppkey <> l2.l_suppkey
"""

_Q95_MAIN = f"""
SELECT COUNT(DISTINCT o.o_orderkey) AS order_count,
       CAST(SUM(CAST({_micros('l.l_extendedprice * (1 - l.l_discount)')}
                AS DECIMAL(19,0))) AS BIGINT) AS total_revenue_micros,
       CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE CAST(o.o_orderdate AS DATE)
        BETWEEN DATE '1995-02-01' AND DATE '1995-06-01'
  AND o.o_orderkey IN (SELECT okey FROM {{ms}})
  AND o.o_orderkey IN (SELECT r.l_orderkey
                       FROM lineitem r, {{ms}}
                       WHERE r.l_orderkey = {{ms}}.okey
                         AND r.l_returnflag = 'R')
"""

_Q95 = (f"WITH multi_supp AS ({_MULTI_SUPP})"
        + _Q95_MAIN.format(ms="multi_supp"))


@register("ds_double_exists_shared_cte", _Q95)
def ds_double_exists_shared_cte(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """TPC-DS q95 shape (resources/sql/tpcds/95.sql): one self-join CTE
    (orders shipped from multiple suppliers = ws_wh's multi-warehouse
    orders) consumed by TWO membership subqueries — directly, and
    re-joined through a second table (returned lineitems = web_returns).
    Both memberships plan as semi joins; no-cartesian + semi-join
    asserted in tests/test_dsq2.py.  The CTE's self-join fan-out is
    bounded by per-order line count (7) and DISTINCT-collapsed before
    reuse; since Spark's WITH does not materialize, the collapsed id
    set is PERSISTED once so the second membership reads the cache
    instead of re-running the fact self-join — the q95 scale trap
    (recomputing the pair set per consumer).  Oracle = the plain WITH
    form (DuckDB materializes multiply-referenced CTEs)."""
    register_views(spark, sf_dir, ("orders", "lineitem"))
    ms = _persist_once(spark.sql(_MULTI_SUPP))
    ms.createOrReplaceTempView("multi_supp_r5")
    return spark.sql(_Q95_MAIN.format(ms="multi_supp_r5"))


# ---------------------------------------------------------------------------
# 2. TPC-DS q4/q11: UNION ALL year_total CTE consumed four ways
# ---------------------------------------------------------------------------

_YT_CTE = f"""
  SELECT o_custkey AS cust,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         'urgent' AS channel,
         CAST(SUM(CAST({_micros('o_totalprice')} AS DECIMAL(19,0)))
              AS BIGINT) AS total
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)
  UNION ALL
  SELECT o_custkey AS cust,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         'routine' AS channel,
         CAST(SUM(CAST({_micros('o_totalprice')} AS DECIMAL(19,0)))
              AS BIGINT) AS total
  FROM orders
  WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
  GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)
"""

_YT_MAIN = """
SELECT u2.cust AS c_custkey,
       ROUND(CAST(u2.total AS DOUBLE) / 1000000.0, 4) AS urgent_y2,
       ROUND(CAST(r2.total AS DOUBLE) / 1000000.0, 4) AS routine_y2
FROM {yt} u1
JOIN {yt} u2 ON u2.cust = u1.cust
JOIN {yt} r1 ON r1.cust = u1.cust
JOIN {yt} r2 ON r2.cust = u1.cust
WHERE u1.channel = 'urgent' AND u1.yr = 1995
  AND u2.channel = 'urgent' AND u2.yr = 1996
  AND r1.channel = 'routine' AND r1.yr = 1995
  AND r2.channel = 'routine' AND r2.yr = 1996
  AND u1.total > 0 AND r1.total > 0
  AND CAST(u2.total AS DECIMAL(19,0)) * CAST(r1.total AS DECIMAL(19,0))
      > CAST(r2.total AS DECIMAL(19,0)) * CAST(u1.total AS DECIMAL(19,0))
ORDER BY c_custkey
"""

_Q_YEAR_TOTAL = (f"WITH year_total AS ({_YT_CTE})"
                 + _YT_MAIN.format(yt="year_total"))


@register("ds_year_total_ratio", _Q_YEAR_TOTAL)
def ds_year_total_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q4/q11 shape (resources/sql/tpcds/4.sql, 11.sql): a
    UNION ALL year_total CTE (two channels x per-customer-year totals)
    self-joined FOUR ways — first/second year of each channel — keeping
    customers whose urgent-channel year-over-year growth exceeds the
    routine channel's.  The ratio compare u2/u1 > r2/r1 is
    cross-multiplied, with the products in DECIMAL(19,0) x DECIMAL(19,0)
    = 128-bit decimal (micros totals reach ~1e12 per customer-year, so
    the products pass 1e24 — int64 would wrap in Spark and raise in
    DuckDB), keeping the boundary decision exact on both engines.

    Spark's WITH does not materialize, and pushing the four consumers'
    filters through the CTE leaves EIGHT full scans of the fact — the
    q4/q11 scale trap.  The CTE is therefore persisted once (the
    reference's relalg.tmp materialization, IntroduceTmp.cpp) and the
    four-way self-join reads the cache: one fact scan total, asserted
    via InMemoryTableScan in tests/test_dsq2.py.  Oracle = the plain
    WITH form (DuckDB materializes CTEs referenced more than once)."""
    register_views(spark, sf_dir, ("orders",))
    yt = _persist_once(spark.sql(_YT_CTE))
    yt.createOrReplaceTempView("year_total_r5")
    return spark.sql(_YT_MAIN.format(yt="year_total_r5"))


# ---------------------------------------------------------------------------
# 3. TPC-DS q17/q25: sale -> return -> re-purchase chain with stats
# ---------------------------------------------------------------------------

_Q_CHAIN = """
WITH sale AS (
  SELECT o.o_custkey AS cust,
         CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS sq,
         COUNT(*) AS sn
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'N'
    AND CAST(o.o_orderdate AS DATE)
          BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
  GROUP BY o.o_custkey),
ret AS (
  SELECT o.o_custkey AS cust,
         CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS rq
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY o.o_custkey),
rep AS (
  SELECT o.o_custkey AS cust,
         CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS pq
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'N'
    AND CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
  GROUP BY o.o_custkey)
SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
       COUNT(*) AS n_chains,
       CAST(SUM(sale.sq) AS BIGINT) AS sale_qty,
       CAST(SUM(ret.rq) AS BIGINT) AS ret_qty,
       CAST(SUM(rep.pq) AS BIGINT) AS rep_qty,
       ROUND(CAST(SUM(sale.sq) AS DOUBLE) / SUM(sale.sn), 4) AS sale_avg,
       ROUND(CAST(CAST(COUNT(*) AS DECIMAL(19,0))
                    * CAST(SUM(CAST(sale.sq AS DECIMAL(19,0)) * sale.sq)
                           AS DECIMAL(19,0))
                  - CAST(SUM(sale.sq) AS DECIMAL(19,0))
                    * CAST(SUM(sale.sq) AS DECIMAL(19,0)) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE)
                * (CAST(COUNT(*) AS DOUBLE) - 1)), 4) AS sale_var
FROM sale
JOIN ret ON ret.cust = sale.cust
JOIN rep ON rep.cust = ret.cust
JOIN customer c ON c.c_custkey = sale.cust
GROUP BY c.c_nationkey
HAVING COUNT(*) > 1
ORDER BY nation
"""

_sql_query(
    "ds_quantity_chain_stats", _Q_CHAIN,
    ("lineitem", "orders", "customer"),
    """TPC-DS q17/q25 shape (resources/sql/tpcds/17.sql, 25.sql): the
    sold -> returned -> re-purchased chain — three date-banded slices of
    the same fact joined per customer, rolled up per nation with
    count/avg/variance statistics.  The reference's three date_dim
    aliases (d1,d2,d3) appear as the three date-band predicates on the
    orders carrier.  Each slice is PRE-AGGREGATED per customer before
    the chain join (the aggregate-through-fact-chain rewrite from the
    r4 q64 scale fix, SCALE.md): the join inputs are one row per
    customer, so slice fan-out can never multiply — the raw-pair form
    of this chain is exactly the q64-style scale trap.  stddev_samp is
    re-rendered as exact integer sum algebra in DECIMAL(19,0) factors
    (bb.py lesson) with ONE double division at the end — cross-engine
    bit-stable.""")


# ---------------------------------------------------------------------------
# 4. JOB 29a: 9-relation all-equi chain, 4 aliased dims, MIN aggregates
# ---------------------------------------------------------------------------

_Q_JOB10 = """
SELECT MIN(c.c_name) AS first_customer,
       MIN(s.s_name) AS first_supplier,
       MIN(p.p_name) AS first_part,
       MIN(o.o_orderdate) AS first_orderdate
FROM region r1, region r2, nation n1, nation n2,
     customer c, supplier s, orders o, lineitem l, part p
WHERE r1.r_name = 'AMERICA'
  AND r2.r_name IN ('EUROPE', 'ASIA')
  AND n1.n_regionkey = r1.r_regionkey
  AND n2.n_regionkey = r2.r_regionkey
  AND c.c_nationkey = n1.n_nationkey
  AND s.s_nationkey = n2.n_nationkey
  AND o.o_custkey = c.c_custkey
  AND l.l_orderkey = o.o_orderkey
  AND l.l_suppkey = s.s_suppkey
  AND l.l_partkey = p.p_partkey
  AND p.p_type LIKE '%BRASS'
  AND l.l_quantity > 40
  AND o.o_orderpriority = '1-URGENT'
"""

_sql_query(
    "job_ten_way_min_chain", _Q_JOB10,
    ("region", "nation", "customer", "supplier", "orders", "lineitem",
     "part"),
    """JOB 29a shape (resources/sql/job/29a.sql: 17 relations, 4 aliased
    dims, all-equi chain, bare MIN aggregates): a 9-relation comma-list
    chain with region and nation each aliased twice (customer side vs
    supplier side — the an1/n1 aka_name/name split), selective constant
    predicates on every dim, and MIN outputs with no GROUP BY.  All
    joins are equi; Catalyst broadcast-joins the dims and keeps lineitem
    as the probe side (plan-asserted).  The empty-input corner (MIN over
    zero rows -> one all-NULL row) matches the reference's aggregate
    semantics.""")


# ---------------------------------------------------------------------------
# 5. JOB 21a/28a: mixed-predicate chain (NOT LIKE / IS NULL / IN / OR)
# ---------------------------------------------------------------------------

_Q_JOB_MIX = """
SELECT MIN(s.s_name) AS supplier_name,
       MIN(p.p_name) AS part_name,
       MIN(o.o_orderdate) AS first_order
FROM supplier s, nation n, part p, lineitem l, orders o, customer c
WHERE n.n_name <> 'BRAZIL'
  AND (s.s_name LIKE '%000001%' OR s.s_name LIKE '%000002%')
  AND s.s_name NOT LIKE '%9999%'
  AND p.p_type IN ('SMALL', 'MEDIUM', 'PROMO')
  AND p.p_name IS NOT NULL
  AND p.p_name NOT LIKE '%zzz%complaint%'
  AND l.l_linestatus = 'F'
  AND o.o_orderpriority NOT LIKE '%NOT%SPECIFIED%'
  AND c.c_mktsegment <> 'AUTOMOBILE'
  AND s.s_nationkey = n.n_nationkey
  AND l.l_suppkey = s.s_suppkey
  AND l.l_partkey = p.p_partkey
  AND l.l_orderkey = o.o_orderkey
  AND o.o_custkey = c.c_custkey
"""

_sql_query(
    "job_mixed_predicate_chain", _Q_JOB_MIX,
    ("supplier", "nation", "part", "lineitem", "orders", "customer"),
    """JOB 21a/28a shape (resources/sql/job/21a.sql, 28a.sql): the
    messy-predicate chain — <> on a dim, OR of two LIKEs, NOT LIKE with
    a multi-wildcard pattern (the q16 'Customer%Complaints' idiom), an
    IN-list, IS NOT NULL — over a 6-relation all-equi chain with MIN
    outputs, re-targeted at the synthetic schema's columns.  Every
    predicate is a pushable scan filter; the OR of LIKEs stays a single
    scan predicate, never a union rewrite (tests/test_dsq2.py).""")


# ---------------------------------------------------------------------------
# 6. TPC-DS q51: FULL OUTER join of two cumulative-window series
# ---------------------------------------------------------------------------

_Q51 = """
WITH urgent_v AS (
  SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
             AS DECIMAL(19,0)))
           OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cume_cents
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_custkey < 300
  GROUP BY o_custkey, CAST(o_orderdate AS DATE)),
routine_v AS (
  SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
             AS DECIMAL(19,0)))
           OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cume_cents
  FROM orders
  WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH') AND o_custkey < 300
  GROUP BY o_custkey, CAST(o_orderdate AS DATE))
SELECT cust, day,
       CAST(urgent_cume AS BIGINT) AS urgent_cume_c,
       CAST(routine_cume AS BIGINT) AS routine_cume_c
FROM (
  SELECT CASE WHEN u.cust IS NOT NULL THEN u.cust ELSE r.cust END AS cust,
         CASE WHEN u.day IS NOT NULL THEN u.day ELSE r.day END AS day,
         MAX(u.cume_cents)
           OVER (PARTITION BY
                   CASE WHEN u.cust IS NOT NULL THEN u.cust ELSE r.cust END
                 ORDER BY
                   CASE WHEN u.day IS NOT NULL THEN u.day ELSE r.day END
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS urgent_cume,
         MAX(r.cume_cents)
           OVER (PARTITION BY
                   CASE WHEN u.cust IS NOT NULL THEN u.cust ELSE r.cust END
                 ORDER BY
                   CASE WHEN u.day IS NOT NULL THEN u.day ELSE r.day END
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS routine_cume
  FROM urgent_v u FULL OUTER JOIN routine_v r
    ON u.cust = r.cust AND u.day = r.day) x
WHERE urgent_cume > routine_cume
ORDER BY cust, day
LIMIT 100
"""

_sql_query(
    "ds_fullouter_cumulative_compare", _Q51,
    ("orders",),
    """TPC-DS q51 shape (resources/sql/tpcds/51.sql): two per-entity
    cumulative series (nested SUM-over-SUM window over a grouped
    aggregate), FULL OUTER joined on (entity, date), gap-filled with
    MAX-over-rows-unbounded windows on the coalesced keys, then band-
    filtered where one series exceeds the other.  Money runs as integer
    cents in a DECIMAL(19,0) running sum (no float in the compare); the
    full-outer + window combination is the shape Catalyst must plan as
    one sort-merge full join plus two window passes over the SAME sort
    order (no re-sort between the window operators).""")


# ---------------------------------------------------------------------------
# 7. TPC-DS q78: channel totals with returns EXCLUDED via null-filtered
#    LEFT JOIN, cross-channel ratio
# ---------------------------------------------------------------------------

_Q78 = """
WITH kept AS (
  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS yr,
         o.o_custkey AS cust,
         CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty,
         CAST(SUM(CAST(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                  AS DECIMAL(19,0))) AS BIGINT) AS cents
  FROM lineitem l
  LEFT JOIN lineitem ret
    ON ret.l_orderkey = l.l_orderkey
   AND ret.l_linenumber = l.l_linenumber
   AND ret.l_returnflag = 'R'
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE ret.l_orderkey IS NULL
  GROUP BY EXTRACT(YEAR FROM o.o_orderdate), o.o_custkey),
urgent AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         o_custkey AS cust, COUNT(*) AS n_urgent
  FROM orders
  WHERE o_orderpriority = '1-URGENT'
  GROUP BY EXTRACT(YEAR FROM o_orderdate), o_custkey)
SELECT k.yr AS yr, k.cust AS cust, k.qty AS kept_qty,
       ROUND(CAST(k.cents AS DOUBLE) / 100.0, 2) AS kept_value,
       u.n_urgent AS n_urgent
FROM kept k
JOIN urgent u ON u.yr = k.yr AND u.cust = k.cust
WHERE k.qty > 100
ORDER BY yr, cust
LIMIT 200
"""

_sql_query(
    "ds_returns_excluded_ratio", _Q78,
    ("lineitem", "orders"),
    """TPC-DS q78 shape (resources/sql/tpcds/78.sql): per-(year,
    customer) channel totals computed over rows whose RETURN match is
    absent — the LEFT JOIN + IS NULL exclusion idiom on the returns
    side (ws/wr, cs/cr pairs) — joined to a second channel summary on
    the (year, customer) pair.  The anti-semantics ride a null-filtered
    LEFT JOIN exactly as the reference writes it (Catalyst turns it
    into an anti join); sums run in DECIMAL(19,0) then presented as
    BIGINT cents / rounded dollars.""")


# ---------------------------------------------------------------------------
# 8. TPC-DS q14: INTERSECT inside IN-membership + scalar average gate
# ---------------------------------------------------------------------------

_Q14 = """
WITH cross_items AS (
  SELECT p_partkey AS pk FROM part WHERE p_type IN ('PROMO', 'SMALL')
  INTERSECT
  SELECT l.l_partkey AS pk
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1995)
SELECT p.p_brand AS brand,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                AS DECIMAL(19,0))) AS BIGINT) AS cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_partkey IN (SELECT pk FROM cross_items)
  AND CAST(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS DECIMAL(19,0))
        * (SELECT COUNT(*) FROM lineitem)
      > (SELECT CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         AS DECIMAL(19,0))) AS BIGINT) FROM lineitem)
GROUP BY p.p_brand
ORDER BY brand
"""

_sql_query(
    "ds_intersect_in_membership", _Q14,
    ("part", "lineitem", "orders"),
    """TPC-DS q14 shape (resources/sql/tpcds/14.sql): the cross_items
    CTE is an INTERSECT of two channels' item sets consumed as an
    IN-membership, gated by a scalar above-average filter.  The average
    compare is cross-multiplied into exact integer arithmetic (cents x
    global count > global cent-sum — the same no-float-boundary
    discipline as ds_correlated_avg_threshold), with the global sum
    accumulated in DECIMAL(19,0).  Catalyst plans the INTERSECT as a
    distinct semi-structure and the membership as a semi join; both
    scalar subqueries are one-row broadcasts.""")


# ---------------------------------------------------------------------------
# 9. TPC-DS q54: date-window bounds from scalar subqueries
# ---------------------------------------------------------------------------

_Q54 = """
WITH anchor AS (
  SELECT MIN(CAST(o_orderdate AS DATE)) AS d0
  FROM orders WHERE o_orderpriority = '1-URGENT')
SELECT o.o_custkey AS cust,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                AS DECIMAL(19,0))) AS BIGINT) AS cents
FROM orders o
WHERE CAST(o.o_orderdate AS DATE)
        BETWEEN (SELECT d0 FROM anchor) + 30
            AND (SELECT d0 FROM anchor) + 120
GROUP BY o.o_custkey
HAVING COUNT(*) >= 3
ORDER BY cust
"""

_sql_query(
    "ds_scalar_range_bounds", _Q54,
    ("orders",),
    """TPC-DS q54 shape (resources/sql/tpcds/54.sql's `(select
    distinct d_month_seq+1 ...) and (select distinct d_month_seq+3
    ...)` window): the scan's date band is bounded by SCALAR SUBQUERIES
    (anchor date + day offsets) rather than literals.  Both engines
    evaluate the one-row anchor first and the band filter stays a
    per-row comparison against two broadcast scalars — at scale this is
    still a single fact scan with a runtime-computed band, the dynamic-
    partition-pruning-adjacent shape.  Date + INT arithmetic is
    identical cross-engine (calendar day add).""")


# ---------------------------------------------------------------------------
# 10. TPC-DS q44: best/worst rank-position join
# ---------------------------------------------------------------------------

_Q44 = """
WITH perf AS (
  SELECT l_suppkey AS sk,
         CAST(SUM(CAST(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT) AS DECIMAL(19,0))) AS BIGINT) AS v
  FROM lineitem GROUP BY l_suppkey),
best AS (
  SELECT sk, ROW_NUMBER() OVER (ORDER BY v DESC, sk ASC) AS pos FROM perf),
worst AS (
  SELECT sk, ROW_NUMBER() OVER (ORDER BY v ASC, sk ASC) AS pos FROM perf)
SELECT CAST(b.pos AS BIGINT) AS pos,
       sb.s_name AS best_supplier, sw.s_name AS worst_supplier
FROM best b
JOIN worst w ON w.pos = b.pos
JOIN supplier sb ON sb.s_suppkey = b.sk
JOIN supplier sw ON sw.s_suppkey = w.sk
WHERE b.pos <= 10
ORDER BY pos
"""

_sql_query(
    "ds_rank_position_join", _Q44,
    ("lineitem", "supplier"),
    """TPC-DS q44 shape (resources/sql/tpcds/44.sql): two opposite-order
    rankings of the same per-entity aggregate joined ON RANK POSITION
    (best_i paired with worst_i), decorated with the entity dim twice
    under different aliases.  ROW_NUMBER with an explicit key tiebreak
    keeps both engines' pairings identical.  The global-order window
    runs over the per-supplier AGGREGATE (one row per supplier — a
    dimension-sized input, not the fact), so the single-partition
    window stage is bounded at any fact scale; revenue is exact cents
    via a DECIMAL(19,0) accumulator.""")
