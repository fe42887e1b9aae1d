"""Star Schema Benchmark — all 13 flights (Q1.1–Q4.3), the third SQL
suite the reference gates besides TPC-H and TPC-DS (reference
resources/sql/ssb/{11..43}.sql and resources/sql/ssb_simplified/, CI
.github/workflows/workflow-ubuntu-latest-x86_64.yml).

SSB's star schema (lineorder fact + date/customer/supplier/part dims,
O'Neil et al. "The Star Schema Benchmark and Augmented Fact Table
Indexing") is derived IN-PLAN from the TPC-H-ish testdata — lineorder =
lineitem ⋈ orders, the date dim from the order-date domain, the
geography dims through nation/region, part's mfgr/category hierarchy
from the brand number — with the IDENTICAL derivation text evaluated by
Spark and the DuckDB oracle, so what is gated is the full star query
including dimension construction.

Query shape notes (matching the reference's SSB files):
- flight 1 (11.sql-13.sql): single date-dim join, discount*quantity band
  scan, one global revenue sum;
- flight 2 (21.sql-23.sql): part+supplier+date star, group by
  (year, brand) — selectivity narrows 2.1 -> 2.3 (category -> brand
  range -> single brand);
- flight 3 (31.sql-34.sql): customer+supplier+date star, group by
  geography pairs at coarsening grain (nation -> city) and narrowing
  time (year range -> single month);
- flight 4 (41.sql-43.sql): all four dims, profit = revenue - supplycost,
  the widest star.

Constants are adapted to the synthetic data's domains (years 1995-2001,
nations NATION_0..24, brands Brand#1..25 -> MFGR#1..5 / categories
MFGR#11..55, discount 0..10 pct, city = nation '#' key%5) and chosen so
every flight returns a non-vacuous result at the sf0.01 gate.

Physical posture (the SSB research claim, and the reference's
index-nested-loop fast path OptimizeImplementations.cpp:544-590): the
dim joins (date/part/supplier/customer geography) plan as broadcast
hash joins — dims grow with keys, not with the fact.  The lineorder
DERIVATION join (lineitem ⋈ orders) is deliberately NOT broadcast:
orders is itself a fact that scales with the data, so the correct
100 TB plan is a co-partitioned shuffle join on the order key (a real
SSB deployment materializes lineorder once; bucketed ingest,
sources/bucketed, makes that join zero-exchange).  tests/test_ssb.py
plan-asserts broadcast dim joins and no cartesian/nested-loop.

Money arithmetic goes through exact int64 micro-units (`_micros`, shared
with the DS pack) summed as BIGINT on both engines before one final
double division, so parallel summation order cannot flip a hash.
"""

from __future__ import annotations

from lingo_db_spark.queries.dsq import _micros, _sql_query

_ALL = ("lineitem", "orders", "customer", "supplier", "part",
        "nation", "region")

# Shared star derivation: evaluated identically by Spark SQL and DuckDB.
# Unused CTEs are pruned by both optimizers, so every flight carries the
# full prefix (parse-time cost only).
_STAR = f"""
WITH lineorder AS (
  SELECT CAST(o_orderdate AS DATE) AS lo_orderdate,
         o_custkey AS lo_custkey,
         l_suppkey AS lo_suppkey,
         l_partkey AS lo_partkey,
         l_quantity AS lo_quantity,
         CAST(ROUND(l_discount * 100) AS INT) AS lo_discount,
         {_micros('l_extendedprice')} AS lo_extendedprice,
         {_micros('l_extendedprice * (1 - l_discount)')} AS lo_revenue,
         {_micros('l_extendedprice * 0.6')} AS lo_supplycost
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
dim_date AS (
  SELECT DISTINCT CAST(o_orderdate AS DATE) AS d_datekey,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS d_year,
         CAST(EXTRACT(YEAR FROM o_orderdate) * 100
              + EXTRACT(MONTH FROM o_orderdate) AS INT) AS d_yearmonthnum,
         CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT)
             AS d_weeknuminyear
  FROM orders),
dim_cust AS (
  SELECT c_custkey, n_name AS c_nation, r_name AS c_region,
         n_name || '#' || CAST(c_custkey % 5 AS STRING) AS c_city
  FROM customer JOIN nation ON c_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey),
dim_supp AS (
  SELECT s_suppkey, n_name AS s_nation, r_name AS s_region,
         n_name || '#' || CAST(s_suppkey % 5 AS STRING) AS s_city
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey),
dim_part AS (
  SELECT p_partkey, p_brand AS p_brand1,
         'MFGR#' || CAST(CAST(FLOOR((CAST(SUBSTR(p_brand, 7) AS INT) - 1)
                                    / 5) + 1 AS INT) AS STRING) AS p_mfgr,
         'MFGR#' || CAST(CAST(FLOOR((CAST(SUBSTR(p_brand, 7) AS INT) - 1)
                                    / 5) + 1 AS INT) AS STRING)
                 || CAST((CAST(SUBSTR(p_brand, 7) AS INT) - 1) % 5 + 1
                         AS STRING) AS p_category
  FROM part)
"""

# Exact-sum presentation: micros -> dollars double, once, at the end.
# The accumulator is DECIMAL(38,0) (per-row terms stay under int64; the
# SUM would wrap int64 silently in Spark / raise in DuckDB past ~9e18,
# which a 100 TB revenue sum in micros exceeds — a cross-engine
# divergence).  38 digits covers any conceivable revenue total.
def _money(expr: str, alias: str, scale: float = 1000000.0) -> str:
    return (f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(19,0))) AS DOUBLE)"
            f" / {scale}, 4) AS {alias}")


# --------------------------------------------------------------------------
# Flight 1: date-band revenue scans (reference resources/sql/ssb/11-13.sql)
# --------------------------------------------------------------------------

_sql_query(
    "ssb_q1_1", _STAR + f"""
SELECT {_money('lo_extendedprice * lo_discount', 'revenue', 100000000.0)}
FROM lineorder JOIN dim_date ON lo_orderdate = d_datekey
WHERE d_year = 1996
  AND lo_discount BETWEEN 1 AND 3
  AND lo_quantity < 25
""", _ALL,
    """SSB Q1.1 (reference resources/sql/ssb/11.sql): one-year
    discount-band revenue.  lo_extendedprice is exact micros and
    lo_discount an integer percent, so the sum is exact int64; the
    /1e8 presentation recovers dollars.""")

_sql_query(
    "ssb_q1_2", _STAR + f"""
SELECT {_money('lo_extendedprice * lo_discount', 'revenue', 100000000.0)}
FROM lineorder JOIN dim_date ON lo_orderdate = d_datekey
WHERE d_yearmonthnum = 199601
  AND lo_discount BETWEEN 4 AND 6
  AND lo_quantity BETWEEN 26 AND 35
""", _ALL,
    """SSB Q1.2 (12.sql): one-month band — the date filter narrows 12x
    from Q1.1 via the d_yearmonthnum attribute.""")

_sql_query(
    "ssb_q1_3", _STAR + f"""
SELECT {_money('lo_extendedprice * lo_discount', 'revenue', 100000000.0)}
FROM lineorder JOIN dim_date ON lo_orderdate = d_datekey
WHERE d_weeknuminyear = 6 AND d_year = 1996
  AND lo_discount BETWEEN 5 AND 7
  AND lo_quantity BETWEEN 26 AND 35
""", _ALL,
    """SSB Q1.3 (13.sql): one-week band via d_weeknuminyear (ISO week —
    probed identical between Spark's weekofyear and DuckDB's).""")


# --------------------------------------------------------------------------
# Flight 2: part/supplier stars, (year, brand) trend
# --------------------------------------------------------------------------

_Q2_TAIL = """
GROUP BY d_year, p_brand1
ORDER BY d_year, p_brand1
"""

_sql_query(
    "ssb_q2_1", _STAR + f"""
SELECT d_year, p_brand1,
       {_money('lo_revenue', 'revenue')}
FROM lineorder
JOIN dim_date ON lo_orderdate = d_datekey
JOIN dim_part ON lo_partkey = p_partkey
JOIN dim_supp ON lo_suppkey = s_suppkey
WHERE p_category = 'MFGR#12' AND s_region = 'AMERICA'
{_Q2_TAIL}""", _ALL,
    """SSB Q2.1 (21.sql): revenue trend for one part category sold by
    one region's suppliers.  Three broadcast dims, fact scanned once.""")

_sql_query(
    "ssb_q2_2", _STAR + f"""
SELECT d_year, p_brand1,
       {_money('lo_revenue', 'revenue')}
FROM lineorder
JOIN dim_date ON lo_orderdate = d_datekey
JOIN dim_part ON lo_partkey = p_partkey
JOIN dim_supp ON lo_suppkey = s_suppkey
WHERE p_brand1 BETWEEN 'Brand#21' AND 'Brand#23' AND s_region = 'ASIA'
{_Q2_TAIL}""", _ALL,
    """SSB Q2.2 (22.sql): brand-range narrowing (lexicographic BETWEEN
    selects exactly Brand#21..23 in this domain).""")

_sql_query(
    "ssb_q2_3", _STAR + f"""
SELECT d_year, p_brand1,
       {_money('lo_revenue', 'revenue')}
FROM lineorder
JOIN dim_date ON lo_orderdate = d_datekey
JOIN dim_part ON lo_partkey = p_partkey
JOIN dim_supp ON lo_suppkey = s_suppkey
WHERE p_brand1 = 'Brand#14' AND s_region = 'EUROPE'
{_Q2_TAIL}""", _ALL,
    """SSB Q2.3 (23.sql): single-brand point lookup, tightest flight-2
    selectivity.""")


# --------------------------------------------------------------------------
# Flight 3: customer x supplier geography at coarsening grain
# --------------------------------------------------------------------------

_sql_query(
    "ssb_q3_1", _STAR + f"""
SELECT c_nation, s_nation, d_year,
       {_money('lo_revenue', 'revenue')}
FROM lineorder
JOIN dim_cust ON lo_custkey = c_custkey
JOIN dim_supp ON lo_suppkey = s_suppkey
JOIN dim_date ON lo_orderdate = d_datekey
WHERE c_region = 'ASIA' AND s_region = 'ASIA'
  AND d_year BETWEEN 1995 AND 1997
GROUP BY c_nation, s_nation, d_year
ORDER BY d_year ASC, revenue DESC, c_nation, s_nation
""", _ALL,
    """SSB Q3.1 (31.sql): intra-Asia nation-pair trade by year, ordered
    year asc / revenue desc with a full deterministic tiebreak (revenue
    is one division of an exact int64 sum, so the sort key is
    engine-stable).""")

_sql_query(
    "ssb_q3_2", _STAR + f"""
SELECT c_city, s_city, d_year,
       {_money('lo_revenue', 'revenue')}
FROM lineorder
JOIN dim_cust ON lo_custkey = c_custkey
JOIN dim_supp ON lo_suppkey = s_suppkey
JOIN dim_date ON lo_orderdate = d_datekey
WHERE c_nation = 'NATION_7' AND s_nation = 'NATION_7'
  AND d_year BETWEEN 1995 AND 1997
GROUP BY c_city, s_city, d_year
ORDER BY d_year ASC, revenue DESC, c_city, s_city
""", _ALL,
    """SSB Q3.2 (32.sql): one nation, city-pair grain (city derived as
    nation#key%5 on both engines).""")

_sql_query(
    "ssb_q3_3", _STAR + f"""
SELECT c_city, s_city, d_year,
       {_money('lo_revenue', 'revenue')}
FROM lineorder
JOIN dim_cust ON lo_custkey = c_custkey
JOIN dim_supp ON lo_suppkey = s_suppkey
JOIN dim_date ON lo_orderdate = d_datekey
WHERE c_city IN ('NATION_7#1', 'NATION_7#4')
  AND s_city IN ('NATION_7#1', 'NATION_7#4')
  AND d_year BETWEEN 1995 AND 1997
GROUP BY c_city, s_city, d_year
ORDER BY d_year ASC, revenue DESC, c_city, s_city
""", _ALL,
    """SSB Q3.3 (33.sql): two-city pairs — the IN-list city filter
    applies to both ends of the trade.""")

_sql_query(
    "ssb_q3_4", _STAR + f"""
SELECT c_city, s_city, d_year,
       {_money('lo_revenue', 'revenue')}
FROM lineorder
JOIN dim_cust ON lo_custkey = c_custkey
JOIN dim_supp ON lo_suppkey = s_suppkey
JOIN dim_date ON lo_orderdate = d_datekey
WHERE c_city IN ('NATION_7#1', 'NATION_7#4')
  AND s_city IN ('NATION_7#1', 'NATION_7#4')
  AND d_yearmonthnum BETWEEN 199601 AND 199612
GROUP BY c_city, s_city, d_year
ORDER BY d_year ASC, revenue DESC, c_city, s_city
""", _ALL,
    """SSB Q3.4 (34.sql): the famously-tiny flight-3 tail — same city
    pairs over a single year of months via d_yearmonthnum (widened from
    SSB's single month so the gate-scale result is non-vacuous).""")


# --------------------------------------------------------------------------
# Flight 4: four-dim profit stars
# --------------------------------------------------------------------------

_sql_query(
    "ssb_q4_1", _STAR + f"""
SELECT d_year, c_nation,
       {_money('lo_revenue - lo_supplycost', 'profit')}
FROM lineorder
JOIN dim_cust ON lo_custkey = c_custkey
JOIN dim_supp ON lo_suppkey = s_suppkey
JOIN dim_part ON lo_partkey = p_partkey
JOIN dim_date ON lo_orderdate = d_datekey
WHERE c_region = 'AMERICA' AND s_region = 'AMERICA'
  AND p_mfgr IN ('MFGR#1', 'MFGR#2')
GROUP BY d_year, c_nation
ORDER BY d_year, c_nation
""", _ALL,
    """SSB Q4.1 (41.sql): profit (revenue - supplycost, both exact
    micros) by year and customer nation across the full four-dim star.""")

_sql_query(
    "ssb_q4_2", _STAR + f"""
SELECT d_year, s_nation, p_category,
       {_money('lo_revenue - lo_supplycost', 'profit')}
FROM lineorder
JOIN dim_cust ON lo_custkey = c_custkey
JOIN dim_supp ON lo_suppkey = s_suppkey
JOIN dim_part ON lo_partkey = p_partkey
JOIN dim_date ON lo_orderdate = d_datekey
WHERE c_region = 'AMERICA' AND s_region = 'AMERICA'
  AND d_year IN (1996, 1997)
  AND p_mfgr IN ('MFGR#1', 'MFGR#2')
GROUP BY d_year, s_nation, p_category
ORDER BY d_year, s_nation, p_category
""", _ALL,
    """SSB Q4.2 (42.sql): the year drill-down of Q4.1 regrouped by
    supplier nation and part category.""")

_sql_query(
    "ssb_q4_3", _STAR + f"""
SELECT d_year, s_city, p_brand1,
       {_money('lo_revenue - lo_supplycost', 'profit')}
FROM lineorder
JOIN dim_cust ON lo_custkey = c_custkey
JOIN dim_supp ON lo_suppkey = s_suppkey
JOIN dim_part ON lo_partkey = p_partkey
JOIN dim_date ON lo_orderdate = d_datekey
WHERE s_nation = 'NATION_1'
  AND d_year IN (1996, 1997)
  AND p_category = 'MFGR#14'
GROUP BY d_year, s_city, p_brand1
ORDER BY d_year, s_city, p_brand1
""", _ALL,
    """SSB Q4.3 (43.sql): city/brand grain for one supplier nation and
    one category — the narrowest profit drill-down.""")
