"""TPCx-BB-style big-data analytics pack — the reference's fifth gated
suite (reference resources/sql/tpcxbb/{6..24}.sql, the TPC Express
Big Bench workload: cross-channel behavior, in-SQL statistics, retail
affinity).  The 14 SQL members reduce to five distinct shapes, each
re-expressed over the synthetic tables as raw SQL with identical-string
DuckDB oracles:

  11.sql -> bb_rating_activity_scatter   (two-CTE scatter: per-entity
            (count, avg) joined to a recent-activity set)
  12.sql -> bb_click_precedes_purchase   (cross-channel temporal
            precedence: DISTINCT derived tables + inequality join)
  15.sql -> bb_category_trend_slope      (closed-form least-squares
            regression slope per category, pure SUM algebra)
  21.sql -> bb_returned_then_repurchased (return event followed by a
            later re-purchase of the same (customer, part))
  23.sql -> bb_value_volatility_band     (per-group mean/variance with
            a coefficient-of-variation band filter)

The ML-adjacent members (5: logistic regression, 20/25/26/28:
clustering/classification) are covered by the engine's iterative layer
(plans/iterate: iter_kmeans, pageRank) rather than SQL shapes.

Exactness discipline: every aggregate is an int64 cents/micros sum; the
only floating-point steps are final divisions of exact integers (IEEE-
deterministic cross-engine), and every inequality that decides a row
(the volatility band) is cross-multiplied into pure integer arithmetic.

100 TB posture: all shapes are equi-join + aggregate (the temporal
precedence join is an equi-join on user with a residual date predicate);
no correlated per-row subqueries, nothing driver-sided.
"""

from __future__ import annotations

from lingo_db_spark.queries.dsq import _sql_query

_EV = ("events",)
_CENTS = "CAST(ROUND(value * 100) AS BIGINT)"


_sql_query(
    "bb_rating_activity_scatter", f"""
WITH p AS (
  SELECT user_id, COUNT(*) AS r_count,
         CAST(SUM({_CENTS}) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id),
s AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'click'
    AND ts >= CAST('2024-01-10' AS TIMESTAMP)
    AND ts < CAST('2024-01-20' AS TIMESTAMP))
SELECT p.user_id AS user_id, p.r_count AS x,
       CAST(FLOOR((p.cents * 200 + p.r_count) / (p.r_count * 2))
            AS DOUBLE) / 10000 AS y
FROM s JOIN p ON p.user_id = s.user_id
ORDER BY user_id
""", _EV,
    """TPCx-BB q11 shape (resources/sql/tpcxbb/11.sql): per-entity
    (count, average) statistics CTE joined to the set of entities with
    recent activity — the review-rating vs sales scatter input.  The
    4-decimal average is computed as integer half-up
    (floor((200c + n) / 2n) = round(100c/n)) — both factors stay under
    2^53 so the double division inside FLOOR is exact, and no engine
    ROUND tie-break can differ.""")

_sql_query(
    "bb_click_precedes_purchase", """
SELECT DISTINCT w.user_id AS user_id
FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS click_day
      FROM events
      WHERE event_type IN ('view', 'click')
        AND CAST(ts AS DATE) >= CAST('2024-01-05' AS DATE)
        AND CAST(ts AS DATE) <= CAST('2024-01-15' AS DATE)) w
JOIN (SELECT DISTINCT user_id, CAST(ts AS DATE) AS buy_day
      FROM events
      WHERE event_type = 'purchase') s
  ON w.user_id = s.user_id AND w.click_day < s.buy_day
ORDER BY user_id
""", _EV,
    """TPCx-BB q12 shape (12.sql): cross-channel temporal precedence —
    users whose browse event (view/click, windowed) strictly precedes a
    purchase day.  Two pre-DISTINCTed derived tables, an equi-join on
    user with a residual date inequality (NOT a non-equi join over raw
    rows: the DISTINCT first makes the join input per-user-day, the
    plan that survives scale).""")

_sql_query(
    "bb_category_trend_slope", f"""
WITH daily AS (
  SELECT event_type AS cat,
         CAST(EXTRACT(DAY FROM ts) AS BIGINT) AS x,
         CAST(SUM({_CENTS}) AS BIGINT) AS y
  FROM events
  GROUP BY event_type, EXTRACT(DAY FROM ts))
SELECT cat,
       ROUND(CAST(CAST(COUNT(*) AS DECIMAL(19,0))
                    * CAST(SUM(x * y) AS DECIMAL(19,0))
                  - CAST(SUM(x) AS DECIMAL(19,0))
                    * CAST(SUM(y) AS DECIMAL(19,0))
                  AS DOUBLE)
             / CAST(CAST(COUNT(*) AS DECIMAL(19,0))
                      * CAST(SUM(x * x) AS DECIMAL(19,0))
                    - CAST(SUM(x) AS DECIMAL(19,0))
                      * CAST(SUM(x) AS DECIMAL(19,0)) AS DOUBLE)
             / 100, 6) AS slope,
       COUNT(*) AS n_days
FROM daily
GROUP BY cat
ORDER BY cat
""", _EV,
    """TPCx-BB q15 shape (15.sql): closed-form least-squares slope
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) of daily revenue per category,
    computed entirely as SQL sum algebra.  Sums are exact int64 (x =
    day ordinal <= 31, y = daily cents); the n*Sxy / Sx*Sy cross terms
    are widened to DECIMAL(19,0) factors (products land in 128-bit
    decimal on both engines — Spark wraps int64 silently with ANSI off
    while DuckDB raises, so staying in int64 would diverge cross-engine
    past ~1e18) before ONE double division.  Exact while daily cents
    < ~1e17 — beyond any one category-day at 100 TB.""")

_sql_query(
    "bb_returned_then_repurchased", """
WITH ret AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part,
         CAST(o.o_orderdate AS DATE) AS ret_day
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'),
rep AS (
  SELECT o.o_custkey AS cust, l.l_partkey AS part,
         CAST(o.o_orderdate AS DATE) AS buy_day,
         CAST(ROUND(l.l_quantity) AS BIGINT) AS qty
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'N')
SELECT r.part AS p_partkey,
       COUNT(*) AS repurchases,
       CAST(SUM(rep.qty) AS BIGINT) AS total_qty
FROM ret r
JOIN rep ON rep.cust = r.cust AND rep.part = r.part
        AND rep.buy_day > r.ret_day
GROUP BY r.part
ORDER BY repurchases DESC, p_partkey
LIMIT 25
""", ("lineitem", "orders"),
    """TPCx-BB q21 shape (21.sql): items returned and later re-purchased
    by the same customer — two date-banded channel slices joined on
    (customer, item) with a residual afterwards-predicate, rolled up per
    item.  The DISTINCT on the return side pins the multiplicity the
    oracle must reproduce.""")

_sql_query(
    "bb_value_volatility_band", f"""
WITH obs AS (
  SELECT event_type, CAST(ts AS DATE) AS day, {_CENTS} AS c
  FROM events),
stats AS (
  SELECT event_type, day, CAST(COUNT(*) AS DECIMAL(19,0)) AS n,
         CAST(SUM(c) AS DECIMAL(19,0)) AS sx,
         CAST(SUM(CAST(c AS DECIMAL(19,0)) * c) AS DECIMAL(19,0)) AS sxx
  FROM obs GROUP BY event_type, day)
SELECT event_type, day,
       CAST(FLOOR((CAST(sx AS DOUBLE) * 200 + CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) * 2)) AS DOUBLE) / 10000
         AS mean_value,
       CAST(FLOOR((CAST(n * sxx - sx * sx AS DOUBLE)
                   + CAST(n * (n - 1) AS DOUBLE) / 2)
                  / CAST(n * (n - 1) AS DOUBLE)) AS DOUBLE) / 10000
         AS var_value
FROM stats
WHERE n > 1 AND 4 * n * (n * sxx - sx * sx) > sx * sx * (n - 1)
ORDER BY event_type, day
""", _EV,
    """TPCx-BB q23 shape (23.sql): per-(group, period) mean and sample
    variance with a coefficient-of-variation band filter (std/mean >
    1/2).  The band decision is cross-multiplied into exact integer
    arithmetic — var > (1/2)^2 * mean^2 becomes 4n(n*Sxx - Sx^2) >
    Sx^2(n-1) — so no float ulp can flip a boundary group.  n/sx/sxx
    are DECIMAL(19,0), so the band products evaluate in 128-bit decimal
    on BOTH engines (int64 would silently wrap in Spark with ANSI off
    while DuckDB raises — a cross-engine divergence past ~1e18).
    (19,0) x (19,0) = (38,0) is the widest product both engines accept;
    the band stays exact while Sxx < 1e19 — about 1e9 rows per (group,
    day) at cents <= 1e5; beyond that Spark nulls out visibly rather
    than wrapping.

    The PRESENTED 4-decimal mean/variance are integer half-up, the
    bb_rating_activity_scatter recipe: round(q, 4) with q = x/d becomes
    floor((2*10^4*x + d) / (2d)) / 10^4 — here mean = Sx/(100n) gives
    floor((200*Sx + n) / (2n)), and variance = (n*Sxx - Sx^2) /
    (10^4 * n(n-1)) gives floor((num + n(n-1)/2) / (n(n-1))) with num =
    n*Sxx - Sx^2 >= 0 (Cauchy-Schwarz; n(n-1) is even, so the half is
    an exact integer).  ROUND(double, 4) was the r14-diagnosed
    cross-engine trap: at sf0.001 two groups' exact quotients land
    within one double ulp of a .00005 tie and Spark's HALF_UP-on-
    BigDecimal and DuckDB's round() disagree by 1e-4 (sf0.01/sf0.1
    never hit a tie — verified 0 changed rows there, so the integer
    form alters nothing that was green).  FLOOR's double division is
    exact while its numerator stays under 2^53 (~4.5e13 cents of
    per-group sum, ~9e15 of num) — far past bench scale, and the
    quotient is never closer than 1/(2d) to an integer except at exact
    ties, where it IS an integer.""")
