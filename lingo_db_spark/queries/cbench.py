"""ClickBench-style web-analytics pack — the reference's fourth gated
SQL suite (reference resources/sql/clickbench/{1..43}.sql, the
ClickHouse hits-table benchmark).  The 43 originals reduce to a dozen
distinct shapes; each is re-expressed over the `events` table
(hits -> events, UserID -> user_id, SearchPhrase -> event_type,
EventTime -> ts, the JSON props standing in for the wide attribute
columns) as raw SQL with identical-string DuckDB oracles.

Shape map (clickbench file -> query here):
  1/2/3       -> cb_scalar_aggregates     (whole-table scalar agg batch)
  5/6         -> cb_count_distinct        (COUNT(DISTINCT ...) pair)
  13/14       -> cb_top_groups            (heavy-hitter GROUP BY + top-k)
  18/19       -> cb_pair_groups           (two-key grouping, paginated)
  23          -> cb_like_filtered_agg     (LIKE / NOT LIKE + min + ndv)
  30          -> cb_wide_sums             (N independent SUM expressions)
  35          -> cb_const_group           (constant-keyed grouping)
  39..41      -> cb_daily_traffic         (per-day counts over a range)
  43          -> cb_minute_series         (minute truncation + OFFSET page)
  8/25        -> cb_point_filter_topk     (selective predicate + top-k)

100 TB posture: every query is a single scan + partial (map-side)
aggregation; the top-k queries end in TakeOrderedAndProject (no global
sort of the aggregate output); COUNT(DISTINCT) plans Spark's two-phase
distinct expansion, which at cluster scale beats a naive shuffle of raw
values.  Float sums ride exact int64 cents so parallel accumulation
order cannot flip the oracle hash (the same _micros discipline as the
DS/SSB packs).  Plan assertions: tests/test_cbench.py.
"""

from __future__ import annotations

from lingo_db_spark.queries.dsq import _micros, _sql_query

_EV = ("events",)

# value in exact cents: SUM order can't change the answer.
_CENTS = "CAST(ROUND(value * 100) AS BIGINT)"


_sql_query(
    "cb_scalar_aggregates", f"""
SELECT COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS users,
       ROUND(CAST(CAST(SUM({_CENTS}) AS BIGINT) AS DOUBLE) / 100, 2)
           AS total_value,
       CAST(MIN(user_id) AS BIGINT) AS min_user,
       CAST(MAX(user_id) AS BIGINT) AS max_user
FROM events
""", _EV,
    """ClickBench q1-q3 shape (resources/sql/clickbench/1.sql-3.sql):
    whole-table scalar aggregate batch — one scan, pure map-side
    partials, a single-row reduce.""")

_sql_query(
    "cb_count_distinct", """
SELECT COUNT(DISTINCT event_type) AS types,
       COUNT(DISTINCT user_id) AS users,
       COUNT(DISTINCT user_id * 7 + CAST(LENGTH(event_type) AS BIGINT))
           AS mixed_ndv
FROM events
WHERE event_type <> 'view'
""", _EV,
    """ClickBench q5/q6 shape: multiple COUNT(DISTINCT) over one scan —
    Spark plans the expand-based multi-distinct aggregate (partial
    per-key dedup before the shuffle).""")

_sql_query(
    "cb_top_groups", """
SELECT event_type, COUNT(*) AS c
FROM events
WHERE event_type <> ''
GROUP BY event_type
ORDER BY c DESC, event_type
LIMIT 10
""", _EV,
    """ClickBench q13 shape (13.sql `GROUP BY SearchPhrase ORDER BY c
    DESC LIMIT 10`): heavy-hitter top-k — must plan hash aggregate +
    TakeOrderedAndProject, never a global sort (plan-asserted).""")

_sql_query(
    "cb_pair_groups", """
SELECT user_id, event_type, COUNT(*) AS c
FROM events
GROUP BY user_id, event_type
ORDER BY c DESC, user_id, event_type
LIMIT 20
""", _EV,
    """ClickBench q18 shape (`GROUP BY UserID, SearchPhrase LIMIT 10`,
    made deterministic with a full ORDER BY tiebreak): two-key grouping
    whose key cardinality approaches the row count.""")

_sql_query(
    "cb_like_filtered_agg", """
SELECT event_type,
       MIN(props) AS sample_props,
       COUNT(*) AS c,
       COUNT(DISTINCT user_id) AS users
FROM events
WHERE props LIKE '%9%' AND props NOT LIKE '%99%' AND event_type <> ''
GROUP BY event_type
ORDER BY c DESC, event_type
LIMIT 10
""", _EV,
    """ClickBench q23 shape (23.sql `Title LIKE '%Google%' AND URL NOT
    LIKE '%.google.%'`): conjunctive LIKE / NOT LIKE string filters
    feeding MIN + count-distinct aggregates.""")

_sql_query(
    "cb_wide_sums", "SELECT\n" + ",\n".join(
        f"  CAST(SUM({_CENTS} + {i}) AS BIGINT) AS s{i}" for i in range(10))
    + "\nFROM events", _EV,
    """ClickBench q30 shape (30.sql's 90 SUM(ResolutionWidth + i)
    columns, representative 10 here): a wide batch of independent sum
    expressions evaluated in one scan — whole-stage codegen folds all
    N accumulators into a single tight loop.""")

_sql_query(
    "cb_const_group", """
SELECT 1 AS one, event_type, COUNT(*) AS c
FROM events
GROUP BY 1, event_type
ORDER BY c DESC, event_type
LIMIT 10
""", _EV,
    """ClickBench q35 shape (35.sql `SELECT 1, URL, COUNT(*) ... GROUP
    BY 1, URL`): constant grouping key folded away by the optimizer.""")

_sql_query(
    "cb_daily_traffic", """
SELECT CAST(ts AS DATE) AS day, COUNT(*) AS events_n,
       COUNT(DISTINCT user_id) AS dau
FROM events
WHERE ts >= CAST('2024-01-08' AS TIMESTAMP)
  AND ts < CAST('2024-01-15' AS TIMESTAMP)
GROUP BY CAST(ts AS DATE)
ORDER BY day
""", _EV,
    """ClickBench q39-q41 shape: per-day traffic + distinct users over a
    date range — the timestamp range predicate prunes at the scan.""")

_sql_query(
    "cb_minute_series", """
SELECT DATE_TRUNC('minute', ts) AS m, COUNT(*) AS page_views
FROM events
WHERE event_type = 'click'
GROUP BY DATE_TRUNC('minute', ts)
ORDER BY m
LIMIT 10 OFFSET 100
""", _EV,
    """ClickBench q43 shape (43.sql): minute-granularity series with
    LIMIT/OFFSET pagination after an ordered group-by.""")

_sql_query(
    "cb_point_filter_topk", """
SELECT user_id,
       ROUND(CAST(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) / 100, 2) AS spend,
       COUNT(*) AS c
FROM events
WHERE event_type = 'purchase' AND value > 5
GROUP BY user_id
ORDER BY spend DESC, user_id
LIMIT 15
""", _EV,
    """ClickBench q8/q25 shape: selective predicate then top-k by an
    aggregate — exact-cents spend so DESC ordering is engine-stable.""")


_sql_query(
    "cb_regex_dimension_agg", """
SELECT regexp_extract(props, '"k": ([0-9]+)', 1) AS k_str,
       COUNT(*) AS c,
       CAST(SUM(CAST(LENGTH(props) AS BIGINT)) AS BIGINT) AS total_len,
       MIN(props) AS sample_props
FROM events
WHERE props <> ''
GROUP BY regexp_extract(props, '"k": ([0-9]+)', 1)
HAVING COUNT(*) > 20
ORDER BY c DESC, k_str
LIMIT 25
""", _EV,
    """ClickBench q28 shape (28.sql `REGEXP_REPLACE(Referer, ...) AS key
    ... GROUP BY key HAVING COUNT(*) > 100000 ORDER BY l DESC LIMIT 25`):
    a dimension EXTRACTED by regex at query time (regexp_extract — the
    one regex API whose name, argument order, and group semantics are
    identical in Spark SQL and DuckDB; REGEXP_REPLACE backreference
    syntax differs, $1 vs \\\\1) feeding grouped aggregates with a HAVING
    band and a top-k.""")
