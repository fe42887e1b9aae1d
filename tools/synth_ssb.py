"""Derive the SSB star schema from the synthetic testdata parquet.

lineorder = lineitem x orders (dbgen-shifted -3 years so the d_year
1992-1998 literals select rows); date = a generated calendar over that
range; customer/supplier/part are mapped onto the SSB value domains via
lingo_db_spark/tpch_domains.py so the benchmark literals (d_year = 1993,
p_category = 'MFGR#12', s_region = 'AMERICA', c_city = 'UNITED KI1',
d_yearmonth = 'Dec1997') select real rows.

Base-table references are `main.`-qualified so the SAME select text runs
as an oracle CTE named `customer`/`supplier`/`part` over the driver's
pre-registered DuckDB views (an unqualified `FROM customer` inside a CTE
named `customer` would be a self-reference in DuckDB).
"""

from __future__ import annotations

from pathlib import Path

from lingo_db_spark import tpch_domains as dom


def table_selects() -> dict[str, str]:
    """The derivation SELECT for each of the 5 SSB tables."""
    nation_c = dom.nation_name_sql("c_nationkey")
    nation_s = dom.nation_name_sql(dom.supplier_nation_sql())
    region_c = dom.region_name_sql(dom.nation_region_sql("c_nationkey"))
    region_s = dom.region_name_sql(
        dom.nation_region_sql(dom.supplier_nation_sql()))
    return {
        "customer": f"""
SELECT c_custkey, c_name, 'addr' || c_custkey AS c_address,
       {dom.ssb_city_sql(nation_c, 'c_custkey')} AS c_city,
       {nation_c} AS c_nation, {region_c} AS c_region,
       {dom.phone_sql('c_nationkey', 'c_custkey')} AS c_phone,
       c_mktsegment
FROM main.customer""",
        "supplier": f"""
SELECT s_suppkey, s_name, 'addr' || s_suppkey AS s_address,
       {dom.ssb_city_sql(nation_s, 's_suppkey')} AS s_city,
       {nation_s} AS s_nation, {region_s} AS s_region,
       {dom.phone_sql(dom.supplier_nation_sql(), 's_suppkey')} AS s_phone
FROM main.supplier""",
        "part": f"""
SELECT p_partkey, {dom.part_name_sql()} AS p_name,
       {dom.ssb_mfgr_sql()} AS p_mfgr,
       {dom.ssb_category_sql()} AS p_category,
       {dom.ssb_brand1_sql()} AS p_brand1,
       {dom.case_map('p_partkey + 3', dom.COLORS)} AS p_color,
       {dom.part_type_sql()} AS p_type, p_size,
       {dom.part_container_sql()} AS p_container
FROM main.part""",
        "date": """
SELECT CAST(strftime(d, '%Y%m%d') AS INTEGER) AS d_datekey,
       strftime(d, '%B %d, %Y') AS d_date,
       dayname(d) AS d_dayofweek,
       monthname(d) AS d_month,
       EXTRACT(year FROM d) AS d_year,
       EXTRACT(year FROM d) * 100 + EXTRACT(month FROM d)
           AS d_yearmonthnum,
       strftime(d, '%b%Y') AS d_yearmonth,
       EXTRACT(isodow FROM d) AS d_daynuminweek,
       EXTRACT(day FROM d) AS d_daynuminmonth,
       EXTRACT(doy FROM d) AS d_daynuminyear,
       EXTRACT(month FROM d) AS d_monthnuminyear,
       EXTRACT(week FROM d) AS d_weeknuminyear,
       CASE WHEN EXTRACT(month FROM d) IN (12, 1) THEN 'Christmas'
            WHEN EXTRACT(month FROM d) IN (6, 7, 8) THEN 'Summer'
            ELSE 'None' END AS d_sellingseason,
       CASE WHEN EXTRACT(isodow FROM d) = 7 THEN 1 ELSE 0 END
           AS d_lastdayinweekfl,
       CASE WHEN d = last_day(d) THEN 1 ELSE 0 END AS d_lastdayinmonthfl,
       CASE WHEN EXTRACT(doy FROM d) = 1 THEN 1 ELSE 0 END AS d_holidayfl,
       CASE WHEN EXTRACT(isodow FROM d) <= 5 THEN 1 ELSE 0 END
           AS d_weekdayfl
FROM (SELECT CAST(g AS DATE) AS d FROM generate_series(
      DATE '1992-01-01', DATE '1998-12-31', INTERVAL 1 DAY) t(g))""",
        "lineorder": f"""
SELECT l_orderkey AS lo_orderkey,
       ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY
           l_linenumber, l_partkey, l_suppkey) AS lo_linenumber,
       o_custkey + CASE WHEN o_custkey % 3 = 0 THEN 1 ELSE 0 END
           AS lo_custkey,
       l_partkey AS lo_partkey,
       -- q23 needle: the one-brand-in-a-thousand query (p_brand1 =
       -- 'MFGR#2239', s_region = 'EUROPE') has ~2 matching parts at
       -- sf0.01 whose rows happened to miss EUROPE suppliers — pin
       -- exactly those parts' rows onto one
       CASE WHEN {dom.ssb_brand1_sql('l_partkey')} = 'MFGR#2239'
            THEN (SELECT MIN(s_suppkey) FROM main.supplier
                  WHERE {region_s} = 'EUROPE')
            ELSE l_suppkey END AS lo_suppkey,
       CAST(strftime(CAST(o_orderdate - INTERVAL 3 YEAR AS DATE),
           '%Y%m%d') AS INTEGER) AS lo_orderdate,
       o_orderpriority AS lo_orderpriority,
       '0' AS lo_shippriority,
       CAST(l_quantity AS INTEGER) AS lo_quantity,
       l_extendedprice AS lo_extendedprice,
       o_totalprice AS lo_ordtotalprice,
       CAST(ROUND(l_discount * 100) AS INTEGER) AS lo_discount,
       CAST(ROUND(l_extendedprice *
           (100 - ROUND(l_discount * 100)) / 100, 2)
           AS DECIMAL(18,2)) AS lo_revenue,
       CAST(ROUND(l_extendedprice * 0.6, 2) AS DECIMAL(18,2))
           AS lo_supplycost,
       CAST(ROUND(l_tax * 100) AS INTEGER) AS lo_tax,
       CAST(strftime(CAST(l_shipdate - INTERVAL 3 YEAR AS DATE) +
           CAST((l_orderkey * 31 + l_partkey) % 60 - 30 AS INTEGER),
           '%Y%m%d') AS INTEGER) AS lo_commitdate,
       {dom.ship_mode_sql('l_orderkey * 7 + l_partkey')} AS lo_shipmode
FROM main.lineitem JOIN main.orders ON l_orderkey = o_orderkey""",
    }


def export_ssb(sf_dir: str, dest: Path) -> None:
    """Write the 5 '|'-delimited .tbl files the SSB initialize.sql COPY
    statements expect (deterministic ORDER BY so exports are stable)."""
    import duckdb

    con = duckdb.connect()
    for t in ("customer", "supplier", "part", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    order = {"lineorder": "ORDER BY 1, 2"}
    for name, sel in table_selects().items():
        con.execute(
            f"COPY ({sel} {order.get(name, 'ORDER BY 1')}) "
            f"TO '{dest}/{name}.tbl' (DELIMITER '|', HEADER false)")
