"""Derive the TPCx-BB schema from the synthetic testdata, for running
the reference's verbatim tpcxbb suite (resources/sql/tpcxbb/
initialize.sql + 14 structured-query files).

TPCx-BB reuses the TPC-DS store/web schema (same dbgen columns), so the
shared tables come straight from synth_tpcds._table_specs(); only the
three BigBench additions (item_marketprices, product_reviews,
web_clickstreams) get their own specs here.  The export parses
tpcxbb's OWN initialize.sql (note: STRING-typed columns), so any
column drift between the suites is caught at generation time."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import types as T

import synth_tpcds as ds

REF_XBB = Path("/root/reference/resources/sql/tpcxbb")

_RK = ds._RK
_CUST = ds._CUST


def _table_specs() -> dict:
    specs = dict(ds._table_specs())

    specs["item_marketprices"] = ("part, range(2) r(j)", "p_partkey", {
        "imp_sk": "p_partkey * 2 + j",
        "imp_item_sk": "p_partkey",
        "imp_competitor": "'competitor ' || CAST((p_partkey + j) % 20 "
                          "AS STRING)",
        # a slice strictly cheaper than i_current_price (q24 computes
        # (imp_competitor_price - i_current_price) / i_current_price)
        "imp_competitor_price":
            "CAST(ROUND(((p_partkey * 7) % 99 + 1) * "
            "(0.8 + 0.1 * j), 2) AS DECIMAL(7,2))",
        "imp_start_date": ds._sk("DATE '2001-01-01'") + " + p_partkey % 300",
        "imp_end_date": ds._sk("DATE '2001-06-01'") + " + p_partkey % 600",
    })

    specs["product_reviews"] = ("orders", "o_orderkey", {
        "pr_review_sk": "o_orderkey",
        "pr_review_date": "CAST(o_orderdate + INTERVAL 16 MONTH AS DATE)",
        "pr_review_time": "CAST(o_orderkey % 24 AS STRING) || ':00:00'",
        "pr_review_rating": "o_orderkey % 5 + 1",
        "pr_item_sk": "o_orderkey % (SELECT COUNT(*) FROM part)",
        "pr_user_sk": ds._CUST.replace("o_custkey", "o_custkey"),
        "pr_order_sk": "o_orderkey",
        "pr_review_content": "'review text ' || CAST(o_orderkey % 100 "
                             "AS STRING)",
    })

    specs["web_clickstreams"] = (ds._FACT_SRC.format(filter=""), _RK, {
        "wcs_click_date_sk": ds._sk(ds._ODATE) + f" - ({_RK}) % 10",
        "wcs_click_time_sk": f"({_RK}) % {ds.N_TIME}",
        "wcs_sales_sk": f"CASE WHEN ({_RK}) % 3 = 0 THEN _ticket "
                        "ELSE NULL END",
        "wcs_item_sk": "l_partkey",
        "wcs_web_page_sk": f"({_RK}) % {ds.N_WP}",
        "wcs_user_sk": f"CASE WHEN ({_RK}) % 11 = 10 THEN NULL ELSE "
                       + _CUST + " END",
    })

    return specs


def table_selects() -> dict[str, str]:
    """The derivation SELECT for every table, keyed by name — selects
    reference the base parquet tables by bare name, so they run in the
    export connection or as oracle CTEs over pre-registered views."""
    from lingo_db_spark import ddl

    specs = _table_specs()
    init = (REF_XBB / "initialize.sql").read_text()
    sels: dict[str, str] = {}
    for stmt in ddl.split_script(init):
        parsed = ddl.parse_create_table(stmt)
        if parsed is None:
            continue
        name, schema, _pk = parsed
        frm, key, rules = specs[name]
        cols = [f"{rules.get(f.name, ds._fallback(f, key, ci))} "
                f"AS {f.name}"
                for ci, f in enumerate(schema.fields)]
        sel = f"SELECT {', '.join(cols)} FROM {frm}"
        # tpcxbb filters d_year up to 2004 (the DS specs shift +16
        # months for 1998-2002); slide the whole fact window +34 months
        sels[name] = sel.replace("INTERVAL 16 MONTH", "INTERVAL 34 MONTH")
    return sels


def export_tpcxbb(sf_dir: str, dest: Path) -> dict[str, int]:
    import duckdb

    con = duckdb.connect()
    for t in ("customer", "part", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    counts: dict[str, int] = {}
    for name, sel in table_selects().items():
        con.execute(f"COPY ({sel}) TO '{dest}/{name}.dat' "
                    f"(DELIMITER '|', HEADER false)")
        counts[name] = con.execute(
            f"SELECT COUNT(*) FROM read_csv('{dest}/{name}.dat', "
            f"delim='|', header=false)").fetchone()[0]
    return counts
