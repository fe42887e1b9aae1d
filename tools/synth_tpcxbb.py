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

    # tpcxbb q7 needle: it counts July-2004 store purchases of
    # above-category-average-priced items per state (HAVING >= 10) —
    # July 2004 sits at the very edge of the +34-month fact window, so
    # a 1/89 slice of store rows moves there (this override lives in
    # the XBB spec copy only; the DS journey never sees it)
    frm, key, ss = specs["store_sales"]
    ss = dict(ss)
    ss["ss_sold_date_sk"] = (
        f"CASE WHEN ({_RK}) % 89 = 7 THEN "
        + ds._sk("make_date(2004, 7, CAST((" + _RK + ") % 28 AS INT) + 1)")
        + f" ELSE {ss['ss_sold_date_sk']} END")
    # tpcxbb q12 needle: the query compares RAW surrogate keys
    # (wcs_click_date_sk BETWEEN 37134 AND 37164, ss_sold_date_sk
    # BETWEEN 37134 AND 37224 — dbgen's julian numbering, ~2.41M below
    # ours) and never joins date_dim, so no calendar data can ever
    # satisfy it.  A 1/19 customer slice gets its Books/Electronics
    # rows pinned into the literal windows on both channels: clicks at
    # 37134+, store purchases strictly after every click.
    _q12_cust = f"(({_CUST}) % 19 = 12)"
    _q12_item = ("(CAST(floor(l_partkey / 7) AS INTEGER) % 10 IN (0, 2))")
    ss["ss_sold_date_sk"] = (
        f"CASE WHEN {_q12_cust} AND {_q12_item} THEN "
        f"37165 + ({_RK}) % 59 "
        f"ELSE {ss['ss_sold_date_sk']} END")
    specs["store_sales"] = (frm, key, ss)

    # tpcxbb q24 needle: the query hard-codes i_item_sk = 10000, which
    # only exists at sf >= 0.1 (item count = part count).  Re-key part
    # 24 as item 10000 everywhere (item row, its market prices, and a
    # once-per-ticket fact slice pointed at it with sold dates split
    # between the price-comparison window and the one before it, so
    # both elasticity denominators are non-zero).
    _q24_item = "CASE WHEN p_partkey = 24 THEN 10000 ELSE p_partkey END"
    frm_i, key_i, item = specs["item"]
    item = dict(item)
    item["i_item_sk"] = _q24_item
    specs["item"] = (frm_i, key_i, item)
    # once per ticket, guaranteed: ROW_NUMBER over the ticket = 1 keeps
    # the (10000, order_number) primary keys unique
    _q24_row = ("(_ticket % 211 = 24 AND ROW_NUMBER() OVER "
                "(PARTITION BY _ticket ORDER BY l_orderkey, l_partkey, "
                "l_suppkey) = 1)")
    # part 24's market window: imp_start 2001-01-25, ~127-day span —
    # current window rows in Feb 2001, previous-window rows in Nov 2000
    _q24_date = (f"CASE WHEN ({_RK}) % 2 = 0 THEN "
                 + ds._sk("make_date(2001, 2, CAST(("
                          + _RK + ") % 25 AS INT) + 1)")
                 + " ELSE "
                 + ds._sk("make_date(2000, 11, CAST(("
                          + _RK + ") % 25 AS INT) + 1)") + " END")
    for tbl, pfx in (("store_sales", "ss"), ("web_sales", "ws")):
        frm_t, key_t, rules = specs[tbl]
        rules = dict(rules)
        rules[f"{pfx}_item_sk"] = (f"CASE WHEN {_q24_row} THEN 10000 "
                                   f"ELSE {rules[f'{pfx}_item_sk']} END")
        rules[f"{pfx}_sold_date_sk"] = (
            f"CASE WHEN {_q24_row} THEN {_q24_date} "
            f"ELSE {rules[f'{pfx}_sold_date_sk']} END")
        specs[tbl] = (frm_t, key_t, rules)

    # tpcxbb q23 needle: its coefficient-of-variation formula divides
    # by COUNT-1 (not sqrt), so cov = sqrt(n/(n-1)) is its own upper
    # bound for a single spike — only n = 2 sample months ({0, spike},
    # cov = 1.414) can pass the >= 1.3 bar.  For a 1/163 item slice,
    # keep exactly the first two Jan/Feb-2001 rows per (item,
    # warehouse, month) as {0, 5000} and push the rest of those months
    # five months out.
    frm_v, key_v, inv = specs["inventory"]
    inv = dict(inv)
    _q23_slice = "(p_partkey % 163 = 23)"
    _q23_win = "(d >= DATE '2001-01-01' AND d < DATE '2001-03-01')"
    _q23_rn = ("ROW_NUMBER() OVER (PARTITION BY p_partkey, wk, "
               "date_trunc('month', d) ORDER BY d)")
    inv["inv_date_sk"] = (
        f"CASE WHEN {_q23_slice} AND {_q23_win} AND {_q23_rn} > 2 "
        f"THEN {ds._sk('(d + INTERVAL 5 MONTH)')} "
        f"ELSE {inv['inv_date_sk']} END")
    inv["inv_quantity_on_hand"] = (
        f"CASE WHEN {_q23_slice} AND {_q23_win} THEN "
        f"CASE {_q23_rn} WHEN 1 THEN 0 WHEN 2 THEN 5000 "
        f"ELSE {inv['inv_quantity_on_hand']} END "
        f"ELSE {inv['inv_quantity_on_hand']} END")
    specs["inventory"] = (frm_v, key_v, inv)

    specs["item_marketprices"] = ("part, range(2) r(j)", "p_partkey", {
        "imp_sk": "p_partkey * 2 + j",
        "imp_item_sk": _q24_item,
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
        # q12 needle (see store_sales above): the slice's clicks land in
        # the literal 37134-37164 window, unconverted (sales_sk NULL),
        # with a real user — its store purchases sit strictly later
        "wcs_click_date_sk": (
            f"CASE WHEN {_q12_cust} AND {_q12_item} THEN "
            f"37134 + ({_RK}) % 31 ELSE "
            + ds._sk(ds._ODATE) + f" - ({_RK}) % 10 END"),
        "wcs_click_time_sk": f"({_RK}) % {ds.N_TIME}",
        "wcs_sales_sk": (
            f"CASE WHEN {_q12_cust} AND {_q12_item} THEN NULL "
            f"WHEN ({_RK}) % 3 = 0 THEN _ticket ELSE NULL END"),
        "wcs_item_sk": "l_partkey",
        "wcs_web_page_sk": f"({_RK}) % {ds.N_WP}",
        "wcs_user_sk": (
            f"CASE WHEN {_q12_cust} AND {_q12_item} THEN " + _CUST + " "
            f"WHEN ({_RK}) % 11 = 10 THEN NULL ELSE "
            + _CUST + " END"),
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
