"""The reference's SSB suite VERBATIM: resources/sql/ssb/initialize.sql
(CREATE TABLE incl. the double-quoted `"date"` dimension + COPY of
'|'-delimited files) runs unmodified through Connection.run_script, then
all 13 benchmark files (11.sql .. 43.sql) run unmodified through
Connection.sql — value-checked against DuckDB executing the identical
script and query text over the identical exported files.

The star-schema files are derived deterministically from the synthetic
parquet by tools/synth_ssb.py (shared with the driver-gated
sql_ssb_q21_verbatim anchor's oracle CTEs) so the benchmark literals
select real rows."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from lingo_db_spark import ddl
from lingo_db_spark import tpch_domains as dom
from lingo_db_spark.connection import Connection

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
REF_SSB = Path("/root/reference/resources/sql/ssb")

_SSB_QUERIES = ["11", "12", "13", "21", "22", "23",
                "31", "32", "33", "34", "41", "42", "43"]


@pytest.mark.skipif(not REF_SSB.exists(), reason="reference absent")
def test_ssb_verbatim_initialize_and_all_13_queries(spark, tmp_path):
    from synth_ssb import export_ssb

    export_ssb(SF_DIR, tmp_path)
    init = (REF_SSB / "initialize.sql").read_text()

    con = Connection(spark)
    con.run_script(init, base_dir=str(tmp_path))
    assert con.primary_keys["lineorder"] == ["lo_orderkey", "lo_linenumber"]

    duck = duckdb.connect()
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        for stmt in ddl.split_script(init):
            if stmt.lower().startswith("set "):
                continue
            if (cp := ddl.parse_copy(stmt)) is not None:
                duck.execute(
                    f'COPY "{cp[0]}" FROM \'{cp[1]}\' '
                    f"(DELIMITER '{cp[2]['sep']}', HEADER false)")
                continue
            duck.execute(stmt)
    finally:
        os.chdir(cwd)

    mismatches, row_bearing = [], 0
    for q in _SSB_QUERIES:
        qtext = (REF_SSB / f"{q}.sql").read_text()
        got = [tuple(r) for r in con.sql(qtext).collect()]
        want = duck.execute(qtext).fetchall()
        if not _rows_equal(got, want):
            mismatches.append((f"{q}.sql", got[:3], want[:3]))
        if want:
            row_bearing += 1
    assert mismatches == []
    # the needle queries (23: one brand of 1000; 33/34: city x city
    # [x month]) may select nothing at sf0.001; the rest carry rows
    assert row_bearing >= 10, f"only {row_bearing}/13 row-bearing"


def _rows_equal(a, b, tol=1e-6) -> bool:
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            try:
                fa, fb = float(va), float(vb)
                if abs(fa - fb) > tol * max(1.0, abs(fa), abs(fb)):
                    return False
            except (TypeError, ValueError):
                if str(va) != str(vb):
                    return False
    return True


# ---------------------------------------------------------------------------
# ssb_simplified: the same 13 flights over integer-coded dimensions
# (resources/sql/ssb_simplified — the reference's Crystal/GPU variant:
# s_region = 1, c_city = 235, p_brand1 BETWEEN 260 AND 267)
# ---------------------------------------------------------------------------

REF_SSBS = Path("/root/reference/resources/sql/ssb_simplified")


def _export_star_simplified(dest: Path) -> None:
    con = duckdb.connect()
    for t in ("customer", "supplier", "part", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    nat_c = "(c_custkey % 25)"
    nat_s = dom.supplier_nation_sql()
    # integer codes: city = nation*10+digit, category = mfgr*5+cat,
    # brand1 = category*40+suffix — the coding the variant's literals
    # assume (235 = UNITED KINGDOM city 5; brands 260..267 sit in
    # category 6)
    mfgr = "(p_partkey % 5)"
    cat = (f"({mfgr} * 5 + "
           "CAST(floor(p_partkey / 5) AS INTEGER) % 5)")
    brand = (f"({cat} * 40 + (CAST(floor(p_partkey / 25) AS INTEGER) "
             "* 7 + p_partkey) % 40)")
    con.execute(f"""
COPY (SELECT c_custkey, c_name, 'addr' || c_custkey AS c_address,
             {dom.ssb_city_int_sql(nat_c, 'c_custkey')} AS c_city,
             {nat_c} AS c_nation,
             {dom.nation_region_sql('c_nationkey')} AS c_region,
             {dom.phone_sql('c_nationkey', 'c_custkey')} AS c_phone,
             c_mktsegment
      FROM customer ORDER BY 1)
TO '{dest}/customer.tbl' (DELIMITER '|', HEADER false)""")
    con.execute(f"""
COPY (SELECT s_suppkey, s_name, 'addr' || s_suppkey AS s_address,
             {dom.ssb_city_int_sql(nat_s, 's_suppkey')} AS s_city,
             {nat_s} AS s_nation,
             {dom.nation_region_sql(nat_s)} AS s_region,
             {dom.phone_sql(nat_s, 's_suppkey')} AS s_phone
      FROM supplier ORDER BY 1)
TO '{dest}/supplier.tbl' (DELIMITER '|', HEADER false)""")
    con.execute(f"""
COPY (SELECT p_partkey, {dom.part_name_sql()} AS p_name,
             {mfgr} AS p_mfgr, {cat} AS p_category, {brand} AS p_brand1,
             {dom.case_map('p_partkey + 3', dom.COLORS)} AS p_color,
             {dom.part_type_sql()} AS p_type, p_size,
             {dom.part_container_sql()} AS p_container
      FROM part ORDER BY 1)
TO '{dest}/part.tbl' (DELIMITER '|', HEADER false)""")
    # date + lineorder: identical to the named-dimension export
    _export_star_shared(con, dest)


def _export_star_shared(con, dest: Path) -> None:
    """Calendar + lineorder COPYs shared by both SSB variants (the
    derivation SQL lives in tools/synth_ssb.py)."""
    from synth_ssb import table_selects
    sels = table_selects()
    con.execute(f"COPY ({sels['date']} ORDER BY 1) TO "
                f"'{dest}/date.tbl' (DELIMITER '|', HEADER false)")
    con.execute(f"COPY ({sels['lineorder']} ORDER BY 1, 2) TO "
                f"'{dest}/lineorder.tbl' (DELIMITER '|', HEADER false)")


@pytest.mark.skipif(not REF_SSBS.exists(), reason="reference absent")
def test_ssb_simplified_verbatim_all_13_queries(spark, tmp_path):
    _export_star_simplified(tmp_path)
    init = (REF_SSBS / "initialize.sql").read_text()

    con = Connection(spark)
    con.run_script(init, base_dir=str(tmp_path))

    duck = duckdb.connect()
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        for stmt in ddl.split_script(init):
            import re as _re
            bare = _re.sub(r"/\*.*?\*/", "", stmt,
                           flags=_re.DOTALL).strip()
            if bare.lower().startswith("set "):
                continue       # leading block comment hides the SET
            if (cp := ddl.parse_copy(stmt)) is not None:
                duck.execute(
                    f'COPY "{cp[0]}" FROM \'{cp[1]}\' '
                    f"(DELIMITER '{cp[2]['sep']}', HEADER false)")
                continue
            duck.execute(bare)
    finally:
        os.chdir(cwd)

    mismatches, row_bearing = [], 0
    for q in _SSB_QUERIES:
        qtext = (REF_SSBS / f"{q}.sql").read_text()
        got = [tuple(r) for r in con.sql(qtext).collect()]
        want = duck.execute(qtext).fetchall()
        if not _rows_equal(got, want) and \
                sorted(map(str, got)) != sorted(map(str, want)):
            mismatches.append((f"{q}.sql", got[:3], want[:3]))
        if want:
            row_bearing += 1
    assert mismatches == []
    assert row_bearing >= 9, f"only {row_bearing}/13 row-bearing"
