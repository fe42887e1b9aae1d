"""The reference's TPCx-BB structured-query suite VERBATIM:
resources/sql/tpcxbb/initialize.sql (the DS-derived schema plus
item_marketprices / product_reviews / web_clickstreams, with
STRING-typed columns) runs unmodified through Connection.run_script,
then all 14 query files run unmodified through Connection.sql —
value-checked against DuckDB on identical exported files
(tools/synth_tpcxbb.py, reusing the synth_tpcds specs with a +34-month
fact window for the suite's 2001-2004 date literals)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from lingo_db_spark import ddl
from lingo_db_spark.connection import Connection

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
REF_XBB = Path("/root/reference/resources/sql/tpcxbb")


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


def _canon_val(v):
    if v is None:
        return "\0"
    try:
        return f"{float(v):.6e}"
    except (TypeError, ValueError):
        return str(v)


def _canon(rows):
    return sorted(tuple(_canon_val(v) for v in r) for r in rows)


@pytest.mark.skipif(not REF_XBB.exists(), reason="reference absent")
def test_tpcxbb_verbatim_initialize_and_all_14_queries(spark, tmp_path):
    from synth_tpcxbb import export_tpcxbb

    export_tpcxbb(SF_DIR, tmp_path)
    init = (REF_XBB / "initialize.sql").read_text()

    con = Connection(spark)
    con.run_script(init, base_dir=str(tmp_path))

    duck = duckdb.connect()
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        for stmt in ddl.split_script(init):
            if stmt.lower().startswith("set "):
                continue
            if (cp := ddl.parse_copy(stmt)) is not None:
                duck.execute(
                    f"COPY {cp[0]} FROM '{cp[1]}' "
                    f"(DELIMITER '{cp[2]['sep']}', HEADER false)")
                continue
            duck.execute(stmt)
    finally:
        os.chdir(cwd)

    files = sorted(f for f in REF_XBB.glob("*.sql")
                   if f.name != "initialize.sql")
    assert len(files) == 14
    mismatches, spark_errors = [], []
    row_bearing = 0
    for f in files:
        qtext = f.read_text()
        try:
            got = [tuple(r) for r in con.sql(qtext).collect()]
        except Exception as e:        # noqa: BLE001
            spark_errors.append((f.name, str(e).splitlines()[:1]))
            continue
        want = duck.execute(qtext).fetchall()
        if not _rows_equal(got, want) and _canon(got) != _canon(want):
            mismatches.append((f.name, got[:2], want[:2]))
        if want:
            row_bearing += 1
    assert spark_errors == []
    assert mismatches == []
    assert row_bearing >= 7, f"only {row_bearing}/14 row-bearing"
