"""The reference's join-order-benchmark suite VERBATIM:
resources/sql/job/initialize.sql (the 21-table IMDB schema, including
`text` / `character varying` column types and csv-escape COPY) runs
unmodified through Connection.run_script, then ALL 113 query files run
unmodified through Connection.sql — value-checked against DuckDB
executing the identical script and query text over identical exported
files (the reference's CI gate is test/sqlite-datasets/job.test).

The tables derive from the synthetic testdata via tools/synth_job.py
(cast/info/keyword/company facts from lineitem, movies from orders,
people from customers, companies from parts, generated typed
dimensions) with hand-curated literal pools covering every `=`/`IN`
literal and a satisfier for every LIKE pattern the 113 queries use —
88/113 select real rows at sf0.01, ~75 at the sf0.001 this test uses.
JOB queries are global MIN() aggregates, so an unselective instance
still compares exactly (both engines produce the all-NULL row)."""

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
REF_JOB = Path("/root/reference/resources/sql/job")

# The exact queries whose needle families have no members inside the
# sf0.001 keyspace (ClickBench-style named exemption set — r10).
SCALE_INHERENT_EMPTY_SF0001 = [
    "10b", "11b", "14b", "18b", "21b", "27c", "28c", "4b", "6c",
]


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


@pytest.mark.skipif(not REF_JOB.exists(), reason="reference absent")
def test_job_verbatim_initialize_and_all_113_queries(spark, tmp_path):
    from synth_job import export_job

    export_job(SF_DIR, tmp_path)
    init = (REF_JOB / "initialize.sql").read_text()

    con = Connection(spark)
    con.run_script(init, base_dir=str(tmp_path))
    assert con.primary_keys["title"] == ["id"]

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
                    f"(DELIMITER ',', HEADER false, ESCAPE '\\')")
                continue
            duck.execute(stmt)
    finally:
        os.chdir(cwd)

    files = sorted(f for f in REF_JOB.glob("*.sql")
                   if f.name != "initialize.sql")
    assert len(files) == 113
    mismatches, spark_errors = [], []
    empties = []
    for f in files:
        qtext = f.read_text()
        try:
            got = [tuple(r) for r in con.sql(qtext).collect()]
        except Exception as e:        # noqa: BLE001
            spark_errors.append((f.name, str(e).splitlines()[:1]))
            continue
        want = duck.execute(qtext).fetchall()
        if not _rows_equal(got, want):
            mismatches.append((f.name, got[:1], want[:1]))
        if not (want and any(v is not None for v in want[0])):
            empties.append(f.stem)
    assert spark_errors == []
    assert mismatches == []
    # 104/113 bear rows at this test's sf0.001; the 9 empties are
    # scale-inherent, pinned BY NAME (their needle-family members have
    # movie ids above the 1500-order keyspace: 11b needs id 7224, 21b
    # id 14436, ...).  A fixture regression adds a name here and fails
    # loudly; the sf0.01 floor — where every family has members — is
    # asserted at == 113 by test_job_row_bearing_floor_sf001 below.
    assert sorted(empties) == SCALE_INHERENT_EMPTY_SF0001, \
        f"empty set drifted: {sorted(empties)}"


@pytest.mark.skipif(not REF_JOB.exists(), reason="reference absent")
def test_job_row_bearing_floor_sf001(tmp_path):
    """All 113 JOB queries select real rows from the sf0.01 fixtures
    (the reference's CI gate, test/sqlite-datasets/job.test, runs all
    113 row-bearing on real IMDB).  DuckDB-only: the Spark-vs-DuckDB
    value compare over these identical files is the test above; this
    one pins the needle engineering in tools/synth_job.py so a fixture
    regression is caught as an assert, not a silent floor drop."""
    from synth_job import export_job

    export_job("/root/testdata/sf0.01", tmp_path)
    init = (REF_JOB / "initialize.sql").read_text()
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
                    f"(DELIMITER ',', HEADER false, ESCAPE '\\')")
                continue
            duck.execute(stmt)
    finally:
        os.chdir(cwd)
    empty = []
    for f in sorted(REF_JOB.glob("*.sql")):
        if f.name == "initialize.sql":
            continue
        want = duck.execute(f.read_text()).fetchall()
        if not (want and any(v is not None for v in want[0])):
            empty.append(f.stem)
    assert empty == [], f"{len(empty)} empty at sf0.01: {empty}"
