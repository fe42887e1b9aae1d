"""Python-language SQL UDFs (functions/pyudf.py) — the reference's
ENABLE_PYTHON surface, gated by test/sqlite-small-python/
python-udfs.test (CI workflow-ubuntu-latest-x86_64.yml:376-384): the
``$$`` body is executed and registered as an Arrow-batched pandas UDF
under the SQL name."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

from lingo_db_spark.functions import pyudf

REPO = Path(__file__).resolve().parent.parent
SUITE = Path("/root/reference/test/sqlite-small-python/python-udfs.test")


def test_compile_basic():
    name, scalar, ret, n = pyudf.compile_py_function(
        "CREATE OR REPLACE FUNCTION py_add_one(x int) RETURNS int AS $$\n"
        "def py_add_one(x):\n    return x + 1\n$$ LANGUAGE python;")
    assert (name, ret, n) == ("py_add_one", "int", 1)
    assert scalar(41) == 42
    # NULL in (under every pandas encoding), NULL out
    assert scalar(None) is None
    assert scalar(float("nan")) is None
    # declared-type coercion: a float-encoded nullable int behaves int
    assert scalar(3.0) == 4


def test_compile_language_first_order_and_fallback_name():
    # LANGUAGE before AS, and a body whose function name differs from
    # the SQL name (single-function fallback)
    name, scalar, ret, n = pyudf.compile_py_function(
        "CREATE FUNCTION doubled(x bigint) RETURNS bigint "
        "LANGUAGE python AS $$\ndef twice(v):\n    return v * 2\n$$;")
    assert name == "doubled" and scalar(21) == 42


def test_compile_rejects_malformed():
    with pytest.raises(ValueError):
        pyudf.compile_py_function(
            "CREATE FUNCTION f(x blob) RETURNS int AS $$\n"
            "def f(x):\n    return 1\n$$ LANGUAGE python;")
    with pytest.raises(ValueError):
        pyudf.compile_py_function(
            "CREATE FUNCTION f(x int) RETURNS int AS $$\nx = 1\n$$ "
            "LANGUAGE python;")     # no function defined


def test_registered_udf_end_to_end(spark):
    pyudf.register_py_function(
        spark,
        "CREATE OR REPLACE FUNCTION py_rev_upper(s varchar) "
        "RETURNS varchar AS $$\n"
        "def py_rev_upper(s):\n    return s[::-1].upper()\n"
        "$$ LANGUAGE python;")
    rows = spark.sql(
        "SELECT py_rev_upper(v) AS r FROM VALUES ('ab'), (NULL), ('xyz') "
        "AS t(v) ORDER BY r NULLS FIRST").collect()
    assert [r.r for r in rows] == [None, "BA", "ZYX"]


def test_connection_door_create_function(spark):
    """sql_stmt intercepts CREATE FUNCTION ... LANGUAGE python like the
    reference connection does when built with ENABLE_PYTHON."""
    from lingo_db_spark.connection import Connection
    con = Connection(spark)
    con.sql_stmt(
        "CREATE OR REPLACE FUNCTION py_sq(x int) RETURNS int AS $$\n"
        "def py_sq(x):\n    return x * x\n$$ LANGUAGE python;")
    assert con.sql("SELECT py_sq(7) AS v").collect()[0].v == 49


@pytest.mark.skipif(not SUITE.exists(), reason="reference corpus absent")
def test_sqllogic_python_udf_corpus():
    """python-udfs.test end-to-end through tools/sqllogic.py —
    full-file attestation 10/10 (int/float8/bool/varchar/date
    signatures, two-arg, WHERE-position, NULL propagation py-9)."""
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "sqllogic.py"), str(SUITE)],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    tail = [ln for ln in out.stdout.splitlines() if ln.startswith("TOTAL")]
    assert tail, out.stdout[-2000:] + out.stderr[-2000:]
    p = tail[0].split()
    ran, passed, failed = int(p[2]), int(p[4]), int(p[6])
    assert (ran, passed, failed) == (10, 10, 0)
