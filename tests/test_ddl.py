"""Reference-dialect DDL/COPY door (lingo_db_spark/ddl.py) and the
verbatim database-loading journey: the reference's OWN
resources/sql/tpch/initialize.sql (SET + CREATE TABLE with primary
keys + COPY of '|'-delimited dbgen files) runs unmodified through
Connection.run_script, then the reference's own benchmark .sql files
run unmodified through Connection.sql — value-checked against DuckDB
executing the exact same script + query text over the exact same
files."""

from __future__ import annotations

import os
from pathlib import Path

import duckdb
import pytest
from pyspark.sql import types as T

from lingo_db_spark import ddl
from lingo_db_spark.connection import Connection

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
REF_TPCH = Path("/root/reference/resources/sql/tpch")


# ---------------------------------------------------------------------------
# unit: statement parsers
# ---------------------------------------------------------------------------

def test_parse_create_table_constraints_and_types():
    out = ddl.parse_create_table("""
        create table part (
            p_partkey     integer        not null,
            p_name        varchar(55)    not null,
            p_retail      decimal(12, 2) not null,
            p_when        date,
            p_flag        bool,
            primary key (p_partkey)
        );""")
    assert out is not None
    name, schema, pk = out
    assert name == "part" and pk == ["p_partkey"]
    got = {f.name: (f.dataType, f.nullable) for f in schema.fields}
    assert got["p_partkey"] == (T.IntegerType(), False)
    assert got["p_name"] == (T.StringType(), False)
    assert got["p_retail"] == (T.DecimalType(12, 2), False)
    assert got["p_when"] == (T.DateType(), True)
    assert got["p_flag"] == (T.BooleanType(), True)


def test_parse_create_table_leaves_spark_native_alone():
    assert ddl.parse_create_table(
        "CREATE TABLE t (k INT) USING parquet LOCATION '/x'") is None


def test_parse_copy_options():
    name, path, opts = ddl.parse_copy(
        "copy test from 't.csv' csv escape '\\' delimiter '|' null '';")
    assert (name, path) == ("test", "t.csv")
    assert opts["sep"] == "|" and opts["escape"] == "\\"
    assert opts["nullValue"] == ""
    name, _, opts = ddl.parse_copy("copy part from 'part.tbl' delimiter '|'")
    assert name == "part" and opts["sep"] == "|"


def test_parse_insert_and_split_script():
    t, cols, src = ddl.parse_insert(
        "INSERT into test(a, b) values (1, 'x'), (2, 'y;z');")
    assert t == "test" and cols == ["a", "b"]
    assert src.lower().startswith("values")
    stmts = ddl.split_script(
        "set persist=1;\n-- a comment; with ; inside\n"
        "create table t(a int);\n"
        "insert into t values (1), (2);\n"
        "CREATE FUNCTION f(x int) RETURNS int AS $$\n"
        "def f(x):\n    return x  # ; stays\n$$ LANGUAGE python;\n"
        "select ';' , a from t")
    assert len(stmts) == 5
    assert stmts[0] == "set persist=1"
    assert "# ; stays" in stmts[3]
    assert stmts[4].startswith("select ';'")


# ---------------------------------------------------------------------------
# door: CREATE + COPY + INSERT end-to-end on the Spark session
# ---------------------------------------------------------------------------

def test_create_copy_insert_door(spark, tmp_path):
    (tmp_path / "w.tbl").write_text("1|ada|\n2|bob|\n")
    con = Connection(spark)
    con.sql_stmt("create table w (k integer not null, "
                 "name varchar(10) not null, primary key (k));")
    assert con.primary_keys["w"] == ["k"]
    assert con.sql("select * from w").count() == 0      # declared, empty
    con.sql_stmt(f"copy w from '{tmp_path}/w.tbl' delimiter '|'")
    assert sorted((r.k, r.name) for r in con.table("w").collect()) == \
        [(1, "ada"), (2, "bob")]
    con.sql_stmt("insert into w(k) values (3)")          # missing col -> null
    rows = {r.k: r.name for r in con.table("w").collect()}
    assert rows == {1: "ada", 2: "bob", 3: None}


# ---------------------------------------------------------------------------
# the verbatim journey
# ---------------------------------------------------------------------------

# the reference initialize.sql declares full dbgen schemas; our synthetic
# parquet is a subset, so missing columns are synthesized at export time —
# both engines then read the IDENTICAL exported files, so the synthetic
# values cancel out of the comparison.
_EXPORTS = {
    "part": "p_partkey, p_name, 'mfgr#' || (p_partkey % 5) AS p_mfgr, "
            "p_brand, p_type, p_size, 'cont' || (p_partkey % 7) AS "
            "p_container, p_retailprice, 'pc' || p_partkey AS p_comment",
    "region": "r_regionkey, r_name, 'rc' || r_regionkey AS r_comment",
    "nation": "n_nationkey, n_name, n_regionkey, "
              "'nc' || n_nationkey AS n_comment",
    "supplier": "s_suppkey, s_name, 'addr' || s_suppkey AS s_address, "
                "s_nationkey, 'ph' || s_suppkey AS s_phone, s_acctbal, "
                "'sc' || s_suppkey AS s_comment",
    "customer": "c_custkey, c_name, 'addr' || c_custkey AS c_address, "
                "c_nationkey, 'ph' || c_custkey AS c_phone, c_acctbal, "
                "c_mktsegment, 'cc' || c_custkey AS c_comment",
    "orders": "o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
              "CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority, "
              "'clerk' || (o_orderkey % 100) "
              "AS o_clerk, 0 AS o_shippriority, 'oc' || o_orderkey AS "
              "o_comment",
    # l_linenumber regenerated: the synthetic parquet has duplicate
    # (l_orderkey, l_linenumber) pairs and DuckDB enforces the declared
    # primary key on its side of the journey
    "lineitem": "l_orderkey, l_partkey, l_suppkey, "
                "ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY "
                "l_linenumber, l_partkey, l_suppkey) AS l_linenumber, "
                "l_quantity, l_extendedprice, l_discount, l_tax, "
                "l_returnflag, l_linestatus, "
                "CAST(l_shipdate AS DATE) AS l_shipdate, "
                "CAST(l_shipdate + INTERVAL 2 DAY AS DATE) AS l_commitdate, "
                "CAST(l_shipdate + INTERVAL 5 DAY AS DATE) AS l_receiptdate, "
                "'NONE' AS l_shipinstruct, 'TRUCK' AS l_shipmode, "
                "'lc' || l_orderkey AS l_comment",
}


def _export_tbls(dest: Path) -> None:
    con = duckdb.connect()
    for t, proj in _EXPORTS.items():
        con.execute(
            f"COPY (SELECT {proj} FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet') ORDER BY 1) TO "
            f"'{dest}/{t}.tbl' (DELIMITER '|', HEADER false)")
    con.execute(
        f"COPY (SELECT p_partkey AS ps_partkey, (p_partkey % 10) + 1 AS "
        f"ps_suppkey, p_size * 10 AS ps_availqty, "
        f"ROUND(p_retailprice / 2, 2) AS ps_supplycost, 'psc' || p_partkey "
        f"AS ps_comment FROM read_parquet('{SF_DIR}/part.parquet') "
        f"ORDER BY 1) TO '{dest}/partsupp.tbl' "
        f"(DELIMITER '|', HEADER false)")


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


@pytest.mark.skipif(not REF_TPCH.exists(), reason="reference absent")
def test_verbatim_initialize_and_queries(spark, tmp_path):
    """resources/sql/tpch/initialize.sql runs UNMODIFIED through
    Connection.run_script; 1.sql / 4.sql / 6.sql run UNMODIFIED through
    Connection.sql; DuckDB executes the same script (minus the
    engine-settings SET) and query text on the same files."""
    _export_tbls(tmp_path)
    init = (REF_TPCH / "initialize.sql").read_text()

    con = Connection(spark)
    con.run_script(init, base_dir=str(tmp_path))
    assert con.primary_keys["lineitem"] == ["l_orderkey", "l_linenumber"]

    duck = duckdb.connect()
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        for stmt in ddl.split_script(init):
            if stmt.lower().startswith("set "):
                continue        # engine-specific session setting
            if (cp := ddl.parse_copy(stmt)) is not None:
                # pin DuckDB's CSV sniffer: with the bare option form it
                # auto-detects a header and silently eats the first row
                duck.execute(
                    f"COPY {cp[0]} FROM '{cp[1]}' "
                    f"(DELIMITER '{cp[2]['sep']}', HEADER false)")
                continue
            duck.execute(stmt)
    finally:
        os.chdir(cwd)

    for qf in ("1.sql", "4.sql", "6.sql"):
        qtext = (REF_TPCH / qf).read_text()
        got = [tuple(r) for r in con.sql(qtext).collect()]
        want = duck.execute(qtext).fetchall()
        assert _rows_equal(got, want), (qf, got[:3], want[:3])
    # sanity: the journey loaded real rows
    assert con.table("lineitem").count() == \
        duck.execute("select count(*) from lineitem").fetchone()[0] > 0
