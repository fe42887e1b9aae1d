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
from lingo_db_spark import tpch_domains as dom
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


def test_insert_arity_semantics(spark):
    """INSERT with NO column list and fewer VALUES than declared
    columns fills positionally and NULL-fills the tail (postgres
    semantics: missing trailing columns take their default, NULL
    here); MORE values than declared columns is an error, never a
    silent truncation."""
    import pytest
    con = Connection(spark)
    con.sql_stmt("create table ar_t (a int, b varchar(5), c int)")
    con.sql_stmt("insert into ar_t values (1, 'x')")   # c -> NULL
    assert [(r.a, r.b, r.c) for r in con.table("ar_t").collect()] == \
        [(1, "x", None)]
    with pytest.raises(Exception):
        con.sql_stmt("insert into ar_t values (1, 'x', 2, 99)")
    assert con.table("ar_t").count() == 1              # nothing slipped in


def test_insert_column_list_case_insensitive(spark):
    """SQL identifiers are case-insensitive in the reference dialect:
    `INSERT INTO t (A)` against a table declared with column `a` must
    insert into `a` (not silently NULL-fill it), and an unknown column
    name must raise — never corrupt data quietly."""
    import pytest
    con = Connection(spark)
    con.sql_stmt("create table ci_t (a int, b varchar(5))")
    con.sql_stmt("insert into ci_t (A, B) values (1, 'x')")
    con.sql_stmt("insert into ci_t (B) values ('y')")
    rows = sorted(((r.a, r.b) for r in con.table("ci_t").collect()),
                  key=lambda t: (t[0] is None, t[0]))
    assert rows == [(1, "x"), (None, "y")]
    with pytest.raises(ValueError, match="unknown column"):
        con.sql_stmt("insert into ci_t (nope) values (1)")


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
# values cancel out of the comparison.  Columns the verbatim benchmark
# queries FILTER on are mapped deterministically onto the real dbgen
# value domains (lingo_db_spark/tpch_domains.py) so 'GERMANY' / 'PROMO%'
# / 'MED BOX' / phone country codes select real rows instead of
# vacuously-matching empty sets.
_EXPORTS = {
    "part": f"p_partkey, {dom.part_name_sql()} AS p_name, "
            "'Manufacturer#' || (p_partkey % 5 + 1) AS p_mfgr, "
            f"p_brand, {dom.part_type_sql()} AS p_type, p_size, "
            f"{dom.part_container_sql()} AS p_container, "
            "p_retailprice, 'pc' || p_partkey AS p_comment",
    "region": f"r_regionkey, {dom.region_name_sql()} AS r_name, "
              "'rc' || r_regionkey AS r_comment",
    "nation": f"n_nationkey, {dom.nation_name_sql()} AS n_name, "
              f"{dom.nation_region_sql()} AS n_regionkey, "
              "'nc' || n_nationkey AS n_comment",
    "supplier": "s_suppkey, s_name, 'addr' || s_suppkey AS s_address, "
                f"{dom.supplier_nation_sql()} AS s_nationkey, "
                f"{dom.phone_sql(dom.supplier_nation_sql(), 's_suppkey')} "
                "AS s_phone, s_acctbal, "
                # q16 greps s_comment for '%Customer%Complaints%'
                "CASE s_suppkey % 10 WHEN 0 THEN "
                "'xCustomer noisyComplaintsx' ELSE 'sc' || s_suppkey END "
                "AS s_comment",
    "customer": "c_custkey, c_name, 'addr' || c_custkey AS c_address, "
                f"c_nationkey, {dom.phone_sql('c_nationkey', 'c_custkey')} "
                "AS c_phone, c_acctbal, c_mktsegment, "
                "'cc' || c_custkey AS c_comment",
    # the synthetic date range is 1995-2001; dbgen's is 1992-1998 and
    # the verbatim queries filter on 1993/1994 literals — shift 3 years
    # dbgen never assigns orders to custkeys divisible by 3 (q22's
    # NOT EXISTS population); nudge those onto the next key
    "orders": "o_orderkey, o_custkey + CASE WHEN o_custkey % 3 = 0 "
              "THEN 1 ELSE 0 END AS o_custkey, o_orderstatus, "
              "o_totalprice, "
              "CAST(o_orderdate - INTERVAL 3 YEAR AS DATE) "
              "AS o_orderdate, o_orderpriority, "
              "'Clerk#' || (o_orderkey % 100) AS o_clerk, "
              "0 AS o_shippriority, "
              # q13 excludes o_comment like '%special%requests%'
              "CASE o_orderkey % 7 WHEN 0 THEN "
              "'special handling requests' ELSE 'oc' || o_orderkey END "
              "AS o_comment",
    # l_linenumber regenerated: the synthetic parquet has duplicate
    # (l_orderkey, l_linenumber) pairs and DuckDB enforces the declared
    # primary key on its side of the journey.  commit/receipt dates are
    # jittered per row so q4/q12/q21's date inequalities split real
    # true/false populations instead of a constant offset.  l_suppkey is
    # remapped onto one of the part's two partsupp_sql suppliers — the
    # dbgen referential invariant q20's correlated sum depends on.
    "lineitem": "l_orderkey, l_partkey, "
                f"{dom.lineitem_suppkey_sql()} AS l_suppkey, "
                "ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY "
                "l_linenumber, l_partkey, l_suppkey) AS l_linenumber, "
                "l_quantity, l_extendedprice, l_discount, l_tax, "
                "l_returnflag, l_linestatus, "
                "CAST(l_shipdate - INTERVAL 3 YEAR AS DATE) AS l_shipdate, "
                "CAST(l_shipdate - INTERVAL 3 YEAR AS DATE) + "
                "CAST((l_orderkey * 31 + "
                "l_partkey) % 60 - 30 AS INTEGER) AS l_commitdate, "
                "CAST(l_shipdate - INTERVAL 3 YEAR AS DATE) + "
                "CAST((l_suppkey * 17 + "
                "l_orderkey) % 30 AS INTEGER) AS l_receiptdate, "
                f"{dom.ship_instruct_sql('l_orderkey + l_partkey')} "
                "AS l_shipinstruct, "
                f"{dom.ship_mode_sql('l_orderkey * 7 + l_partkey')} "
                "AS l_shipmode, "
                "'lc' || l_orderkey AS l_comment",
}


def _export_tbls(dest: Path) -> None:
    con = duckdb.connect()
    # the lineitem projection's suppkey remap and partsupp_sql both
    # take the supplier count via a scalar subquery — register the
    # views before the COPY loop
    con.execute(f"CREATE VIEW part AS FROM read_parquet("
                f"'{SF_DIR}/part.parquet')")
    con.execute(f"CREATE VIEW supplier AS FROM read_parquet("
                f"'{SF_DIR}/supplier.parquet')")
    for t, proj in _EXPORTS.items():
        con.execute(
            f"COPY (SELECT {proj} FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet') ORDER BY 1) TO "
            f"'{dest}/{t}.tbl' (DELIMITER '|', HEADER false)")
    con.execute(
        f"COPY (SELECT * FROM ({dom.partsupp_sql()}) ORDER BY 1, 2) TO "
        f"'{dest}/partsupp.tbl' (DELIMITER '|', HEADER false)")


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
def test_verbatim_initialize_and_all_22_queries(spark, tmp_path):
    """resources/sql/tpch/initialize.sql runs UNMODIFIED through
    Connection.run_script, then ALL 22 of the reference's own benchmark
    files (resources/sql/tpch/1.sql .. 22.sql — the exact text a
    reference user runs today) run UNMODIFIED through Connection.sql;
    DuckDB executes the same script (minus the engine-settings SET) and
    the same query text on the same files.  The dbgen-domain export
    mapping makes most queries row-bearing even at sf0.001 — the test
    asserts a floor on how many, so a domain regression that silently
    empties the comparisons fails loudly."""
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

    mismatches, row_bearing = [], 0
    for i in range(1, 23):
        qtext = (REF_TPCH / f"{i}.sql").read_text()
        got = [tuple(r) for r in con.sql(qtext).collect()]
        want = duck.execute(qtext).fetchall()
        if not _rows_equal(got, want):
            mismatches.append((f"{i}.sql", got[:3], want[:3]))
        if want:
            row_bearing += 1
    assert mismatches == []
    # all 22 row-bearing at sf0.001/sf0.01/sf0.1 (the lineitem suppkey
    # remap keeps q20's correlated-sum population alive at every SF)
    assert row_bearing == 22, f"only {row_bearing}/22 row-bearing"
    # sanity: the journey loaded real rows
    assert con.table("lineitem").count() == \
        duck.execute("select count(*) from lineitem").fetchone()[0] > 0


@pytest.mark.skipif(not Path("/root/reference/resources/sql").exists(),
                    reason="reference absent")
def test_all_remaining_initialize_scripts_run(spark):
    """Every other dataset the reference ships in resources/sql/ whose
    surface is DDL-only (taxi, uni) or a schema variant (ssb_simplified)
    initializes verbatim through the door — with this, every
    initialize.sql in the reference's resources/sql tree is exercised
    (tpch/ssb/tpcds/job/tpcxbb/clickbench have full query journeys)."""
    base = Path("/root/reference/resources/sql")
    con = Connection(spark)
    ran = 0
    for name in ("taxi", "uni", "ssb_simplified", "test"):
        init = base / name / "initialize.sql"
        if not init.exists():
            continue
        for stmt in ddl.split_script(init.read_text()):
            low = stmt.lower()
            if low.startswith("set ") or low.startswith("copy"):
                continue            # COPY needs the dataset files
            con.sql_stmt(stmt)
        ran += 1
    assert ran >= 3
    # taxi is declared-empty (its COPY needs the external dataset);
    # uni's initialize also INSERTs the classic Kemper dataset rows
    assert con.sql("select count(*) as c from taxi_rides").collect()[0].c == 0
    assert con.sql("select count(*) as c from professoren").collect()[0].c == 7
    assert con.sql(
        "select count(*) as c from hoeren h, studenten s "
        "where h.matrnr = s.matrnr").collect()[0].c > 0


@pytest.mark.skipif(not REF_TPCH.exists(), reason="reference absent")
def test_door_q4_q21_monotone_exists_rewrite_kills_fact_hash_builds(
        spark, tmp_path):
    """The r10 library rewrites reach the SQL door (r10 verdict missing
    #1): the verbatim 4.sql/21.sql through Connection.sql must plan NO
    left-semi/anti join (whose build side would be the lineitem fact —
    the shape the sf10 study measured at 2.9/3.3 s) — the monotone-
    EXISTS scale rewrite turns them into per-key scalar aggregates,
    which Catalyst decorrelates into aggregate + join.  Value equality
    is covered by test_verbatim_initialize_and_all_22_queries (same
    door, same fixtures, DuckDB side-by-side)."""
    from conftest import explain_str
    _export_tbls(tmp_path)
    con = Connection(spark)
    con.run_script((REF_TPCH / "initialize.sql").read_text(),
                   base_dir=str(tmp_path))
    for q in ("4", "21"):
        con.last_rewritten_sql = None
        df = con.sql((REF_TPCH / f"{q}.sql").read_text())
        assert con.last_rewritten_sql is not None, f"{q}.sql: no rewrite"
        assert "exists" not in con.last_rewritten_sql.lower().replace(
            "not exists", "")
        p = explain_str(df, "formatted")
        assert "LeftSemi" not in p, f"{q}.sql still plans a semi join"
        assert "LeftAnti" not in p, f"{q}.sql still plans an anti join"
        assert "BroadcastNestedLoopJoin" not in p
    # q21's two EXISTS share (lineitem, l_orderkey-correlation), so they
    # must FUSE into one pre-decorrelated derived table: a single
    # 4-function aggregate over lineitem (min/max x plain/late-CASE),
    # the relalg.groupjoin shape — not one aggregate per subquery.
    assert "__exq0" in con.last_rewritten_sql
    assert "Functions [4]" in p


def test_door_exists_rewrite_null_corner_matches_spark(spark):
    """The NULL corner where DuckDB 1.0.0's EXISTS diverges from the
    standard (see test_exists_rewrite_property): Spark implements the
    STANDARD reading — `EXISTS(... AND t.a != o.e)` with o.e NULL has
    no witness, so NOT EXISTS keeps the row — and the door's rewrite
    must return exactly Spark's own un-rewritten answer."""
    import os
    spark.createDataFrame([(0, 0)], "k INT, a INT") \
        .createOrReplaceTempView("exn_t")
    spark.createDataFrame([(0, None)], "k INT, e INT") \
        .createOrReplaceTempView("exn_o")
    q = ("select o.k, o.e from exn_o o where not exists "
         "(select * from exn_t t where t.k = o.k and t.a != o.e)")
    plain = [tuple(r) for r in spark.sql(q).collect()]
    assert plain == [(0, None)]      # the standard reading
    con = Connection(spark)
    con.last_rewritten_sql = None
    through_door = [tuple(r) for r in con.sql(q).collect()]
    assert con.last_rewritten_sql is not None
    assert through_door == plain
    # and the opt-out env var really turns the rewrite off
    os.environ["LINGODB_SCALE_REWRITES"] = "0"
    try:
        con.last_rewritten_sql = None
        off = [tuple(r) for r in con.sql(q).collect()]
        assert con.last_rewritten_sql is None and off == plain
    finally:
        del os.environ["LINGODB_SCALE_REWRITES"]


@pytest.mark.skipif(not REF_TPCH.exists(), reason="reference absent")
def test_door_correlated_in_rewrite_kills_fact_hash_build(
        spark, tmp_path):
    """r12: the scale-rewrite class extends to positive correlated
    `IN (subquery)` — the same algebra as monotone EXISTS with the
    membership as one more equality correlation.  A correlated-IN
    over the lineitem-sized side must NOT plan a left-semi join
    (fact-side hash build); the rewrite yields a per-key scalar
    aggregate that Catalyst decorrelates into aggregate + join.
    Value semantics are pinned by test_correlated_in_membership
    (spec evaluator) and the in_membership_priority_repeat registered
    query (DuckDB oracle)."""
    from conftest import explain_str
    _export_tbls(tmp_path)
    con = Connection(spark)
    con.run_script((REF_TPCH / "initialize.sql").read_text(),
                   base_dir=str(tmp_path))
    # "the same customer used this order's clerk on ANOTHER order":
    # membership (o2.o_clerk = o1.o_clerk) + correlation
    # (o2.o_custkey = o1.o_custkey) + monotone residual (<> extract)
    q = ("select count(*) as c from orders o1 "
         "where o1.o_clerk in (select o2.o_clerk from orders o2 "
         "where o2.o_custkey = o1.o_custkey "
         "and o2.o_orderkey <> o1.o_orderkey)")
    con.last_rewritten_sql = None
    df = con.sql(q)
    assert con.last_rewritten_sql is not None, "IN rewrite did not fire"
    assert " in (" not in con.last_rewritten_sql.lower()
    p = explain_str(df, "formatted")
    assert "LeftSemi" not in p, "still plans a semi join"
    assert "BroadcastNestedLoopJoin" not in p
    assert "HashAggregate" in p
    # the rewritten plan must agree with Catalyst's native IN plan
    native = spark.sql(q).collect()[0].c
    assert df.collect()[0].c == native


def test_door_not_in_rewrite_requires_declared_notnull(spark):
    """r13 (verdict item 6): NOT IN widens into the scale rewrite ONLY
    when the probe and member columns are catalog-provably non-null
    (declared NOT NULL / PRIMARY KEY — the reference's
    InferNotNullConditions.cpp feeding the mark-join simplification).
    Then it collapses to NOT EXISTS: no null-aware anti join in the
    plan, values identical to Catalyst's native NOT IN.  Without the
    declaration the door must leave the text alone."""
    from conftest import explain_str
    con = Connection(spark)
    con.sql_stmt("create table nn_t (k int not null, a int not null)")
    con.sql_stmt("insert into nn_t (k, a) values (1, 1), (1, 2), (2, 5)")
    con.sql_stmt("create table nn_o (k int not null, e int not null)")
    con.sql_stmt("insert into nn_o (k, e) values (1, 1), (1, 3), "
                 "(2, 5), (3, 7)")
    q = ("select o.k, o.e from nn_o o where o.e not in "
         "(select t.a from nn_t t where t.k = o.k)")
    con.last_rewritten_sql = None
    df = con.sql(q)
    assert con.last_rewritten_sql is not None, "NOT IN rewrite no-fire"
    assert "not in" not in con.last_rewritten_sql.lower()
    p = explain_str(df, "formatted")
    assert "LeftAnti" not in p and "ExistenceJoin" not in p
    got = sorted((r.k, r.e) for r in df.collect())
    native = sorted((r.k, r.e) for r in spark.sql(q).collect())
    # (1,1): 1 in {1,2} -> out; (2,5): 5 in {5} -> out; (1,3)/(3,7) kept
    assert got == native == [(1, 3), (3, 7)]
    # nullable twin: same query over undeclared (nullable) views must
    # NOT rewrite — three-valued NOT IN stays with Catalyst
    spark.createDataFrame([(1, 1), (1, 2), (2, 5)], "k int, a int") \
        .createOrReplaceTempView("nul_t")
    spark.createDataFrame([(1, 1), (1, 3), (2, 5)], "k int, e int") \
        .createOrReplaceTempView("nul_o")
    q2 = ("select o.k, o.e from nul_o o where o.e not in "
          "(select t.a from nul_t t where t.k = o.k)")
    con.last_rewritten_sql = None
    con.sql(q2)
    assert con.last_rewritten_sql is None, \
        "NOT IN rewrote without a non-null proof"


@pytest.mark.skipif(not REF_TPCH.exists(), reason="reference absent")
def test_door_multi_table_exists_rewrite(spark, tmp_path):
    """r12: EXISTS over a comma-list FROM (fact joins dim inside the
    subquery — the TPC-DS q10/q35 shape) joins the scale-rewrite
    class as singleton WHERE-form scalar aggregates (never fusion /
    CASE-form: that would move the join conjunct out of WHERE and
    cross-join the FROM items).  Catalyst decorrelates the correlated
    scalar aggregate into a per-key aggregate over the join — the
    fact side gets map-side partial aggregation before the shuffle
    instead of a fact-sized semi-join build.  Values pinned vs
    Spark's native EXISTS; NULL corners in
    test_multi_table_exists_body (spec evaluator)."""
    from conftest import explain_str
    _export_tbls(tmp_path)
    con = Connection(spark)
    con.run_script((REF_TPCH / "initialize.sql").read_text(),
                   base_dir=str(tmp_path))
    # the BETWEEN residual pins the r12 BETWEEN-aware AND-split: its
    # `and` is part of the expression, not a conjunction (the TPC-DS
    # q10/q35 bodies' d_moy between 4 and 4+3)
    q = ("select c_name from customer c "
         "where exists (select * from orders o, lineitem l "
         "where o.o_custkey = c.c_custkey "
         "and l.l_orderkey = o.o_orderkey "
         "and l.l_receiptdate > l.l_commitdate "
         "and o.o_totalprice between 1000 and 200000)")
    con.last_rewritten_sql = None
    df = con.sql(q)
    assert con.last_rewritten_sql is not None, "rewrite did not fire"
    assert "exists" not in con.last_rewritten_sql.lower()
    p = explain_str(df, "formatted")
    assert "LeftSemi" not in p and "ExistenceJoin" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "HashAggregate" in p
    got = sorted(r.c_name for r in df.collect())
    want = sorted(r.c_name for r in spark.sql(q).collect())
    assert got == want and len(got) > 0


def test_scale_rewrite_never_reexecutes_dml(spark):
    """r12 adversarial review: Connection.sql eagerly executes command
    statements at analysis time, so _scale_rewrite re-running a
    rewritten INSERT...SELECT would apply the DML TWICE.  The gate
    must restrict the rewrite to bare SELECT/WITH statements —
    exactly one row set may land."""
    spark.sql("DROP TABLE IF EXISTS dml_gate_t")
    spark.sql("DROP TABLE IF EXISTS dml_gate_z")
    spark.createDataFrame([(1, 1), (1, 4), (2, 7)], "k INT, a INT") \
        .createOrReplaceTempView("dml_gate_src")
    spark.sql("CREATE TABLE dml_gate_z (k INT) USING parquet")
    con = Connection(spark)
    try:
        con.sql("insert into dml_gate_z "
                "select o.k from dml_gate_src o where o.a in "
                "(select t.a from dml_gate_src t where t.k = o.k "
                "and t.a > 0)")
        got = spark.sql("select count(*) as c from dml_gate_z") \
            .first().c
        assert got == 3, f"{got} rows landed — DML executed twice"
    finally:
        spark.sql("DROP TABLE IF EXISTS dml_gate_z")


def test_scale_rewrite_never_reexecutes_cte_prefixed_dml(spark):
    """r13 (ADVICE high): Spark accepts CTE-prefixed DML — `WITH x AS
    (...) INSERT INTO ...` — which starts with `with` and so passed the
    r12 leading-keyword gate; the rewrite retry would re-run the
    INSERT.  The gate now classifies by the MAIN statement keyword
    with the depth-0 CTE list skipped."""
    spark.sql("DROP TABLE IF EXISTS dml_gate_w")
    spark.createDataFrame([(1, 1), (1, 4), (2, 7)], "k INT, a INT") \
        .createOrReplaceTempView("dml_gate_src2")
    spark.sql("CREATE TABLE dml_gate_w (k INT) USING parquet")
    con = Connection(spark)
    try:
        con.sql("with src (k, a) as (select k, a from dml_gate_src2) "
                "insert into dml_gate_w "
                "select o.k from src o where exists "
                "(select 1 from src t where t.k = o.k and t.a > 3)")
        got = spark.sql("select count(*) as c from dml_gate_w") \
            .first().c
        # single execution: all three src rows have an a>3 sibling on
        # their key ((1,4) covers k=1; (2,7) covers k=2) -> 3 rows.
        # A re-executed INSERT would land 6.
        assert got == 3, f"{got} rows landed — CTE-prefixed DML " \
                         f"executed twice"
    finally:
        spark.sql("DROP TABLE IF EXISTS dml_gate_w")


def test_main_statement_keyword_classifier():
    """Unit arms for sqlrewrite.main_statement_keyword: the gate that
    decides whether the scale rewrite may retry a statement."""
    from lingo_db_spark.sqlrewrite import main_statement_keyword as k
    assert k("SELECT 1") == "select"
    assert k("  -- title\n-- more\nselect 1") == "select"
    assert k("(select 1) union all (select 2)") == "("
    assert k("WITH a AS (select 1) SELECT * FROM a") == "select"
    assert k("with recursive a as (select 1 union all select 2) "
             "select * from a") == "select"
    assert k("with a (x) as (select 1), b as (select * from a) "
             "select * from b") == "select"
    # the hazard class: CTE-prefixed DML must NOT classify as a query
    assert k("WITH a AS (select 1) INSERT INTO t SELECT * FROM a") \
        == "insert"
    assert k("with a as (select 1) create table t as "
             "select * from a") == "create"
    # literals / comments containing keywords can't confuse the walk
    assert k("with a as (select ' insert ' x) select * from a "
             "-- insert") == "select"
    # `--` INSIDE a literal is not a comment: a DML on the same line
    # must still classify as DML (the two-regex compose-order bug —
    # stripping comments before blanking strings truncated the line)
    assert k("with a as (select 'x -- y' c) insert into t "
             "select * from a") == "insert"
    assert k("with a as (select 'x -- y' c) select * from a") \
        == "select"
    # block comments are comments
    assert k("/* title */ select 1") == "select"
    assert k("with a as (select 1) /* note */ insert into t "
             "select * from a") == "insert"
    # a quote inside a comment does not open a literal
    assert k("-- don't\nselect 1") == "select"
    # malformed CTE shapes classify as '' (refused, never rewritten)
    assert k("with a select 1") == ""
    assert k("with a as (select 1") == ""


def test_copy_plan_cache_never_serves_stale_file(spark, tmp_path):
    """The r14 lazy-plan caches in connection.py must be invisible:
    re-running the same CREATE+COPY script after the CSV file is
    REWRITTEN must read the new contents (the cache key carries
    mtime+size), and the cached empty CREATE relation must not leak
    rows between connections."""
    from lingo_db_spark.connection import Connection
    p = tmp_path / "t.csv"
    p.write_text("1|a\n2|b\n")
    script = ("CREATE TABLE t (k INTEGER NOT NULL, v VARCHAR);"
              "COPY t FROM 't.csv' DELIMITER '|';")
    con = Connection(spark)
    con.run_script(script, base_dir=str(tmp_path))
    assert {r.k for r in con.table("t").collect()} == {1, 2}
    # same size, different content+mtime; and a different size rewrite
    import os
    import time as _t
    _t.sleep(0.01)
    p.write_text("3|c\n4|d\n")
    os.utime(p)
    con2 = Connection(spark)
    con2.run_script(script, base_dir=str(tmp_path))
    assert {r.k for r in con2.table("t").collect()} == {3, 4}
    p.write_text("5|e\n")
    con3 = Connection(spark)
    con3.run_script(script, base_dir=str(tmp_path))
    assert {r.k for r in con3.table("t").collect()} == {5}
    # CREATE without COPY on a fresh connection: still empty
    con4 = Connection(spark)
    con4.run_script("CREATE TABLE t (k INTEGER NOT NULL, v VARCHAR);")
    assert con4.table("t").count() == 0
