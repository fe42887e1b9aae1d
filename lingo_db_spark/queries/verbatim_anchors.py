"""Driver-gated VERBATIM anchors — one per reference benchmark suite.

The reference ships every benchmark as SQL files a user runs unmodified
(resources/sql/{ssb,tpcds,job,clickbench,tpcxbb}/; its CI gate is
test/sqlite-datasets/*.test run-sql over the same files).  The pytest
journeys (tests/test_*_verbatim*.py) value-check ALL of those files at
sf0.001; these five queries put one representative per suite into the
DRIVER record, exercising the full journey end-to-end at sf0.01:

  derive suite fixtures from the testdata parquet (tools/synth_*.py)
  -> run the suite's initialize.sql VERBATIM through Connection.run_script
     (reference-dialect CREATE TABLE + '|'-delimited COPY, ddl.py)
  -> run the benchmark query text VERBATIM through Connection.sql
  -> re-alias/cast the output onto the exact-transport channel.

The DuckDB oracle re-derives each needed table INDEPENDENTLY as a
WITH-clause CTE over the driver's pre-registered parquet views (the
same derivation SQL text the exporter uses, CAST column-by-column to
the suite's declared schema so both engines bind identical types), then
runs the IDENTICAL verbatim query body over those CTEs — so the file
export, the CREATE/COPY load path, and the engine's query semantics are
all under test, while the oracle never touches the exported files.

Scale posture: COPY through the DDL door is a lazy distributed CSV scan
with a declared schema — the anchor's load step materializes nothing on
the driver; only the (bounded) query result is collected.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from lingo_db_spark.queries import register

_REF_SQL = Path("/root/reference/resources/sql")
_TOOLS = Path(__file__).resolve().parents[2] / "tools"


def _tools_importable() -> None:
    if str(_TOOLS) not in sys.path:
        sys.path.insert(0, str(_TOOLS))


def _read(suite: str, fname: str) -> str | None:
    p = _REF_SQL / suite / fname
    return p.read_text() if p.exists() else None


def _duck_type(dt) -> str:
    """Spark type (from ddl.parse_create_table's declared schema) ->
    the DuckDB type name the oracle CTE casts to, so both engines bind
    the column exactly as the suite's CREATE TABLE declares it."""
    from pyspark.sql import types as T
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    return {
        T.ByteType: "TINYINT", T.ShortType: "SMALLINT",
        T.IntegerType: "INTEGER", T.LongType: "BIGINT",
        T.FloatType: "FLOAT", T.DoubleType: "DOUBLE",
        T.StringType: "VARCHAR", T.BooleanType: "BOOLEAN",
        T.DateType: "DATE", T.TimestampType: "TIMESTAMP",
        T.TimestampNTZType: "TIMESTAMP",
    }[type(dt)]


def _declared_schemas(ddl_text: str):
    from lingo_db_spark import ddl
    out = {}
    for stmt in ddl.split_script(ddl_text):
        parsed = ddl.parse_create_table(stmt)
        if parsed is not None:
            out[parsed[0]] = parsed[1]
    return out


# Anchors whose value-checked oracle failed to construct and fell back
# to the weaker rows-only check.  MUST stay empty: tools/check_oracle.py
# reports it in the gate summary and tests/test_probes.py asserts on it
# — a verification-strength regression surfaces as a red gate, not a
# stderr line nobody reads (ADVICE r9).
DEGRADED_ANCHORS: list[tuple[str, str, str]] = []


def _cte_oracle(suite: str, ddl_fname: str, query_fname: str,
                tables: list[str], selects_fn_module: str,
                wrap: str) -> str | None:
    """Build `WITH <derived tables, declared-typed> SELECT <wrap> FROM
    (<verbatim query>) v` — the whole oracle in one DuckDB statement
    over the pre-registered base views."""
    ddl_text = _read(suite, ddl_fname)
    body = _read(suite, query_fname)
    if ddl_text is None or body is None:
        return None                    # reference absent: rows-only check
    # This runs at module import (register() decoration time) inside
    # load_all() — a construction failure must degrade THIS anchor to
    # the rows-only check, never break the whole registry import and
    # with it the driver gate.  Expected failure modes are caught
    # narrowly (KeyError: renamed/unparseable CREATE or a selects-map
    # gap; ImportError: tools not importable; AttributeError: selects
    # module drift); anything else still degrades rather than killing
    # the gate, but BOTH paths record the anchor in DEGRADED_ANCHORS,
    # which the gate summary prints and a test asserts empty.
    try:
        _tools_importable()
        import importlib
        selects = importlib.import_module(selects_fn_module).table_selects()
        declared = _declared_schemas(ddl_text)
        ctes = []
        for t in tables:
            casts = ", ".join(
                f"CAST({f.name} AS {_duck_type(f.dataType)}) AS {f.name}"
                for f in declared[t].fields)
            ctes.append(
                f'"{t}" AS (SELECT {casts} FROM ({selects[t]}) __src)')
        body = body.strip().rstrip(";").strip()
        return (f"WITH {', '.join(ctes)}\n"
                f"SELECT {wrap} FROM (\n{body}\n) v")
    except (KeyError, ImportError, AttributeError) as e:
        reason = f"{type(e).__name__}: {e}"
    except Exception as e:             # noqa: BLE001 — see above
        reason = f"UNEXPECTED {type(e).__name__}: {e}"
    import sys
    DEGRADED_ANCHORS.append((suite, query_fname, reason))
    print(f"[verbatim_anchors] {suite}/{query_fname}: oracle "
          f"construction failed ({reason}); degrading to rows-only "
          f"check", file=sys.stderr)
    return None


# Fixture exports memoized per (suite, export fn, sf_dir) for the life
# of the process.  The export derives the suite's CSV fixtures from the
# driver parquet — pure test-fixture derivation, NOT part of the journey
# under test (the reference user starts from existing files too).  The
# measured journey stays CREATE+COPY (initialize.sql through the door)
# + the verbatim query: re-deriving identical CSVs on every bench run
# only re-measures pandas.to_csv (6.9 s of a 13.7 s tpcds-anchor run).
_EXPORT_CACHE: dict[tuple[str, str, str], str] = {}


def _export_fixtures(suite: str, export_module: str, export_fn: str,
                     sf_dir: str) -> str:
    import atexit
    import importlib
    import shutil
    import tempfile
    key = (suite, export_fn, sf_dir)
    cached = _EXPORT_CACHE.get(key)
    if cached is not None and Path(cached).is_dir():
        return cached
    tmp = tempfile.mkdtemp(prefix=f"ldb_{suite}_anchor_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    getattr(importlib.import_module(export_module), export_fn)(
        sf_dir, Path(tmp))
    _EXPORT_CACHE[key] = tmp
    return tmp


def _run_verbatim(spark: SparkSession, sf_dir: str, suite: str,
                  export_module: str, export_fn: str,
                  query_fname: str) -> DataFrame:
    """Spark-side journey: export fixtures (memoized), run initialize.sql
    verbatim through the door, run the benchmark text verbatim through
    the door."""
    from lingo_db_spark.connection import Connection

    _tools_importable()
    init = _read(suite, "initialize.sql")
    body = _read(suite, query_fname)
    assert init is not None and body is not None, "reference absent"
    tmp = _export_fixtures(suite, export_module, export_fn, sf_dir)
    con = Connection(spark)
    con.run_script(init, base_dir=tmp)
    return con.sql(body)


# ---------------------------------------------------------------------------
# SSB: 21.sql — lineorder x date x part x supplier star join, GROUP BY
# d_year, p_brand1 (resources/sql/ssb/21.sql; the suite's initialize.sql
# includes the double-quoted `"date"` dimension CREATE the DDL door must
# lex).  Revenue is a DECIMAL(18,2) sum -> exact cents BIGINT transport.
# ---------------------------------------------------------------------------

_SSB_WRAP = ('CAST(d_year AS INTEGER) AS d_year, p_brand1, '
             'CAST("sum(lo_revenue)" * 100 AS BIGINT) AS revenue_cents')


@register("sql_ssb_q21_verbatim",
          _cte_oracle("ssb", "initialize.sql", "21.sql",
                      ["lineorder", "date", "part", "supplier"],
                      "synth_ssb", _SSB_WRAP))
def sql_ssb_q21_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resources/sql/ssb/21.sql byte-for-byte through the door after the
    suite's initialize.sql loads the exported star (CREATE TABLE incl.
    quoted `"date"` + '|' COPY)."""
    df = _run_verbatim(spark, sf_dir, "ssb", "synth_ssb", "export_ssb",
                       "21.sql")
    return df.selectExpr(
        "CAST(d_year AS INT) AS d_year", "p_brand1",
        "CAST(`sum(lo_revenue)` * 100 AS BIGINT) AS revenue_cents")


# ---------------------------------------------------------------------------
# TPC-DS: 3.sql — date_dim x store_sales x item, GROUP BY year/brand
# (resources/sql/tpcds/3.sql).  sum(ss_sales_price) DECIMAL -> cents.
# ---------------------------------------------------------------------------

_DS_WRAP = ("CAST(d_year AS INTEGER) AS d_year, "
            "CAST(brand_id AS INTEGER) AS brand_id, brand, "
            "CAST(sum_agg * 100 AS BIGINT) AS sum_agg_cents")


@register("sql_tpcds_q3_verbatim",
          _cte_oracle("tpcds", "initialize.sql", "3.sql",
                      ["date_dim", "store_sales", "item"],
                      "synth_tpcds", _DS_WRAP))
def sql_tpcds_q3_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resources/sql/tpcds/3.sql byte-for-byte through the door after
    the 24-table initialize.sql journey (tests/test_tpcds_verbatim.py
    value-checks all 103 variants; this anchors the suite in the driver
    record)."""
    df = _run_verbatim(spark, sf_dir, "tpcds", "synth_tpcds",
                       "export_tpcds", "3.sql")
    return df.selectExpr(
        "CAST(d_year AS INT) AS d_year", "CAST(brand_id AS INT) AS brand_id",
        "brand", "CAST(sum_agg * 100 AS BIGINT) AS sum_agg_cents")


# ---------------------------------------------------------------------------
# JOB: 1a.sql — 5-way imdb join with LIKE/NOT LIKE residuals feeding
# global MIN aggregates (resources/sql/job/1a.sql).
# ---------------------------------------------------------------------------

_JOB_WRAP = ("production_note, movie_title, "
             "CAST(movie_year AS INTEGER) AS movie_year")


@register("sql_job_1a_verbatim",
          _cte_oracle("job", "initialize.sql", "1a.sql",
                      ["company_type", "info_type", "movie_companies",
                       "movie_info_idx", "title"],
                      "synth_job", _JOB_WRAP))
def sql_job_1a_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resources/sql/job/1a.sql byte-for-byte through the door after the
    21-table IMDB initialize.sql journey (csv-escape COPY, text column
    types)."""
    df = _run_verbatim(spark, sf_dir, "job", "synth_job", "export_job",
                       "1a.sql")
    return df.selectExpr("production_note", "movie_title",
                         "CAST(movie_year AS INT) AS movie_year")


# ---------------------------------------------------------------------------
# ClickBench: 21.sql — COUNT(*) under a LIKE scan over the 105-column
# hits table (resources/sql/clickbench/21.sql; the create.sql DDL and
# the TSV load with NULLSTR are the journey under test).
# ---------------------------------------------------------------------------

_CB_WRAP = "CAST(v.n AS BIGINT) AS n"


def _cb_oracle() -> str | None:
    create = _read("clickbench", "create.sql")
    body = _read("clickbench", "21.sql")
    if create is None or body is None:
        return None
    _tools_importable()
    import importlib
    selects = importlib.import_module("synth_clickbench").table_selects()
    declared = _declared_schemas(create)
    casts = ", ".join(
        f"CAST({f.name} AS {_duck_type(f.dataType)}) AS {f.name}"
        for f in declared["hits"].fields)
    body = body.strip().rstrip(";").strip()
    return (f'WITH hits AS (SELECT {casts} FROM ({selects["hits"]}) __src)\n'
            f"SELECT {_CB_WRAP} FROM (\n{body}\n) v(n)")


@register("sql_clickbench_q21_verbatim", _cb_oracle())
def sql_clickbench_q21_verbatim(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """resources/sql/clickbench/21.sql byte-for-byte through the door
    after the 105-column create.sql DDL + TSV COPY (NULLSTR sentinel)
    journey (tests/test_clickbench_verbatim.py value-checks all 43)."""
    import importlib
    import tempfile

    from lingo_db_spark.connection import Connection

    _tools_importable()
    create = _read("clickbench", "create.sql")
    body = _read("clickbench", "21.sql")
    assert create is not None and body is not None, "reference absent"
    tmp = tempfile.mkdtemp(prefix="ldb_clickbench_anchor_")
    importlib.import_module("synth_clickbench").export_clickbench(
        sf_dir, Path(tmp))
    con = Connection(spark)
    con.sql_stmt(create)
    con.base_dir = tmp
    con.sql_stmt("copy hits from 'hits.tsv' delimiter '\t' null '\\N'")
    return con.sql(body).toDF("n").selectExpr("CAST(n AS BIGINT) AS n")


# ---------------------------------------------------------------------------
# TPCx-BB: 22.sql — inventory x item x warehouse x date_dim before/after
# pivot around a date (resources/sql/tpcxbb/22.sql).  Row-bearing at
# sf0.01 (33 groups; q12/q23/q24's click-then-buy windows go empty at
# this scale), and its unit-quoted datediff('second', ...) exercises the
# dialect.apply_analysis_shims retry inside the door.
# ---------------------------------------------------------------------------

_XBB_WRAP = ("w_warehouse_name, i_item_id, "
             "CAST(inv_before AS BIGINT) AS inv_before, "
             "CAST(inv_after AS BIGINT) AS inv_after")


@register("sql_tpcxbb_q22_verbatim",
          _cte_oracle("tpcxbb", "initialize.sql", "22.sql",
                      ["inventory", "item", "warehouse", "date_dim"],
                      "synth_tpcxbb", _XBB_WRAP))
def sql_tpcxbb_q22_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resources/sql/tpcxbb/22.sql byte-for-byte through the door after
    the suite's initialize.sql journey (DS-derived schema, +34-month
    fact window; the datediff('second', ...) spelling Spark rejects at
    analysis rides the door's shim retry)."""
    df = _run_verbatim(spark, sf_dir, "tpcxbb", "synth_tpcxbb",
                       "export_tpcxbb", "22.sql")
    return df.selectExpr("w_warehouse_name", "i_item_id",
                         "CAST(inv_before AS BIGINT) AS inv_before",
                         "CAST(inv_after AS BIGINT) AS inv_after")


# ---------------------------------------------------------------------------
# Second anchors, r9 — one per suite from the HARD families, rotating
# anchor coverage beyond the simple star joins above.
#
# JOB: 29a.sql — the 17-table chain (aka_name, complete_cast x types,
# char_name, cast_info, person_info, ...) whose needle family landed in
# r9 (tools/synth_job.py _FAM_J); global MINs over three strings.
# ---------------------------------------------------------------------------

_JOB29_TABLES = [
    "aka_name", "complete_cast", "comp_cast_type", "char_name",
    "cast_info", "company_name", "info_type", "keyword",
    "movie_companies", "movie_info", "movie_keyword", "name",
    "person_info", "role_type", "title",
]
_JOB29_WRAP = "voiced_char, voicing_actress, voiced_animation"


@register("sql_job_29a_verbatim",
          _cte_oracle("job", "initialize.sql", "29a.sql",
                      _JOB29_TABLES, "synth_job", _JOB29_WRAP))
def sql_job_29a_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resources/sql/job/29a.sql byte-for-byte through the door — the
    suite's deepest join chain (17 relations incl. both comp_cast_type
    roles and person_info), row-bearing since the r9 needle family."""
    df = _run_verbatim(spark, sf_dir, "job", "synth_job", "export_job",
                       "29a.sql")
    return df.selectExpr("voiced_char", "voicing_actress",
                         "voiced_animation")


# r13 diagnosis note (no registered twin): an ingest-to-parquet
# "amortized" variant of this anchor was built and interleave-measured
# at sf0.1 — columnar 11.0 s vs CSV-journey 10.4 s, a wash — so the
# hypothesis that the anchor's wall is CSV re-scanning is FALSE.  The
# wall is the 17-relation join chain itself over four 600k-row facts
# (execution 7.9 s with analysis+optimization at 0.25 s; AQE on/off
# identical; DuckDB runs the same oracle in 3.6 s -> ratio ~2.2x,
# engine-inherent, not a misplan).  The variant was dropped rather
# than registered: a twin that measures the same thing adds gate time,
# not information.


# ---------------------------------------------------------------------------
# TPC-DS: 51.sql — two windowed CTEs full-outer-joined, cumulative MAX
# windows over cumulative SUM windows, decimal outputs (exact cents
# transport; ORDER BY item_sk, d_date is a unique key so the LIMIT 100
# cut is deterministic in both engines).
# ---------------------------------------------------------------------------

_DS51_WRAP = (
    "CAST(item_sk AS INTEGER) AS item_sk, d_date, "
    "CAST(web_sales * 100 AS BIGINT) AS web_sales_cents, "
    "CAST(store_sales * 100 AS BIGINT) AS store_sales_cents, "
    "CAST(web_cumulative * 100 AS BIGINT) AS web_cum_cents, "
    "CAST(store_cumulative * 100 AS BIGINT) AS store_cum_cents")


@register("sql_tpcds_q51_verbatim",
          _cte_oracle("tpcds", "initialize.sql", "51.sql",
                      ["web_sales", "store_sales", "date_dim"],
                      "synth_tpcds", _DS51_WRAP))
def sql_tpcds_q51_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resources/sql/tpcds/51.sql byte-for-byte through the door: the
    fullouter + cumulative-window family (sum-over-sum windows, MAX
    frames, NULL-bearing full-join columns), all-decimal outputs riding
    the exact cents transport."""
    df = _run_verbatim(spark, sf_dir, "tpcds", "synth_tpcds",
                       "export_tpcds", "51.sql")
    return df.selectExpr(
        "CAST(item_sk AS INT) AS item_sk", "d_date",
        "CAST(web_sales * 100 AS BIGINT) AS web_sales_cents",
        "CAST(store_sales * 100 AS BIGINT) AS store_sales_cents",
        "CAST(web_cumulative * 100 AS BIGINT) AS web_cum_cents",
        "CAST(store_cumulative * 100 AS BIGINT) AS store_cum_cents")
