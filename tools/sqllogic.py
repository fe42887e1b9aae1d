"""sqllogictest runner: execute the reference's SQLite select corpus
(/root/reference/test/sqlite/select*.test — the same files the reference
gates in CI, .github/workflows/workflow-ubuntu-latest-x86_64.yml) against
Spark SQL.

The corpus is pure expression/join/subquery semantics over tiny integer
tables — thousands of generated combinations of CASE, abs(), compound
predicates, correlated EXISTS/IN, n-way joins, and quantified
comparisons.  Importing it wholesale hardens exactly the scalar/predicate
corners no hand-written test suite reaches.

Format handled (the subset present in select1-5):
  statement ok           -> DDL/DML, executed in an embedded DuckDB whose
                            tables are then snapshotted into Spark temp
                            views (exact rows + declared types — Spark
                            itself has no INSERT-into-temp-view surface)
  query <types> <sort> [label]
  ----
  <literal values | "N values hashing to <md5>">

Value formatting, sorting (nosort/rowsort/valuesort) and the md5 digest
follow the sqllogictest protocol: one value per line, NULL for nulls,
'(empty)' for empty strings, non-printables as '@', I = integer
(truncating coercion), R = '%.3f', hash = md5 of 'value\n' concatenation.

Dialect shim (documented, single): SQLite's `/` on integers is
truncating integer division; Spark's `/` always yields double.  The
corpus data is all-integer, so `/` is rewritten to Spark's `div`
(probed: both truncate toward zero) — the same choice the reference's
own SQL frontend makes by typing integer division integrally
(sql_analyzer binds `/` on ints to db.div on ints).

Usage: python tools/sqllogic.py [file ...] [--stride N] [--limit N]
"""

from __future__ import annotations

import hashlib
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORPUS_DIR = Path("/root/reference/test/sqlite")


# ---------------------------------------------------------------------------
# Parsing
# ---------------------------------------------------------------------------

def parse_records(path: Path) -> list[tuple]:
    """Yield ('stmt', sql) and ('query', types, sort, label, sql,
    expected_lines) records."""
    lines = path.read_text().splitlines()
    recs: list[tuple] = []
    i, n = 0, len(lines)
    while i < n:
        line = lines[i].strip()
        if line.startswith("statement ok"):
            i += 1
            sql: list[str] = []
            while i < n and lines[i].strip():
                sql.append(lines[i])
                i += 1
            recs.append(("stmt", "\n".join(sql)))
        elif line.startswith("query"):
            parts = line.split()
            types = parts[1]
            sort = parts[2] if len(parts) > 2 else "nosort"
            label = parts[3] if len(parts) > 3 else None
            i += 1
            sql = []
            while i < n and lines[i].strip() != "----":
                sql.append(lines[i])
                i += 1
            expected: list[str] | None = None
            if i < n:           # consume '----'
                i += 1
                expected = []
                while i < n and lines[i].strip():
                    expected.append(lines[i])
                    i += 1
            recs.append(("query", types, sort, label, "\n".join(sql),
                         expected))
        else:
            i += 1
    return recs


# ---------------------------------------------------------------------------
# Value formatting (sqllogictest protocol)
# ---------------------------------------------------------------------------

def fmt_value(v, t: str) -> str:
    if v is None:
        return "NULL"
    if t == "I":
        if isinstance(v, bool):
            return str(int(v))
        return str(int(v))          # truncates toward zero, like atoi
    if t == "R":
        return "%.3f" % float(v)
    s = str(v)
    if not s:
        return "(empty)"
    return "".join(c if " " <= c <= "~" else "@" for c in s)


def result_values(rows, types: str, sort: str) -> list[str]:
    formatted = [[fmt_value(v, t) for v, t in zip(row, types)]
                 for row in rows]
    if sort == "rowsort":
        formatted.sort()
    flat = [v for row in formatted for v in row]
    if sort == "valuesort":
        flat.sort()
    return flat


def digest(values: list[str]) -> str:
    return hashlib.md5("".join(v + "\n" for v in values).encode()).hexdigest()


_HASH_RE = re.compile(r"^(\d+) values hashing to ([0-9a-f]{32})$")


def check_expected(values: list[str], expected: list[str]) -> str | None:
    """None if match, else a short diagnostic."""
    if len(expected) == 1 and (m := _HASH_RE.match(expected[0].strip())):
        n, h = int(m.group(1)), m.group(2)
        if len(values) != n:
            return f"value count {len(values)} != {n}"
        if digest(values) != h:
            return "hash mismatch"
        return None
    if values != [e for e in expected]:
        if len(values) != len(expected):
            return f"value count {len(values)} != {len(expected)}"
        for got, want in zip(values, expected):
            if got != want:
                return f"value {got!r} != {want!r}"
    return None


# ---------------------------------------------------------------------------
# Dialect shim
# ---------------------------------------------------------------------------

def to_spark_sql(sql: str) -> str:
    """SQLite -> Spark SQL for this all-integer corpus: `/` becomes
    truncating integer `div` (no string in the corpus contains '/')."""
    return sql.replace("/", " div ")


# ---------------------------------------------------------------------------
# Execution
# ---------------------------------------------------------------------------

_DUCK_TO_SPARK = {
    "INTEGER": "int", "BIGINT": "long", "VARCHAR": "string",
    "DOUBLE": "double", "BOOLEAN": "boolean",
}


def corpus_session():
    """A LIGHT session for the 30-row corpus — deliberately NOT
    build_session: the engine confs (AQE, 32 shuffle partitions, big
    heap) are tuned for scale and add multi-second fixed cost per tiny
    query (measured 6.8 s vs 0.7 s median on this corpus).  Semantics
    under test (expression/join/subquery evaluation) are config-
    independent; UTC and ANSI-off match the engine session."""
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master("local[2]").appName("sqllogic")
            .config("spark.sql.shuffle.partitions", "1")
            .config("spark.sql.adaptive.enabled", "false")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.ansi.enabled", "false")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate())


def run_file(spark, path: Path, stride: int = 1, limit: int | None = None,
             on_fail=None) -> tuple[int, int, int]:
    """Execute one .test file.  Returns (ran, passed, failed)."""
    import duckdb

    con = duckdb.connect()
    recs = parse_records(path)
    dirty = True
    ran = passed = failed = 0
    qidx = -1
    for rec in recs:
        if rec[0] == "stmt":
            con.execute(rec[1])
            dirty = True
            continue
        qidx += 1
        if qidx % stride != 0:
            continue
        if limit is not None and ran >= limit:
            break
        if dirty:
            for (t,) in con.execute(
                    "SELECT table_name FROM information_schema.tables "
                    "WHERE table_schema = 'main'").fetchall():
                info = con.execute(f"PRAGMA table_info('{t}')").fetchall()
                schema = ", ".join(
                    f"{c[1]} {_DUCK_TO_SPARK.get(c[2].upper(), 'string')}"
                    for c in info)
                rows = con.execute(f'SELECT * FROM "{t}"').fetchall()
                # corpus tables are <=64 rows: one partition, or every
                # tiny query schedules defaultParallelism empty tasks
                (spark.createDataFrame(rows, schema).coalesce(1)
                 .createOrReplaceTempView(t))
            dirty = False
        _, types, sort, label, sql, expected = rec
        ran += 1
        try:
            rows = spark.sql(to_spark_sql(sql)).collect()
            values = result_values(rows, types, sort)
            err = check_expected(values, expected or [])
        except Exception as e:                      # noqa: BLE001
            err = f"exec error: {type(e).__name__}: {e}"
        if err is None:
            passed += 1
        else:
            failed += 1
            if on_fail:
                on_fail(path.name, qidx, sql, err)
    return ran, passed, failed


def main() -> int:
    args = [a for a in sys.argv[1:]]
    stride = 1
    limit = None
    files: list[Path] = []
    it = iter(args)
    for a in it:
        if a == "--stride":
            stride = int(next(it))
        elif a == "--limit":
            limit = int(next(it))
        else:
            files.append(Path(a))
    if not files:
        files = sorted(CORPUS_DIR.glob("select*.test"))

    spark = corpus_session()

    fails: list[tuple] = []

    def on_fail(fname, qidx, sql, err):
        fails.append((fname, qidx, err))
        if len(fails) <= 10:
            print(f"FAIL {fname}#{qidx}: {err}\n  {sql[:200]}",
                  file=sys.stderr)

    tot = [0, 0, 0]
    for f in files:
        r, p, x = run_file(spark, f, stride=stride, limit=limit,
                           on_fail=on_fail)
        tot[0] += r
        tot[1] += p
        tot[2] += x
        print(f"{f.name}: ran {r} passed {p} failed {x}", flush=True)
    print(f"TOTAL: ran {tot[0]} passed {tot[1]} failed {tot[2]}")
    return 1 if tot[2] else 0


if __name__ == "__main__":
    raise SystemExit(main())
