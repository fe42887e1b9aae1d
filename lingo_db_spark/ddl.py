"""Reference-dialect DDL/DML at the SQL door: CREATE TABLE with
constraint clauses, COPY ... FROM, INSERT INTO over declared tables,
and script splitting — the statement surface of the reference's own
``initialize.sql`` database-loading journey (parser.y:2851-2870 CREATE
TABLE with not-null/primary-key, :3247-3260 INSERT, :575 COPY; e.g.
``resources/sql/tpch/initialize.sql``: SET + 8 CREATE TABLEs + 8 COPYs
of '|'-delimited dbgen files).

Spark's parser rejects ``primary key (...)`` table constraints and has
no COPY statement, so `Connection.sql_stmt` routes reference-style
statements here:

  - CREATE TABLE (no USING clause) -> declared StructType + an empty
    temp view under the name; the primary key is recorded as metadata
    (the reference catalogs it the same way — it has no enforcement
    path either).  A Spark-native CREATE TABLE (with USING/LOCATION)
    still goes straight to Catalyst.
  - COPY t FROM 'f' [csv] [delimiter 'x'] [escape 'x'] [null 'x']
    [header] -> ``spark.read.csv`` with the declared schema, bound as
    the table's temp view.  LAZY: at 100 TB this is a distributed
    CSV scan feeding whatever query comes next, not a driver-side
    materialization.  dbgen's trailing delimiter (an empty extra
    token per line) is dropped by the explicit schema.
  - INSERT INTO a DECLARED table -> the VALUES/SELECT source is
    evaluated and unioned onto the view by name, missing columns
    null-filled (the reference's column-list INSERT semantics).

Everything else passes through to Spark untouched.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# type names (reference parser.y primitive types -> Spark types)
# ---------------------------------------------------------------------------

_SIMPLE_TYPES: dict[str, T.DataType] = {
    "int": T.IntegerType(), "integer": T.IntegerType(),
    "int4": T.IntegerType(),
    "bigint": T.LongType(), "int8": T.LongType(),
    "smallint": T.ShortType(), "int2": T.ShortType(),
    "bool": T.BooleanType(), "boolean": T.BooleanType(),
    "float4": T.FloatType(), "real": T.FloatType(),
    "float8": T.DoubleType(), "double": T.DoubleType(),
    "date": T.DateType(), "timestamp": T.TimestampType(),
    "text": T.StringType(), "string": T.StringType(),
}


def _parse_type(s: str) -> T.DataType | None:
    s = s.strip().lower()
    if m := re.fullmatch(r"(?:varchar|char|character(?:\s+varying)?)"
                         r"\s*(?:\(\s*\d+\s*\))?", s):
        # length is presentation metadata; CHAR stays unpadded like the
        # reference's (and DuckDB's) string-backed char
        del m
        return T.StringType()
    if m := re.fullmatch(r"(?:decimal|numeric)\s*"
                         r"(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?", s):
        p = int(m.group(1) or 10)
        sc = int(m.group(2) or 0)
        return T.DecimalType(p, sc)
    if m := re.fullmatch(r"float\s*(?:\(\s*(\d+)\s*\))?", s):
        # postgres-style float(p): p<=24 -> real, else double precision
        p = int(m.group(1) or 53)
        return T.FloatType() if p <= 24 else T.DoubleType()
    return _SIMPLE_TYPES.get(s)


# ---------------------------------------------------------------------------
# statement parsers (return None when the statement isn't theirs)
# ---------------------------------------------------------------------------

# the table name may be double-quoted (reference parser.y quoted
# identifiers — resources/sql/ssb/initialize.sql declares `"date"`)
_CREATE_RE = re.compile(
    r"^\s*create\s+table\s+(?:if\s+not\s+exists\s+)?"
    r"\"?([A-Za-z_]\w*)\"?\s*\(",
    re.IGNORECASE)
_CONSTRAINT_RE = re.compile(
    r"^(?:primary\s+key|unique|foreign\s+key|check|constraint)\b",
    re.IGNORECASE)


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` at paren depth 0, outside quotes."""
    out, depth, start, i, n = [], 0, 0, 0, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            i += 1
            while i < n and s[i] != "'":
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == sep and depth == 0:
            out.append(s[start:i])
            start = i + 1
        i += 1
    out.append(s[start:])
    return [p for p in (x.strip() for x in out) if p]


def parse_create_table(stmt: str):
    """Reference-style CREATE TABLE -> (name, StructType, primary_key
    columns) or None.  Statements with a USING clause are Spark-native
    and not ours."""
    m = _CREATE_RE.match(stmt)
    if m is None or re.search(r"\busing\b", stmt, re.IGNORECASE):
        return None
    name = m.group(1)
    # body = balanced paren span starting at the '(' the regex stopped at
    i, depth, start = m.end() - 1, 0, m.end()
    while i < len(stmt):
        if stmt[i] == "(":
            depth += 1
        elif stmt[i] == ")":
            depth -= 1
            if depth == 0:
                break
        i += 1
    if depth != 0:
        return None
    body = stmt[start:i]
    fields: list[T.StructField] = []
    pk: list[str] = []
    for item in _split_top(body):
        if _CONSTRAINT_RE.match(item):
            if pm := re.match(r"primary\s+key\s*\(([^)]*)\)", item,
                              re.IGNORECASE):
                pk = [c.strip() for c in pm.group(1).split(",")]
            continue        # unique/foreign key/check: metadata only
        toks = item.split(None, 1)
        if len(toks) != 2:
            return None
        col, rest = toks
        rest_l = rest.lower()
        nullable = "not null" not in rest_l
        type_s = re.sub(r"\b(?:not\s+null|null|primary\s+key|unique)\b",
                        "", rest, flags=re.IGNORECASE).strip()
        dt = _parse_type(type_s)
        if dt is None:
            return None
        fields.append(T.StructField(col, dt, nullable))
    if not fields:
        return None
    return name, T.StructType(fields), pk


_COPY_RE = re.compile(
    r"^\s*copy\s+\"?([A-Za-z_]\w*)\"?\s+from\s+'([^']+)'\s*(.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)


def parse_copy(stmt: str):
    """COPY t FROM 'path' [csv] [delimiter 'x'] [escape 'x'] [null 'x']
    [header] -> (table, path, options dict) or None."""
    m = _COPY_RE.match(stmt)
    if m is None:
        return None
    name, path, opt_s = m.groups()
    opts = {"sep": ",", "escape": "\\", "nullValue": None, "header": False}
    rest = opt_s.strip().strip("()")
    pos = 0
    pat = re.compile(
        r"(csv|header|delimiter|escape|null|quote)(?:\s+'((?:[^']|'')*)')?",
        re.IGNORECASE)
    while pos < len(rest):
        mm = pat.search(rest, pos)
        if mm is None:
            break
        key = mm.group(1).lower()
        val = (mm.group(2) or "").replace("''", "'")
        if key == "delimiter":
            opts["sep"] = val
        elif key == "escape":
            opts["escape"] = val
        elif key == "null":
            opts["nullValue"] = val
        elif key == "quote":
            opts["quote"] = val
        elif key == "header":
            opts["header"] = True
        pos = mm.end()
    return name, path, opts


_INSERT_RE = re.compile(
    r"^\s*insert\s+into\s+([A-Za-z_]\w*)\s*"
    r"(?:\(([^)]*)\)\s*)?(values\b.*|select\b.*|with\b.*)$",
    re.IGNORECASE | re.DOTALL)


def parse_insert(stmt: str):
    """INSERT INTO t [(cols)] VALUES ... | SELECT ... ->
    (table, cols-or-None, source SQL) or None."""
    m = _INSERT_RE.match(stmt.rstrip().rstrip(";"))
    if m is None:
        return None
    cols = ([c.strip() for c in m.group(2).split(",")]
            if m.group(2) else None)
    return m.group(1), cols, m.group(3)


# ---------------------------------------------------------------------------
# script splitting
# ---------------------------------------------------------------------------

def split_script(text: str) -> list[str]:
    """Split a SQL script into statements on top-level ';' — outside
    single quotes and $$-bodies, dropping '--' comments (the statement
    boundary rules of the reference's script loader)."""
    stmts, buf, i, n = [], [], 0, len(text)
    while i < n:
        c = text[i]
        if c == "-" and text[i:i + 2] == "--":
            j = text.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == "'":
            j = i + 1
            while j < n and text[j] != "'":
                j += 1
            buf.append(text[i:j + 1])
            i = j + 1
            continue
        if c == "$" and text[i:i + 2] == "$$":
            j = text.find("$$", i + 2)
            j = n if j < 0 else j + 2
            buf.append(text[i:j])
            i = j
            continue
        if c == ";":
            s = "".join(buf).strip()
            if s:
                stmts.append(s)
            buf = []
            i += 1
            continue
        buf.append(c)
        i += 1
    s = "".join(buf).strip()
    if s:
        stmts.append(s)
    return stmts


_QUERY_START_RE = re.compile(r"^\s*(select|with|values|from|\(|table\b)",
                             re.IGNORECASE)


def is_query(stmt: str) -> bool:
    return _QUERY_START_RE.match(stmt) is not None
