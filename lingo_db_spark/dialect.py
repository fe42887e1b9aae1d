"""Dialect shims shared by the corpus runner (tools/sqllogic.py) and the
user-facing SQL door (connection.Connection.sql): translations from the
reference's SQL dialect into constructs Spark's grammar accepts, with
semantics pinned by the reference's own 8,884-query select corpus (the
full stride-1 sweep value-checks every rewrite class against the
corpus's expected output).

  - rewrite_quantified: `x op ANY/ALL/SOME (subquery)` -> the
    SQL-standard three-valued aggregate CASE form (Spark's grammar has
    no quantified comparisons; reference parser.y binds them natively).
  - type_name_shim: postgres-style cast names (::text, ::float8,
    ::float4, ::int8, ::int4) -> Spark's names.
  - pipe_to_standard: pipe SQL (`FROM t |> stage`) -> a standard
    SELECT, used only when Spark's native |> support rejects the
    alias scoping the reference dialect allows.

NOT here: the corpus runner's `/` -> `div` rewrite — that shim is
correct only for the corpus's all-integer data, not for general SQL.
"""

from __future__ import annotations

import re

_QUANT_RE = re.compile(r"(=|<>|!=|<=|>=|<|>)\s*(ANY|ALL|SOME)\s*\(",
                       re.IGNORECASE)
_SUBQ_SPLIT_RE = re.compile(r"^\s*SELECT\s+(.*?)\s+FROM\s+(.*)$",
                            re.IGNORECASE | re.DOTALL)


_LHS_STOP_WORDS = {"and", "or", "not", "where", "when", "then", "else",
                   "on", "having", "select", "case", "in", "like",
                   "between", "is"}


def _scan_operand(sql: str, end: int) -> int:
    """Start index of the single operand ending at `end` (exclusive): an
    identifier chain, optionally a parenthesized tail (function call or
    scalar subquery) with its leading name."""
    i = end - 1
    while i >= 0 and sql[i].isspace():
        i -= 1
    if i >= 0 and sql[i] == ")":
        depth = 1
        i -= 1
        while i >= 0 and depth:
            if sql[i] == ")":
                depth += 1
            elif sql[i] == "(":
                depth -= 1
            i -= 1
    while i >= 0 and (sql[i].isalnum() or sql[i] in "._"):
        i -= 1
    return i + 1


def _scan_lhs(sql: str, end: int) -> int:
    """Start index of the full arithmetic expression ending at `end`
    (exclusive): operand, then any chain of binary `+ - * % ||` joined
    operands leftward ('a + b > ANY(...)' captures 'a + b', not just
    'b').  A leading `-`/`+` whose left neighbour is an operator,
    keyword, `(` or start-of-clause is unary and absorbed into the
    expression.  Stops at comparison operators, commas, and clause
    keywords — those delimit the predicate.  (`/` never appears here:
    to_spark_sql has already mapped it to ` div `, whose surrounding
    word chars end the scan naturally.)"""
    start = _scan_operand(sql, end)
    while True:
        j = start - 1
        while j >= 0 and sql[j].isspace():
            j -= 1
        if j < 0:
            return start
        ch = sql[j]
        if ch in "+-":
            # binary iff the token to its left is an operand end
            k = j - 1
            while k >= 0 and sql[k].isspace():
                k -= 1
            if k >= 0 and (sql[k].isalnum() or sql[k] in "._)"):
                # ...unless that "operand" is a stop keyword (WHERE -x)
                w = k
                while w >= 0 and (sql[w].isalnum() or sql[w] == "_"):
                    w -= 1
                word = sql[w + 1:k + 1].lower()
                if word in _LHS_STOP_WORDS:
                    return j            # unary sign: include it
                start = _scan_operand(sql, j)
                continue
            return j                    # unary sign: include it
        if ch in "*%":
            start = _scan_operand(sql, j)
            continue
        if ch == "|" and j > 0 and sql[j - 1] == "|":
            start = _scan_operand(sql, j - 1)
            continue
        return start


def rewrite_quantified(sql: str) -> str:
    """Rewrite `x op ANY/ALL/SOME (SELECT y FROM rest)` into the
    SQL-standard three-valued aggregate CASE form (Spark's grammar has
    no quantified comparisons; the engine covers the same semantics via
    queries/relops.subquery_all).  Matches the patterns present in the
    reference corpus; anything it cannot split fails visibly."""
    while True:
        m = _QUANT_RE.search(sql)
        if m is None:
            return sql
        op, kind = m.group(1), m.group(2).upper()
        lhs_start = _scan_lhs(sql, m.start())
        lhs = sql[lhs_start:m.start()].strip()
        # balance out the subquery body
        depth, j = 1, m.end()
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        body = sql[m.end():j - 1]
        is_any = kind in ("ANY", "SOME")
        # membership forms need no FROM split at all
        if op in ("!=", "<>") and not is_any:
            rewritten = f"({lhs}) NOT IN ({body})"
        elif op == "=" and is_any:
            rewritten = f"({lhs}) IN ({body})"
        else:
            sm = _SUBQ_SPLIT_RE.match(body)
            if sm is None:
                # FROM-less subquery (`= ALL(select 1)`): wrap it as a
                # one-column derived table so the aggregate forms below
                # apply uniformly
                yexpr, rest = "*", f"({body}) __q0(__qc0)"
            else:
                yexpr, rest = sm.group(1).strip(), sm.group(2)
            # Ordering / residual forms via LOCAL aggregates only (Spark
            # rejects aggregates mixing outer and local references):
            # x >ANY S <=> x > MIN(S); x >ALL S <=> x > MAX(S); etc.,
            # with NULL bookkeeping via COUNT(*) vs COUNT(y).
            if yexpr == "*":
                # star: alias the derived table to name its only column
                base = f"(SELECT * FROM {rest}) __q(__qc)"
                yref = "__qc"
            else:
                base = rest
                yref = f"({yexpr})"
            cnt = f"(SELECT COUNT(*) FROM {base})"
            cnt_nn = f"(SELECT COUNT({yref}) FROM {base})"
            mn = f"(SELECT MIN({yref}) FROM {base})"
            mx = f"(SELECT MAX({yref}) FROM {base})"
            x = f"({lhs})"
            if is_any:
                if op in ("<>", "!="):
                    # exists y <> x: some non-null y differs from x iff
                    # min or max differs (all-equal means both equal x)
                    rewritten = (
                        f"(CASE WHEN {cnt} = 0 THEN FALSE"
                        f" WHEN {x} IS NULL THEN CAST(NULL AS BOOLEAN)"
                        f" WHEN {mn} <> {x} OR {mx} <> {x} THEN TRUE"
                        f" WHEN {cnt_nn} < {cnt}"
                        f" THEN CAST(NULL AS BOOLEAN) ELSE FALSE END)")
                else:
                    bound = mn if op in (">", ">=") else mx
                    rewritten = (
                        f"(CASE WHEN {cnt} = 0 THEN FALSE"
                        f" WHEN {x} {op} {bound} THEN TRUE"
                        f" WHEN {x} IS NULL OR {cnt_nn} < {cnt}"
                        f" THEN CAST(NULL AS BOOLEAN) ELSE FALSE END)")
            else:
                if op == "=":
                    fail = f"({mn} <> {x} OR {mx} <> {x})"
                    ok = f"{mn} = {x}"
                else:
                    neg = {">": "<=", ">=": "<", "<": ">=", "<=": ">"}[op]
                    bound = mx if op in (">", ">=") else mn
                    fail = f"{x} {neg} {bound}"
                    ok = f"{x} {op} {bound}"
                rewritten = (
                    f"(CASE WHEN {cnt} = 0 THEN TRUE"
                    f" WHEN {x} IS NULL THEN CAST(NULL AS BOOLEAN)"
                    f" WHEN {cnt_nn} > 0 AND {fail} THEN FALSE"
                    f" WHEN {cnt_nn} = {cnt} AND {ok} THEN TRUE"
                    f" ELSE CAST(NULL AS BOOLEAN) END)")
        sql = sql[:lhs_start] + rewritten + sql[j:]


def _split_top(s: str, sep: str) -> list[str]:
    """Split on `sep` at paren depth 0."""
    out, depth, cur, i = [], 0, [], 0
    while i < len(s):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
        if depth == 0 and s.startswith(sep, i):
            out.append("".join(cur))
            cur = []
            i += len(sep)
            continue
        cur.append(s[i])
        i += 1
    out.append("".join(cur))
    return out


_JOIN_RE = re.compile(r"^(left|right|full|inner|cross|join)\b", re.IGNORECASE)


def pipe_to_standard(sql: str) -> str:
    """Fallback translation of pipe SQL (`FROM t |> stage |> ...`) into a
    standard SELECT.  Used ONLY when Spark's native |> support fails
    analysis: Spark drops pre-projection aliases after `|> SELECT`,
    while the corpus dialect (like the reference) keeps them in scope
    for later WHERE/ORDER BY.  Standard-SQL clause placement restores
    that scope; the result still value-checks against the expected
    output, so a wrong translation fails visibly."""
    s = sql.strip().rstrip(";")
    # recursively translate parenthesized sub-pipes `( from ... |> ... )`
    while True:
        m = re.search(r"\(\s*from\b", s, re.IGNORECASE)
        if m is None:
            break
        depth, j = 1, m.end() - 4  # position just after '('
        j = m.start() + 1
        k = j
        while k < len(s):
            if s[k] == "(":
                depth += 1
            elif s[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        inner = pipe_to_standard(s[j:k])
        s = s[:m.start()] + "(" + inner + ")" + s[k + 1:]
    if not re.match(r"^from\b", s, re.IGNORECASE) or "|>" not in s:
        if re.match(r"^from\b", s, re.IGNORECASE):
            return "SELECT * " + s
        return s
    stages = [st.strip() for st in _split_top(s, "|>")]
    from_parts = [stages[0]]
    select_list = "*"
    wheres: list[str] = []
    havings: list[str] = []
    group_by = order_by = limit = None
    seen_aggregate = False
    for st in stages[1:]:
        low = st.lower()
        if _JOIN_RE.match(st):
            from_parts.append(st)
        elif low.startswith("select"):
            select_list = st[len("select"):].strip()
        elif low.startswith("where"):
            # a WHERE stage AFTER an AGGREGATE stage filters the
            # aggregated rows (pipe semantics are strictly sequential)
            # — for ROLLUP/CUBE that keeps/drops different rows than a
            # pre-aggregation filter would, so it must become HAVING
            (havings if seen_aggregate else wheres).append(
                st[len("where"):].strip())
        elif low.startswith("aggregate"):
            seen_aggregate = True
            body = st[len("aggregate"):].strip()
            parts = re.split(r"\bgroup\s+by\b", body, flags=re.IGNORECASE)
            aggs = parts[0].strip()
            if len(parts) > 1:
                group_by = parts[1].strip()
                # rollup/cube keys go in the SELECT list as bare
                # columns, not as the grouping construct itself
                gm = re.fullmatch(r"(?:rollup|cube)\s*\((.*)\)\s*",
                                  group_by, re.IGNORECASE | re.DOTALL)
                sel_keys = gm.group(1).strip() if gm else group_by
                select_list = f"{sel_keys}, {aggs}"
            else:
                select_list = aggs
        elif low.startswith("order by"):
            order_by = st[len("order by"):].strip()
        elif low.startswith("limit"):
            limit = st[len("limit"):].strip()
        else:
            wheres.append(st)  # unknown stage: surfaces as a visible error
    q = f"SELECT {select_list} {' '.join(from_parts)}"
    if wheres:
        q += " WHERE " + " AND ".join(f"({w})" for w in wheres)
    if group_by:
        q += f" GROUP BY {group_by}"
    if havings:
        q += " HAVING " + " AND ".join(f"({h})" for h in havings)
    if order_by:
        q += f" ORDER BY {order_by}"
    if limit:
        q += f" LIMIT {limit}"
    return q


_TYPE_ALIASES = [
    (re.compile(r"::\s*text\b", re.IGNORECASE), "::string"),
    (re.compile(r"::\s*float8\b", re.IGNORECASE), "::double"),
    (re.compile(r"::\s*float4\b", re.IGNORECASE), "::float"),
    (re.compile(r"::\s*int8\b", re.IGNORECASE), "::bigint"),
    (re.compile(r"::\s*int4\b", re.IGNORECASE), "::int"),
]


def type_name_shim(sql: str) -> str:
    for pat, repl in _TYPE_ALIASES:
        sql = pat.sub(repl, sql)
    return sql


def quoted_ident_shim(sql: str) -> str:
    """Postgres-style double-quoted identifiers -> Spark backticks.

    The reference's bison grammar (parser.y, derived from postgres)
    treats `"name"` as a quoted identifier — never a string literal
    (strings are single-quoted) — e.g. resources/sql/tpch/11.sql's
    `as "value"`.  Spark's default parser reserves double quotes for
    strings, so a faithful translation scans outside single-quoted
    literals and rewrites each "..." span to `...` (doubled "" inside
    an identifier is the escaped quote char; `` is Spark's escape)."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":                       # string literal: copy verbatim
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i:j + 1])
            i = j + 1
        elif c == "`":                     # existing backtick identifier:
            j = i + 1                      # protected span (idempotence)
            while j < n:
                if sql[j] == "`":
                    if j + 1 < n and sql[j + 1] == "`":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i:j + 1])
            i = j + 1
        elif c == '"':                     # quoted identifier
            j = i + 1
            ident: list[str] = []
            while j < n:
                if sql[j] == '"':
                    if j + 1 < n and sql[j + 1] == '"':
                        ident.append('"')
                        j += 2
                        continue
                    break
                ident.append(sql[j])
                j += 1
            out.append("`" + "".join(ident).replace("`", "``") + "`")
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def apply_parse_shims(sql: str, parses=None) -> str:
    """The shims safe for ANY SQL (no data assumptions): quantified
    comparisons, cast type-name aliases, and double-quoted
    identifiers.  Returns the input unchanged when nothing applies.

    `parses` (optional callback str -> bool, "does Spark's grammar
    accept this?") gates the quoted-identifier shim: it is the only
    shim that can change the MEANING of a span Spark could also read
    as a string literal, so when the other shims alone already yield
    a parseable query (e.g. the original failure was an unrelated
    `= ANY(...)`), the double-quoted spans are left as the string
    literals Spark takes them for.  Without the callback the shim
    applies unconditionally (original behavior)."""
    out = type_name_shim(rewrite_quantified(sql))
    if '"' in out and (parses is None or not parses(out)):
        out = quoted_ident_shim(out)
    return out


# ---------------------------------------------------------------------------
# analysis-time shims: constructs Spark PARSES but rejects during
# analysis, where the reference dialect (postgres-derived) accepts them
# ---------------------------------------------------------------------------

_CAST_TYPE_ALIASES = {
    "float8": "DOUBLE", "float4": "FLOAT", "int8": "BIGINT",
    "int4": "INT", "int2": "SMALLINT", "text": "STRING",
}

_CAST_OPEN_RE = re.compile(r"\bCAST\s*\(", re.IGNORECASE)
_CAST_TAIL_RE = re.compile(r"\bAS\s+(\w+)\s*$", re.IGNORECASE)

# duckdb/postgres datediff('unit', a, b) -> Spark timestampdiff(unit, a, b)
_DATEDIFF_RE = re.compile(r"\bdatediff\s*\(\s*'(\w+)'\s*,", re.IGNORECASE)


def _shim_cast_types(sql: str) -> str:
    """Rewrite postgres type names ONLY in the tail position of a
    balanced `CAST( ... AS <type>)` span.  Scanning the actual CAST
    region (rather than any `AS <type>)` pattern) means a column alias
    named `text`/`int4` — e.g. the subquery `(SELECT x AS text)` — is
    never touched."""
    out: list[str] = []
    i = 0
    while True:
        m = _CAST_OPEN_RE.search(sql, i)
        if m is None:
            out.append(sql[i:])
            return "".join(out)
        depth, k = 1, m.end()
        while k < len(sql) and depth:
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
            k += 1
        if depth:                      # unbalanced: leave the tail as-is
            out.append(sql[i:])
            return "".join(out)
        inner = _shim_cast_types(sql[m.end():k - 1])   # nested CASTs
        tm = _CAST_TAIL_RE.search(inner)
        if tm and tm.group(1).lower() in _CAST_TYPE_ALIASES:
            # the AS must sit at the cast's own paren level, not inside
            # a nested subexpression like CAST((SELECT x AS t2) AS INT)
            lvl = 0
            for ch in inner[:tm.start()]:
                if ch == "(":
                    lvl += 1
                elif ch == ")":
                    lvl -= 1
            if lvl == 0:
                inner = (inner[:tm.start()] + "AS "
                         + _CAST_TYPE_ALIASES[tm.group(1).lower()])
        out.append(sql[i:m.end()])
        out.append(inner)
        out.append(")")
        i = k


def apply_analysis_shims(sql: str) -> str:
    """Shims for ANALYSIS-time rejections: postgres cast type names in
    the tail of a balanced CAST(...) span (so a column alias named
    `text` is never touched, even alias-then-')' like
    `(SELECT x AS text)`) and unit-quoted datediff (tpcxbb 22.sql).
    Returns input unchanged if nothing applies."""
    out = _shim_cast_types(sql)
    out = _DATEDIFF_RE.sub(lambda m: f"timestampdiff({m.group(1)},", out)
    return out


def lateralize(sql: str, alias: str) -> str:
    """Insert LATERAL before a FROM-list derived table that references
    the SIBLING FROM item `alias` (postgres-style implicit lateral
    scoping, which the reference's unnesting evaluates and DuckDB
    accepts; Spark requires the explicit keyword — tpcxbb 16.sql).

    Conservative textual rule: a balanced parenthesized span whose
    PRECEDING token is a comma or the FROM keyword (i.e. a FROM-list
    item, not a function argument or IN-list) and whose body contains
    `alias.` becomes `LATERAL (...)`.  First match only; the caller
    retries and falls back to the original error if Spark still
    rejects the result."""
    ref = re.compile(rf"\b{re.escape(alias)}\s*\.", re.IGNORECASE)
    for m in re.finditer(r"\(", sql):
        i = m.start()
        # preceding token must be ',' or FROM
        j = i - 1
        while j >= 0 and sql[j].isspace():
            j -= 1
        if j < 0:
            continue
        if sql[j] == ",":
            pass
        elif j >= 3 and sql[j - 3:j + 1].lower() == "from":
            pass
        else:
            continue
        depth, k = 0, i
        while k < len(sql):
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        body = sql[i:k + 1]
        # must look like a derived table, and reference the sibling
        if not re.match(r"\(\s*select\b", body, re.IGNORECASE):
            continue
        if ref.search(body):
            return sql[:i] + "LATERAL " + sql[i:]
    return sql
