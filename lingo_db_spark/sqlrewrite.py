"""SELECT-list decorrelation rewrite — the correlation class Catalyst
rejects but the reference's general Neumann/Kemper unnesting evaluates
(reference src/compiler/Dialect/RelAlg/Transforms/Unnesting.cpp:18-333):
outer references in a scalar subquery's SELECT list or GROUP BY.

For additively/multiplicatively separable shapes a textual hoist closes
the gap: outer-only terms move out of the subquery, outer terms inside
MIN/MAX/SUM/AVG arguments hoist by linearity (SUM(f+c) -> SUM(f) +
c*COUNT(f), SUM(c*f) -> c*SUM(f)), GROUP BY over a per-row constant
becomes HAVING COUNT(*) > 0 (preserving the empty-group no-row
behavior), and product terms are rewritten per factor.

Used by the engine's SQL door (connection.Connection.sql retries a
rejected query through this rewrite) and by tools/sqllogic.py's corpus
runner, where every rewritten query is value-checked against the
reference corpus's expected output — the gate that keeps this rewriter
honest (sqlite-small: 154/154 pass, 13 queries flipped from
engine-unsupported by this module).
"""

from __future__ import annotations

import re


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


# ---------------------------------------------------------------------------
# SELECT-list decorrelation pre-rewrite
#
# Catalyst only accepts outer references inside a subquery's WHERE/HAVING;
# the reference's general Neumann/Kemper unnesting (Unnesting.cpp:18-333)
# also evaluates outer refs in the subquery's SELECT list and GROUP BY.
# For the shapes in the reference corpus the outer-ref parts are additively
# separable, so a textual hoist closes the gap: pull outer-only terms (and
# outer-only additive terms inside MIN/MAX/SUM/AVG arguments, by linearity)
# OUT of the subquery, leaving a purely inner subquery Spark accepts.
# Applied only as a retry after Catalyst rejects the original; the result
# still value-checks against the expected output, so a wrong hoist fails
# visibly rather than silently passing.
# ---------------------------------------------------------------------------

_SQL_KEYWORDS = {"case", "when", "then", "else", "end", "is", "null", "not",
                 "and", "or", "in", "like", "between", "distinct", "as",
                 "true", "false", "cast", "integer", "bigint", "double",
                 "varchar", "boolean", "string", "div"}
_AGG_RE = re.compile(r"^(min|max|sum|avg|count)\s*\((.*)\)$",
                     re.IGNORECASE | re.DOTALL)


def _split_additive(s: str) -> list[tuple[str, str]]:
    """Split an expression into top-level (sign, term) pairs; unary
    signs stay attached to their term."""
    terms: list[tuple[str, str]] = []
    depth, cur, sign, i = 0, [], "+", 0
    prev_tok = ""      # last non-space char seen at depth 0
    while i < len(s):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if depth == 0 and c in "+-":
            binary = bool(prev_tok) and (prev_tok.isalnum()
                                         or prev_tok in ")._'`\"")
            if binary:
                terms.append((sign, "".join(cur).strip()))
                cur, sign = [], c
                i += 1
                continue
        if not c.isspace():
            prev_tok = c
        cur.append(c)
        i += 1
    terms.append((sign, "".join(cur).strip()))
    return [(sg, t) for sg, t in terms if t]


def _alias_refs(expr: str) -> set[str]:
    expr = expr.replace("`", "")        # backticks are quoting, not syntax
    return {m.lower() for m in re.findall(r"\b([A-Za-z_]\w*)\s*\.", expr)}


def _bare_idents(expr: str) -> set[str]:
    """Identifiers not alias-qualified and not function names."""
    expr = expr.replace("`", "")        # backticks are quoting, not syntax
    out = set()
    for m in re.finditer(r"(?<![.\w])([A-Za-z_]\w*)\b(?!\s*[.(])", expr):
        w = m.group(1).lower()
        if w not in _SQL_KEYWORDS:
            out.add(w)
    return out


def _bound_aliases(subq: str) -> set[str]:
    """Alias/table names bound by the subquery's own FROM/JOIN items."""
    out: set[str] = set()
    for m in re.finditer(
            r"\b(?:from|join)\b"
            r"((?:(?!\b(?:where|group|order|having|limit|select)\b)[^()])*)",
            subq, re.IGNORECASE | re.DOTALL):
        for w in re.findall(r"\b([A-Za-z_]\w*)\b", m.group(1)):
            if w.lower() not in {"as", "on", "inner", "left", "right",
                                 "full", "outer", "cross", "join", "using"}:
                out.add(w.lower())
    return out


def _is_outer_only(term: str, bound: set[str]) -> bool:
    refs = _alias_refs(term)
    return (bool(refs) and refs.isdisjoint(bound)
            and not _bare_idents(term))


def _rewrite_one_subquery(body: str) -> str | None:
    """Decorrelate one scalar subquery body `SELECT e FROM rest`.
    Returns the replacement EXPRESSION (not re-parenthesized) or None
    if no safe rewrite applies."""
    m = re.match(r"^\s*select\s+(.*?)\s+(from\s+.*)$", body,
                 re.IGNORECASE | re.DOTALL)
    if m is None:
        return _rewrite_no_from(body)
    selexpr, rest = m.group(1), m.group(2)
    # derived tables in the subquery's own FROM bind aliases this
    # textual scoper cannot see (`FROM (SELECT 1 AS a) t` binds t);
    # hoisting against an incomplete bound-set would silently move
    # inner refs out, so bail and let the original error surface.
    fm = re.search(r"\bfrom\b(.*?)(?:\bwhere\b|\bgroup\b|\border\b"
                   r"|\bhaving\b|\blimit\b|$)", rest,
                   re.IGNORECASE | re.DOTALL)
    if fm and re.search(r"\(\s*select\b", fm.group(1), re.IGNORECASE):
        return None
    bound = _bound_aliases(body)
    # R3: GROUP BY over outer-only keys = constant grouping -> drop
    gm = re.search(r"\bgroup\s+by\s+(.*?)(\border\b|\blimit\b|$)", rest,
                   re.IGNORECASE | re.DOTALL)
    changed = False
    if gm and _is_outer_only(gm.group(1), bound):
        agg_only = bool(_AGG_RE.match(selexpr.strip()))
        if not agg_only or re.search(r"\bhaving\b", rest, re.IGNORECASE):
            return None        # non-agg select / existing HAVING: differs
        # grouping by a per-row constant = ungrouped aggregation EXCEPT
        # on empty input (grouped -> no row, ungrouped -> one row, which
        # COUNT would turn from NULL into 0).  HAVING COUNT(*) > 0
        # restores the no-row-on-empty behavior exactly.
        rest = (rest[:gm.start()] + " HAVING COUNT(*) > 0 "
                + rest[gm.end(1):])
        changed = True
    # (outer refs in the remaining WHERE are fine — Catalyst supports them)
    # COALESCE: after the HAVING COUNT(*) > 0 injection the count
    # subquery itself returns NO row (NULL) on empty input; the
    # CASE WHEN ... = 0 empty-group guards below need it to read 0 there,
    # not NULL (NULL = 0 falls to ELSE and would return the outer value
    # where the original yields NULL).
    cnt_all = f"COALESCE((SELECT COUNT(*) {rest.strip()}), 0)"
    inner_terms: list[tuple[str, str]] = []
    hoisted: list[tuple[str, str]] = []
    for sign, term in _split_additive(selexpr):
        am = _AGG_RE.match(term)
        if am and not _balanced(am.group(2)):
            am = None          # e.g. SUM(a)*SUM(b): not one aggregate
        if not am and _is_outer_only(term, bound):
            hoisted.append((sign, f"(CASE WHEN {cnt_all} = 0 THEN NULL "
                                  f"ELSE ({term}) END)"))
            changed = True
            continue
        if not am and _alias_refs(term) - bound:
            # product term: hoist outer-only factors, wrap inner
            # aggregate factors in their own scalar subqueries
            rep = _rewrite_product(term, bound, rest, cnt_all)
            if rep is None:
                return None
            hoisted.append((sign, rep))
            changed = True
            continue
        if am and _alias_refs(term) - bound:
            fn = am.group(1).lower()
            arg_terms = _split_additive(am.group(2))
            inner_arg = [(sg, t) for sg, t in arg_terms
                         if not _is_outer_only(t, bound)]
            outer_arg = [(sg, t) for sg, t in arg_terms
                         if _is_outer_only(t, bound)]
            if len(arg_terms) == 1 and fn in ("sum", "avg"):
                # multiplicative separation: SUM(c*f) = c * SUM(f),
                # AVG(c*f) = c * AVG(f) (MIN/MAX would flip on negative
                # c, so only the linear aggregates)
                facs = _split_mul(arg_terms[0][1])
                of = [f for f in facs if _is_outer_only(f, bound)]
                inf = [f for f in facs if not _is_outer_only(f, bound)]
                if of and inf and all(
                        not (_alias_refs(f) - bound) for f in inf):
                    sub = (f"(SELECT {fn}({' * '.join(inf)}) "
                           f"{rest.strip()})")
                    combined = "+" if sign == arg_terms[0][0] else "-"
                    hoisted.append(
                        (combined, f"(({') * ('.join(of)}) * {sub})"))
                    changed = True
                    continue
            if not outer_arg or fn == "count":
                return None    # outer ref not additively separable
            if not inner_arg:
                # pure-outer aggregate argument
                c = _join_terms(outer_arg)
                if fn == "sum":
                    rep = (f"(CASE WHEN {cnt_all} = 0 THEN NULL "
                           f"ELSE ({c}) * {cnt_all} END)")
                else:          # min/max/avg of a per-group constant
                    rep = (f"(CASE WHEN {cnt_all} = 0 THEN NULL "
                           f"ELSE ({c}) END)")
                hoisted.append((sign, rep))
                changed = True
                continue
            f_expr = _join_terms(inner_arg)
            c = _join_terms(outer_arg)
            inner_terms.append((sign, f"{fn}({f_expr})"))
            if fn == "sum":
                hoisted.append(
                    (sign, f"(({c}) * (SELECT COUNT({f_expr}) "
                           f"{rest.strip()}))"))
            else:              # min/max/avg shift by an additive constant
                hoisted.append((sign, f"({c})"))
            changed = True
            continue
        if _alias_refs(term) - bound:
            return None        # outer ref tangled non-additively
        inner_terms.append((sign, term))
    if not changed:
        return None
    parts = []
    if inner_terms:
        parts.append(("+", f"(SELECT {_join_terms(inner_terms)} "
                           f"{rest.strip()})"))
    parts.extend(hoisted)
    return _join_terms(parts)


def _balanced(s: str) -> bool:
    depth = 0
    for c in s:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0


def _split_mul(s: str) -> list[str]:
    """Split a term into top-level '*' factors (no '/': division is not
    commutative-separable and the corpus `div` keyword would collide)."""
    return [f.strip() for f in _split_top(s, "*") if f.strip()]


def _rewrite_product(term: str, bound: set[str], rest: str,
                     cnt_all: str) -> str | None:
    """Rewrite a non-aggregate product term mixing outer refs with inner
    aggregates, e.g. SUM(i1.i)*SUM(i): each inner-aggregate factor
    becomes its own scalar subquery, pure-outer aggregate factors become
    their per-group-constant closed form, plain outer-only factors pass
    through.  Any other factor kind -> None (not separable)."""
    facs = _split_mul(term)
    if len(facs) < 2:
        return None
    parts = []
    for f in facs:
        am = _AGG_RE.match(f)
        if am and not _balanced(am.group(2)):
            am = None
        if not am and _is_outer_only(f, bound):
            parts.append(f"({f})")
        elif am and _is_outer_only(am.group(2), bound):
            fn, c = am.group(1).lower(), am.group(2)
            if fn == "sum":
                parts.append(f"(CASE WHEN {cnt_all} = 0 THEN NULL "
                             f"ELSE ({c}) * {cnt_all} END)")
            elif fn in ("min", "max", "avg"):
                parts.append(f"(CASE WHEN {cnt_all} = 0 THEN NULL "
                             f"ELSE ({c}) END)")
            else:
                return None
        elif am and not (_alias_refs(f) - bound):
            parts.append(f"(SELECT {f} {rest.strip()})")
        elif not (_alias_refs(f) - bound) and not _bare_idents(f):
            parts.append(f"({f})")      # literal factor
        else:
            return None
    return "(" + " * ".join(parts) + ")"


def _rewrite_no_from(body: str) -> str | None:
    """Scalar subquery with NO FROM clause: one implicit row, so an
    aggregate over it is the identity (SUM/MIN/MAX/AVG of the single
    value) or presence (COUNT) — the PER-ROW semantics the reference
    corpus pins for `(SELECT SUM(i1.i))` (unnesting.test:214-218
    expects 1/2/3/NULL).  Note DuckDB disagrees: it reads the shape as
    an outer aggregate and returns one row (6), so only the reference
    corpus — the gate this rewriter is value-checked against — pins
    per-row.  Catalyst rejects the correlated reference outright, so
    the subquery wrapper is dropped term by term.  Nested subqueries
    or stray clauses -> None (not this shape)."""
    m = re.match(r"^\s*select\s+(.*)$", body, re.IGNORECASE | re.DOTALL)
    if m is None:
        return None
    selexpr = m.group(1).strip()
    if re.search(r"\(\s*select\b", selexpr, re.IGNORECASE):
        return None
    if re.search(r"\b(from|where|group|order|limit|having)\b", selexpr,
                 re.IGNORECASE):
        return None
    parts: list[tuple[str, str]] = []
    for sign, term in _split_additive(selexpr):
        am = _AGG_RE.match(term)
        if am and _balanced(am.group(2)):
            fn, arg = am.group(1).lower(), am.group(2).strip()
            if fn == "count":
                rep = ("1" if arg == "*" else
                       f"(CASE WHEN ({arg}) IS NULL THEN 0 ELSE 1 END)")
            else:
                rep = f"({arg})"
            parts.append((sign, rep))
        else:
            parts.append((sign, f"({term})"))
    return _join_terms(parts)


def _join_terms(terms: list[tuple[str, str]]) -> str:
    out = ""
    for i, (sign, t) in enumerate(terms):
        if i == 0:
            out = t if sign == "+" else f"-{t}"
        else:
            out += f" {sign} {t}"
    return out


def is_correlated_scope_gap(sql: str, alias: str) -> bool:
    """True iff `alias.<col>` is referenced inside a parenthesized
    subselect of the ORIGINAL query text that does not itself bind
    `alias` in its own (paren-free) FROM/JOIN items, while the text
    outside that subselect does bind it — the shape of Catalyst's
    correlation-scope limitation (outer references resolve one level
    only).  Checked against the original SQL, so an alias reference
    manufactured by a rewriter bug (absent from any subquery here) is
    NOT classified as a scope gap.  Shared by tools/sqllogic.py's
    engine-unsupported classifier and Connection.sql's retry gate."""
    spans: list[tuple[int, int]] = []
    for m in re.finditer(r"\(\s*select\b", sql, re.IGNORECASE):
        depth, j = 1, m.end()
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        spans.append((m.start(), j))
    if not spans:
        return False
    a = re.escape(alias)
    ref_re = re.compile(rf"\b{a}\s*\.", re.IGNORECASE)
    # tempered scan: a binding must appear in the FROM/JOIN item list
    # itself — stop at the next clause keyword so `FROM t WHERE x.c`
    # does not count as binding x.
    bind_re = re.compile(
        rf"\b(?:from|join)\b"
        rf"(?:(?!\b(?:where|group|order|having|select|limit)\b)[^()])*?"
        rf"\b(?:as\s+)?{a}\b",
        re.IGNORECASE | re.DOTALL)
    for s, e in spans:
        inner = sql[s:e]
        if ref_re.search(inner) and not bind_re.search(inner):
            if bind_re.search(sql[:s] + " " + sql[e:]):
                return True
    return False


def decorrelate_select_list(sql: str) -> str:
    """Hoist additively-separable outer references out of scalar
    subqueries Catalyst rejects (SELECT-list / GROUP BY correlation).
    Iterates to a fixpoint (bounded): unwrapping an inner no-FROM
    subquery can expose its parent as the next rewritable shape —
    `(SELECT (SELECT 42+i1.i)+i1.i)` unwraps inside-out.  Unchanged
    text means no rewrite found."""
    for _ in range(6):
        nxt = _decorrelate_once(sql)
        if nxt == sql:
            return sql
        sql = nxt
    return sql


_NONEXPR_ANYWHERE = {"from", "join", "lateral"}
_NONEXPR_ADJACENT = {"in", "exists", "union", "intersect", "except", "all",
                     "as"}
_STOP_KEYWORDS = {"select", "where", "having", "on", "when", "then", "else",
                  "by", "and", "or", "not", "distinct", "limit", "offset",
                  "between", "like", "case", "end", "values"}


def _expr_position(sql: str, s: int) -> bool:
    """True iff the `(SELECT ...)` span starting at `s` sits in scalar
    EXPRESSION position.  Derived tables (`FROM (SELECT..) t`, incl.
    comma FROM lists), IN/EXISTS predicate subqueries, CTE bodies
    (`WITH c AS (...)`), and parenthesized set-op arms must NOT go
    through the scalar-subquery rewrite — a no-FROM unwrap there turns
    `FROM (SELECT 1 AS a) t` into invalid `FROM (1 AS a) t`.  Walks
    backward over identifiers/operators and balanced paren groups to
    the governing keyword.  IN/EXISTS/AS/set-op markers only count when
    ADJACENT to the span (only whitespace between) — a non-adjacent AS
    is an alias of a preceding select-list item (`x AS a, (SELECT..)`),
    not a CTE."""
    depth, i = 0, s - 1
    adjacent = True             # nothing but whitespace seen so far
    while i >= 0:
        c = sql[i]
        if c == ")":
            depth += 1
            adjacent = False
        elif c == "(":
            if depth == 0:
                return True     # direct child of a wrapping paren: expr
            depth -= 1
        elif depth == 0 and (c.isalnum() or c == "_"):
            j = i
            while j >= 0 and (sql[j].isalnum() or sql[j] == "_"):
                j -= 1
            word = sql[j + 1:i + 1].lower()
            if word in _NONEXPR_ANYWHERE:
                return False
            if word in _NONEXPR_ADJACENT and adjacent:
                return False
            if word in _STOP_KEYWORDS:
                return True
            adjacent = False
            i = j               # identifier / alias / number: keep walking
            continue
        elif not c.isspace():
            adjacent = False
        i -= 1
    return True                 # start of statement (e.g. bare subquery)


def _decorrelate_once(sql: str) -> str:
    spans: list[tuple[int, int]] = []
    for m in re.finditer(r"\(\s*select\b", sql, re.IGNORECASE):
        depth, j = 1, m.end()
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        if not _expr_position(sql, m.start()):
            continue
        spans.append((m.start(), j))
    # innermost = spans contained in another; rewrite right-to-left so
    # indices stay valid, skipping spans that contain an already-edited one
    edited: list[tuple[int, int]] = []
    for s, e in sorted(spans, key=lambda p: (-p[0], p[1])):
        if any(s <= es and ee <= e for es, ee in edited):
            continue
        body = sql[s + 1:e - 1]
        rep = _rewrite_one_subquery(body)
        if rep is not None:
            sql = sql[:s] + "(" + rep + ")" + sql[e:]
            edited.append((s, e))
    return sql


