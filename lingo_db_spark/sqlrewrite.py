"""SELECT-list decorrelation rewrite — the correlation classes Catalyst
rejects but the reference's general Neumann/Kemper unnesting evaluates
(reference src/compiler/Dialect/RelAlg/Transforms/Unnesting.cpp:18-333):
outer references in a scalar subquery's SELECT list, GROUP BY, HAVING,
or join-ON condition, and correlation nested two subquery levels deep.

Rewrites, applied to a fixpoint:
- additive/multiplicative term hoisting: outer-only terms move out of
  the subquery; outer terms inside MIN/MAX/SUM/AVG arguments hoist by
  linearity (SUM(f+c) -> SUM(f) + c*COUNT(f), SUM(c*f) -> c*SUM(f));
  COUNT(f+c) -> CASE WHEN c IS NULL THEN 0 ELSE COUNT(f) END;
- GROUP BY over a per-row-constant (outer) key -> HAVING COUNT(*) > 0
  (preserving the empty-group no-row behavior);
- GROUP BY inner keys + HAVING that pins every key to an outer
  expression -> the pins move to WHERE (the group collapses to at most
  one) + HAVING COUNT(*) > 0;
- aggregate extraction: in an ungrouped subquery whose leftover
  expression references ONLY outer scope, each inner-only AGG(...)
  becomes its own scalar subquery and the whole expression hoists
  (closes `(SELECT (SUM(i)+i1.i)/2 FROM ...)` shapes);
- INNER-join ON conjuncts carrying outer references (inside a
  subquery) or subqueries (at top level) move to WHERE — equivalent
  for inner joins, and exactly the positions Catalyst rejects;
- LATERAL hoist: a two-level-deep correlated ungrouped-aggregate
  subquery is pulled into `LEFT JOIN LATERAL (...) ON true` at the
  outer level, leaving only one-level correlations behind.

An optional `columns_of(table) -> list[str] | None` resolver classifies
BARE identifiers (no alias qualifier) as inner/outer by schema; without
it bare identifiers conservatively block hoisting.

Used by the engine's SQL door (connection.Connection.sql retries a
rejected query through this rewrite) and by tools/sqllogic.py's corpus
runner, where every rewritten query is value-checked against the
reference corpus's expected output — the gate that keeps this rewriter
honest (sqlite-small: 164/164 pass).
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


def _split_top_and(s: str) -> list[str]:
    """Split a predicate on top-level AND (case-insensitive, word
    boundaries).  BETWEEN-aware (r12): the AND that closes a depth-0
    `[not] between lo and hi` is part of the BETWEEN expression, not a
    conjunction — `d_moy between 4 and 4+3` must stay ONE conjunct
    (the TPC-DS q10/q35 bodies; previously the split produced a bare
    `4+3` fragment and downstream parsing had to bail)."""
    out, depth, cur, i = [], 0, [], 0
    pending_between = 0
    n = len(s)

    def _word(at: int, w: str) -> bool:
        return (s[at:at + len(w)].lower() == w
                and (at == 0 or not (s[at - 1].isalnum()
                                     or s[at - 1] == "_"))
                and (at + len(w) >= n
                     or not (s[at + len(w)].isalnum()
                             or s[at + len(w)] == "_")))

    while i < n:
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if depth == 0 and _word(i, "between"):
            pending_between += 1
        if depth == 0 and _word(i, "and"):
            if pending_between:
                pending_between -= 1
            else:
                out.append("".join(cur))
                cur = []
                i += 3
                continue
        cur.append(c)
        i += 1
    out.append("".join(cur))
    return [p.strip() for p in out if p.strip()]


# ---------------------------------------------------------------------------
# Term classification
# ---------------------------------------------------------------------------

_SQL_KEYWORDS = {"case", "when", "then", "else", "end", "is", "null", "not",
                 "and", "or", "in", "like", "between", "distinct", "as",
                 "true", "false", "cast", "integer", "bigint", "double",
                 "varchar", "boolean", "string", "div",
                 # structural keywords: never data references
                 "select", "from", "where", "group", "order", "by",
                 "having", "limit", "offset", "on", "join", "inner",
                 "outer", "left", "right", "full", "cross", "lateral",
                 "union", "intersect", "except", "exists", "any", "all",
                 "some", "asc", "desc", "nulls", "first", "last", "using",
                 "natural", "over", "partition"}
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


def _strip_parens(s: str) -> str:
    """Remove redundant WHOLE-expression parens: '((a+b))' -> 'a+b';
    '(a)+(b)' is left alone (the wrapping parens are not a single
    group)."""
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        inner = s[1:-1]
        if not _balanced(inner):
            break
        s = inner.strip()
    return s


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
            r"((?:(?!\b(?:where|group|order|having|limit|select|on)\b)"
            r"[^()])*)",
            subq, re.IGNORECASE | re.DOTALL):
        for w in re.findall(r"\b([A-Za-z_]\w*)\b", m.group(1)):
            if w.lower() not in {"as", "on", "inner", "left", "right",
                                 "full", "outer", "cross", "join", "using"}:
                out.add(w.lower())
    return out


_FROM_ITEM_KEYWORDS = {"as", "on", "inner", "left", "right", "full",
                       "outer", "cross", "join", "using", "natural",
                       "semi", "anti", "lateral"}


def _from_tables(subq: str) -> set[str]:
    """TABLE-NAME tokens of `subq`'s FROM/JOIN items: the first
    identifier of each comma- or JOIN-separated item (later tokens are
    aliases).  Distinct from _bound_aliases, which unions tables AND
    aliases for scoping."""
    out: set[str] = set()
    for m in re.finditer(
            r"\b(?:from|join)\b"
            r"((?:(?!\b(?:where|group|order|having|limit|select|on)\b)"
            r"[^()])*)",
            subq, re.IGNORECASE | re.DOTALL):
        for part in re.split(r",|\bjoin\b", m.group(1),
                             flags=re.IGNORECASE):
            for w in re.findall(r"\b([A-Za-z_]\w*)\b", part):
                if w.lower() not in _FROM_ITEM_KEYWORDS:
                    out.add(w.lower())
                    break       # first non-keyword ident = the table
    return out


def _inner_columns(body: str, columns_of) -> set[str] | None:
    """Union of column names of the tables bound in `body`'s FROM, via
    the optional schema resolver.  None unless EVERY table token
    resolves: on partial resolution a bare column of the unresolved
    table would be misclassified as outer and silently hoisted
    (`SELECT MIN(x + y) FROM t1, other` with only t1 known rebinds y
    to the outer row), so partial knowledge keeps the conservative
    bare-ident behavior instead."""
    if columns_of is None:
        return None
    tables = _from_tables(body)
    if not tables:
        return None
    cols: set[str] = set()
    for tok in tables:
        try:
            c = columns_of(tok)
        except Exception:               # noqa: BLE001
            c = None
        if not c:
            return None
        cols |= {str(x).lower() for x in c}
    return cols


def _has_outer(term: str, bound: set[str],
               inner_cols: set[str] | None) -> bool:
    if _alias_refs(term) - bound:
        return True
    return bool(inner_cols is not None
                and (_bare_idents(term) - inner_cols))


def _is_outer_only(term: str, bound: set[str],
                   inner_cols: set[str] | None = None) -> bool:
    refs = _alias_refs(term)
    bare = _bare_idents(term)
    if refs & bound:
        return False
    if inner_cols is None:
        return bool(refs) and not bare
    if bare & inner_cols:
        return False
    return bool(refs or bare)


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


# ---------------------------------------------------------------------------
# ON -> WHERE moves (INNER joins only — exactly equivalent there)
# ---------------------------------------------------------------------------

_NON_INNER_RE = re.compile(r"\b(left|right|full|cross|semi|anti|natural)\b",
                           re.IGNORECASE)
_CLAUSE_RE = re.compile(r"\b(where|group|order|having|limit|union"
                        r"|intersect|except)\b", re.IGNORECASE)


def _top_find(text: str, regex: re.Pattern, start: int = 0) -> int:
    """Index of the first depth-0 match of `regex` in text, or -1."""
    depth = 0
    for m in regex.finditer(text):
        depth = text.count("(", 0, m.start()) - text.count(")", 0, m.start())
        if depth == 0 and m.start() >= start:
            return m.start()
    return -1


def _move_on_conjuncts(rest: str, should_move) -> str | None:
    """Move ON conjuncts selected by `should_move(conjunct)` from
    INNER-join ON clauses into WHERE.  `rest` starts at FROM.  Returns
    the transformed rest or None when nothing applies / joins are not
    all inner."""
    end = _top_find(rest, _CLAUSE_RE)
    region, tail = (rest, "") if end < 0 else (rest[:end], rest[end:])
    if re.search(r"\bjoin\b", region, re.IGNORECASE) is None:
        return None
    if _NON_INNER_RE.search(_blank_parens(region)):
        return None
    on_re = re.compile(r"\bon\b", re.IGNORECASE)
    join_re = re.compile(r"\b(join|inner)\b", re.IGNORECASE)
    moved: list[str] = []
    out: list[str] = []
    i = 0
    blanked = _blank_parens(region)
    while True:
        m = on_re.search(blanked, i)
        if m is None:
            out.append(region[i:])
            break
        nxt = join_re.search(blanked, m.end())
        cond_end = nxt.start() if nxt else len(region)
        # a top-level comma after ON starts a new FROM item, not a
        # conjunct: `FROM a JOIN b ON p, c` must not fold `, c` into p
        cpos = blanked.find(",", m.end())
        if 0 <= cpos < cond_end:
            cond_end = cpos
        cond = region[m.end():cond_end]
        keep, mv = [], []
        for c in _split_top_and(cond):
            (mv if should_move(c) else keep).append(c)
        moved.extend(mv)
        out.append(region[i:m.end()])
        out.append(" " + (" AND ".join(f"({c})" for c in keep)
                          if keep else "1=1") + " ")
        i = cond_end
    if not moved:
        return None
    new_region = "".join(out)
    add = " AND ".join(f"({c})" for c in moved)
    wm = re.search(r"\bwhere\b", tail, re.IGNORECASE)
    if wm is not None and _top_find(tail, re.compile(r"\bwhere\b",
                                                    re.IGNORECASE)) >= 0:
        wpos = _top_find(tail, re.compile(r"\bwhere\b", re.IGNORECASE))
        tail = tail[:wpos + 5] + f" ({add}) AND " + tail[wpos + 5:]
        return new_region + tail
    return new_region + f" WHERE {add} " + tail


def _blank_parens(text: str) -> str:
    """Replace paren-group interiors with spaces (same length) so
    depth-0 regex scans can't match inside them."""
    out = list(text)
    depth = 0
    for i, c in enumerate(text):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            continue
        if depth > 0 and c != "(":
            out[i] = " "
    return "".join(out)


def _on_subquery_to_where(sql: str) -> str:
    """Top-level pass: INNER-join ON conjuncts that CONTAIN a subquery
    (Catalyst: UNSUPPORTED_CORRELATED_SCALAR_SUBQUERY in join
    conditions) move to WHERE.  `FROM a JOIN b ON (SELECT ...)` ->
    `... ON 1=1 WHERE (SELECT ...)`."""
    fpos = _top_find(sql, re.compile(r"\bfrom\b", re.IGNORECASE))
    if fpos < 0:
        return sql
    rest = sql[fpos:]
    moved = _move_on_conjuncts(
        rest, lambda c: re.search(r"\(\s*select\b", c, re.IGNORECASE))
    if moved is None:
        return sql
    return sql[:fpos] + moved


# ---------------------------------------------------------------------------
# Scalar-subquery body rewrite
# ---------------------------------------------------------------------------

def _rewrite_one_subquery(body: str, columns_of=None) -> str | None:
    """Decorrelate one scalar subquery body `SELECT e FROM rest`.
    Returns the replacement EXPRESSION (not re-parenthesized) or None
    if no safe rewrite applies."""
    sm = re.match(r"^\s*select\s+", body, re.IGNORECASE)
    if sm is None:
        return None
    # split at the DEPTH-0 FROM: the old non-greedy regex grabbed a FROM
    # inside a nested subquery (`SELECT CASE WHEN (SELECT .. FROM ..)`)
    # and hoisted against a garbage parse.
    fpos = _top_find(body, re.compile(r"\bfrom\b", re.IGNORECASE), sm.end())
    if fpos < 0:
        return _rewrite_no_from(body)
    selexpr, rest = body[sm.end():fpos].strip(), body[fpos:]
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
    inner_cols = _inner_columns(body, columns_of)
    changed = False
    # INNER-join ON conjuncts with outer refs are rejected by Catalyst
    # ("Cannot generate code ... outer()"); for inner joins ON == WHERE,
    # so move them.
    moved = _move_on_conjuncts(
        rest, lambda c: _has_outer(c, bound, inner_cols)
        or re.search(r"\(\s*select\b", c, re.IGNORECASE))
    if moved is not None:
        rest = moved
        changed = True
    empty_is_null = False   # does the (rewritten) subquery yield NO row
    #                         (NULL scalar) on empty input?
    # GROUP BY inner keys + HAVING pinning EVERY key to an outer
    # expression: the pins are group-key predicates, so they move to
    # WHERE; the group then collapses to at most one, and
    # HAVING COUNT(*) > 0 preserves the no-group-on-empty behavior.
    # Searched on the paren-blanked text so the clause match can't
    # splice inside a nested predicate subquery's own GROUP BY/HAVING
    # (indices map 1:1 — _blank_parens preserves length).
    blanked_rest = _blank_parens(rest)
    ghm = re.search(r"\bgroup\s+by\s+(.*?)\bhaving\b(.*?)"
                    r"(?=\border\b|\blimit\b|$)", blanked_rest,
                    re.IGNORECASE | re.DOTALL)
    if ghm and _AGG_RE.match(selexpr.strip()):
        keys = {re.sub(r"\s+", "", k).lower().replace("`", "")
                for k in _split_top(rest[ghm.start(1):ghm.end(1)], ",")
                if k.strip()}
        conjs = _split_top_and(rest[ghm.start(2):ghm.end(2)])
        pinned: set[str] = set()
        ok = bool(keys) and bool(conjs)
        for c in conjs:
            sides = _split_eq(c)
            if sides is None:
                ok = False
                break
            ln = re.sub(r"\s+", "", sides[0]).lower().replace("`", "")
            rn = re.sub(r"\s+", "", sides[1]).lower().replace("`", "")
            if ln in keys and _is_outer_only(sides[1], bound, inner_cols):
                pinned.add(ln)
            elif rn in keys and _is_outer_only(sides[0], bound, inner_cols):
                pinned.add(rn)
            else:
                ok = False
                break
        if ok and pinned == keys:
            pre = rest[:ghm.start()]
            post = rest[ghm.end():]
            add = " AND ".join(f"({c})" for c in conjs)
            glue = (" AND " if re.search(r"\bwhere\b", pre, re.IGNORECASE)
                    else " WHERE ")
            rest = pre.rstrip() + glue + add + " HAVING COUNT(*) > 0 " + post
            changed = True
            empty_is_null = True
    # GROUP BY over outer-only keys = constant grouping -> drop
    # (depth-0 anchored, same reasoning as above)
    blanked_rest = _blank_parens(rest)
    gm = re.search(r"\bgroup\s+by\s+(.*?)(\border\b|\blimit\b|$)",
                   blanked_rest, re.IGNORECASE | re.DOTALL)
    if gm and _is_outer_only(rest[gm.start(1):gm.end(1)], bound,
                             inner_cols):
        agg_only = bool(_AGG_RE.match(selexpr.strip()))
        if not agg_only or re.search(r"\bhaving\b", blanked_rest,
                                     re.IGNORECASE):
            return None        # non-agg select / existing HAVING: differs
        # grouping by a per-row constant = ungrouped aggregation EXCEPT
        # on empty input (grouped -> no row, ungrouped -> one row, which
        # COUNT would turn from NULL into 0).  HAVING COUNT(*) > 0
        # restores the no-row-on-empty behavior exactly.
        rest = (rest[:gm.start()] + " HAVING COUNT(*) > 0 "
                + rest[gm.end(1):])
        changed = True
        empty_is_null = True
    out = _additive_hoist(selexpr, rest, bound, inner_cols, changed,
                          empty_is_null)
    if out is not None:
        return out
    return _agg_extract(selexpr, rest, bound, inner_cols)


def _split_eq(c: str) -> tuple[str, str] | None:
    """Split a conjunct on its single top-level '=' (not <=, >=, <>,
    !=, ==)."""
    depth = 0
    pos = -1
    for i, ch in enumerate(c):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "=" and depth == 0:
            if i > 0 and c[i - 1] in "<>!=":
                continue
            if i + 1 < len(c) and c[i + 1] == "=":
                continue
            if pos >= 0:
                return None
            pos = i
    if pos < 0:
        return None
    return c[:pos].strip(), c[pos + 1:].strip()


def _additive_hoist(selexpr: str, rest: str, bound: set[str],
                    inner_cols: set[str] | None, changed: bool,
                    empty_is_null: bool) -> str | None:
    """The separable-term hoist over the subquery's SELECT expression.
    Returns the replacement expression or None."""
    # COALESCE: after a HAVING COUNT(*) > 0 injection the count
    # subquery itself returns NO row (NULL) on empty input; the
    # CASE WHEN ... = 0 empty-group guards below need it to read 0
    # there, not NULL (NULL = 0 falls to ELSE and would return the
    # outer value where the original yields NULL).
    cnt_all = f"COALESCE((SELECT COUNT(*) {rest.strip()}), 0)"
    inner_terms: list[tuple[str, str]] = []
    hoisted: list[tuple[str, str]] = []
    for sign, term in _split_additive(selexpr):
        am = _AGG_RE.match(term)
        if am and not _balanced(am.group(2)):
            am = None          # e.g. SUM(a)*SUM(b): not one aggregate
        if not am and _is_outer_only(term, bound, inner_cols):
            hoisted.append((sign, f"(CASE WHEN {cnt_all} = 0 THEN NULL "
                                  f"ELSE ({term}) END)"))
            changed = True
            continue
        if not am and _has_outer(term, bound, inner_cols):
            # product term: hoist outer-only factors, wrap inner
            # aggregate factors in their own scalar subqueries
            rep = _rewrite_product(term, bound, rest, cnt_all, inner_cols)
            if rep is None:
                return None
            hoisted.append((sign, rep))
            changed = True
            continue
        if am and _has_outer(term, bound, inner_cols):
            fn = am.group(1).lower()
            arg_terms = _split_additive(_strip_parens(am.group(2)))
            inner_arg = [(sg, t) for sg, t in arg_terms
                         if not _is_outer_only(t, bound, inner_cols)]
            outer_arg = [(sg, t) for sg, t in arg_terms
                         if _is_outer_only(t, bound, inner_cols)]
            if len(arg_terms) == 1 and fn in ("sum", "avg"):
                # multiplicative separation: SUM(c*f) = c * SUM(f),
                # AVG(c*f) = c * AVG(f) (MIN/MAX would flip on negative
                # c, so only the linear aggregates)
                facs = _split_mul(arg_terms[0][1])
                of = [f for f in facs
                      if _is_outer_only(f, bound, inner_cols)]
                inf = [f for f in facs
                       if not _is_outer_only(f, bound, inner_cols)]
                if of and inf and all(
                        not _has_outer(f, bound, inner_cols) for f in inf):
                    sub = (f"(SELECT {fn}({' * '.join(inf)}) "
                           f"{rest.strip()})")
                    combined = "+" if sign == arg_terms[0][0] else "-"
                    hoisted.append(
                        (combined, f"(({') * ('.join(of)}) * {sub})"))
                    changed = True
                    continue
            if fn == "count" and outer_arg:
                # COUNT(f + c) counts rows where f+c IS NOT NULL =
                # 0 when the outer constant c is NULL, else COUNT(f).
                c = _join_terms(outer_arg)
                if inner_arg:
                    f_expr = _join_terms(inner_arg)
                    body_cnt = (f"COALESCE((SELECT COUNT({f_expr}) "
                                f"{rest.strip()}), 0)")
                else:
                    body_cnt = cnt_all
                rep = (f"(CASE WHEN ({c}) IS NULL THEN 0 "
                       f"ELSE {body_cnt} END)")
                if empty_is_null:
                    rep = (f"(CASE WHEN {cnt_all} = 0 THEN NULL "
                           f"ELSE {rep} END)")
                hoisted.append((sign, rep))
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
        if _has_outer(term, bound, inner_cols):
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


def _rewrite_product(term: str, bound: set[str], rest: str,
                     cnt_all: str,
                     inner_cols: set[str] | None = None) -> str | None:
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
        if not am and _is_outer_only(f, bound, inner_cols):
            parts.append(f"({f})")
        elif am and _is_outer_only(am.group(2), bound, inner_cols):
            fn, c = am.group(1).lower(), am.group(2)
            if fn == "sum":
                parts.append(f"(CASE WHEN {cnt_all} = 0 THEN NULL "
                             f"ELSE ({c}) * {cnt_all} END)")
            elif fn in ("min", "max", "avg"):
                parts.append(f"(CASE WHEN {cnt_all} = 0 THEN NULL "
                             f"ELSE ({c}) END)")
            else:
                return None
        elif am and not _has_outer(f, bound, inner_cols):
            parts.append(f"(SELECT {f} {rest.strip()})")
        elif not _has_outer(f, bound, inner_cols) and not _bare_idents(f):
            parts.append(f"({f})")      # literal factor
        else:
            return None
    return "(" + " * ".join(parts) + ")"


def _agg_extract(selexpr: str, rest: str, bound: set[str],
                 inner_cols: set[str] | None) -> str | None:
    """Ungrouped aggregate extraction: when every AGG(...) argument is
    inner-only and the LEFTOVER expression references only outer scope,
    each aggregate becomes its own uncorrelated scalar subquery and the
    whole SELECT expression hoists out.  Exact for ungrouped subqueries
    (they always yield exactly one row).  Closes
    `(SELECT (SUM(i)+i1.i)/2 FROM integers WHERE i=1)`
    (unnesting.test#34) where the outer term is trapped under a
    non-distributable operator."""
    if re.search(r"\bgroup\s+by\b|\bhaving\b", rest, re.IGNORECASE):
        return None
    if re.search(r"\(\s*select\b", selexpr, re.IGNORECASE):
        return None                     # nested subquery: too opaque
    pieces: list[str] = []
    last = 0
    n_aggs = 0
    for m in re.finditer(r"\b(min|max|sum|avg|count)\s*\(", selexpr,
                         re.IGNORECASE):
        if m.start() < last:
            continue                    # overlaps a previous span
        depth, j = 1, m.end()
        while j < len(selexpr) and depth:
            if selexpr[j] == "(":
                depth += 1
            elif selexpr[j] == ")":
                depth -= 1
            j += 1
        if depth:
            return None
        fn = m.group(1)
        arg = selexpr[m.end():j - 1]
        if _has_outer(arg, bound, inner_cols):
            return None                 # additive path's job, not ours
        pieces.append(selexpr[last:m.start()])
        pieces.append(f"(SELECT {fn}({arg}) {rest.strip()})")
        last = j
        n_aggs += 1
    if not n_aggs:
        return None
    pieces.append(selexpr[last:])
    leftover = "".join(p for i, p in enumerate(pieces) if i % 2 == 0)
    refs = _alias_refs(leftover)
    bare = _bare_idents(leftover)
    if refs & bound:
        return None
    if inner_cols is None:
        if bare:
            return None
        outer_present = bool(refs)
    else:
        if bare & inner_cols:
            return None
        outer_present = bool(refs or bare)
    if not outer_present:
        return None                     # nothing correlated: pointless
    return "".join(pieces)


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
    spans = _select_spans(sql)
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


# ---------------------------------------------------------------------------
# Span machinery
# ---------------------------------------------------------------------------

def _select_spans(sql: str) -> list[tuple[int, int]]:
    """All `(SELECT ...)` spans as (start, end) index pairs."""
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
    return spans


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


# ---------------------------------------------------------------------------
# LATERAL hoist: 2-level-deep correlation
# ---------------------------------------------------------------------------

def _lateral_hoist(sql: str) -> str:
    """Pull ONE two-level-deep correlated ungrouped-AGGREGATE subquery
    up into `LEFT JOIN LATERAL (SELECT ... AS __v <rest>) __latN ON
    true` on the top-level FROM, replacing the span with `__latN.__v`.
    The hoisted body's outer refs then sit one level from their binding
    (legal lateral correlation), and the enclosing subquery's reference
    to `__latN.__v` is one-level too.  Only aggregate bodies hoist —
    an ungrouped aggregate yields exactly one row, so the LEFT JOIN
    preserves cardinality and scalar semantics exactly.  Closes
    unnesting.test#57/#64/#66 (reference Unnesting.cpp handles these
    via its general dependent-join construction)."""
    if re.match(r"^\s*select\s+(distinct\s+)?\*", sql, re.IGNORECASE):
        return sql              # lateral would widen SELECT *
    spans = _select_spans(sql)
    blanked = list(sql)
    for s, e in spans:
        for k in range(s + 1, e - 1):
            if blanked[k] not in "()":
                blanked[k] = " "
    top_text = "".join(blanked)
    if re.search(r"\bgroup\s+by\b", top_text, re.IGNORECASE):
        return sql
    top_bound = _bound_aliases(top_text)
    if not top_bound:
        return sql
    fpos = _top_find(sql, re.compile(r"\bfrom\b", re.IGNORECASE))
    if fpos < 0:
        return sql
    # insertion point: end of the top-level FROM region
    tail_off = _top_find(sql, _CLAUSE_RE, fpos)
    ip = len(sql) if tail_off < 0 else tail_off
    counter = len(re.findall(r"__lat\d+", sql))
    for s, e in sorted(spans, key=lambda p: -p[0]):
        enclosing = [(s2, e2) for s2, e2 in spans
                     if s2 < s and e <= e2 and (s2, e2) != (s, e)]
        if not enclosing:
            continue            # depth-1 correlation is Catalyst's job
        body = sql[s + 1:e - 1]
        if re.search(r"\(\s*select\b", body, re.IGNORECASE):
            continue            # not innermost
        bsm = re.match(r"^\s*select\s+", body, re.IGNORECASE)
        if bsm is None:
            continue
        bfpos = _top_find(body, re.compile(r"\bfrom\b", re.IGNORECASE),
                          bsm.end())
        if bfpos < 0:
            continue
        sel, rest = body[bsm.end():bfpos].strip(), body[bfpos:]
        if re.search(r"\bgroup\s+by\b|\blimit\b", rest, re.IGNORECASE):
            continue
        if not re.search(r"\b(min|max|sum|avg|count)\s*\(", sel,
                         re.IGNORECASE):
            continue            # non-aggregate: row count not guaranteed 1
        free = _alias_refs(body) - _bound_aliases(body)
        if not free or not free <= top_bound:
            continue
        # free aliases must skip every intermediate scope (else the
        # correlation is 1-level and legal where it is)
        ok = True
        for s2, e2 in enclosing:
            enc = sql[s2 + 1:s] + " " + sql[e:e2 - 1]
            if free & _bound_aliases(enc):
                ok = False
                break
        if not ok:
            continue
        var = f"__lat{counter}"
        lateral = (f" LEFT JOIN LATERAL (SELECT {sel} AS __v "
                   f"{rest.strip()}) {var} ON true ")
        repl = f"{var}.__v"
        if ip <= s:
            return sql[:ip] + lateral + sql[ip:s] + repl + sql[e:]
        return sql[:s] + repl + sql[e:ip] + lateral + sql[ip:]
    return sql


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _min_wrap_grouped(sql: str) -> str:
    """Under a top-level GROUP BY, a CORRELATED scalar subquery in the
    SELECT list must sit inside an aggregate function (Spark:
    SCALAR_SUBQUERY_IS_IN_GROUP_BY_OR_AGGREGATE_FUNCTION).  The
    reference's unnesting evaluates it per-group directly — legal there
    only when the subquery's outer refs are group-key-determined, in
    which case its value is constant per group and MIN() is the
    identity.  So wrap each correlated select-list span in MIN(...)
    (uncorrelated spans are group constants Spark already accepts) —
    but ONLY when every free outer reference textually matches a
    top-level GROUP BY key: a non-key-determined correlation wrapped
    in MIN would return the group minimum instead of per-group values,
    so those spans keep the original Catalyst error instead."""
    top = _blank_span_interiors(sql)
    if _top_find(top, re.compile(r"\bgroup\s+by\b", re.IGNORECASE)) < 0:
        return sql
    fpos = _top_find(sql, re.compile(r"\bfrom\b", re.IGNORECASE))
    if fpos < 0:
        return sql
    top_bound = _bound_aliases(top)
    keys = _top_group_keys(sql, top)
    out = sql
    for s, e in sorted(_select_spans(sql), key=lambda p: -p[0]):
        if e > fpos or not _expr_position(sql, s):
            continue            # not in the top SELECT list
        if _inside_aggregate(sql, s):
            continue            # MIN(..) would nest aggregates
        body = sql[s + 1:e - 1]
        free = _alias_refs(body) - _bound_aliases(body)
        if not free or not free <= top_bound:
            continue
        # soundness gate: every outer-qualified ref must BE a group key
        refs = {f"{a.lower()}.{c.lower()}" for a, c in
                re.findall(r"\b([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)",
                           body.replace("`", ""))
                if a.lower() in free}
        if all(r in keys or r.split(".", 1)[1] in keys for r in refs):
            out = out[:s] + "MIN(" + out[s:e] + ")" + out[e:]
    return out


def _top_group_keys(sql: str, top: str) -> set[str]:
    """Normalized top-level GROUP BY key expressions of `sql` (`top` =
    the span-interior-blanked text, so a subquery's GROUP BY can't
    match)."""
    gpos = _top_find(top, re.compile(r"\bgroup\s+by\b", re.IGNORECASE))
    if gpos < 0:
        return set()
    start = gpos + len(re.match(r"group\s+by", top[gpos:],
                                re.IGNORECASE).group(0))
    end = _top_find(top, re.compile(
        r"\b(order|having|limit|union|intersect|except)\b",
        re.IGNORECASE), start)
    keys_text = sql[start:end if end >= 0 else len(sql)]
    return {re.sub(r"\s+", "", k).lower().replace("`", "")
            for k in _split_top(keys_text, ",") if k.strip()}


def _inside_aggregate(sql: str, s: int) -> bool:
    """True iff position `s` sits inside an aggregate-function call."""
    depth, i = 0, s - 1
    while i >= 0:
        c = sql[i]
        if c == ")":
            depth += 1
        elif c == "(":
            if depth == 0:
                j = i - 1
                while j >= 0 and sql[j].isspace():
                    j -= 1
                k = j
                while k >= 0 and (sql[k].isalnum() or sql[k] == "_"):
                    k -= 1
                if sql[k + 1:j + 1].lower() in ("min", "max", "sum",
                                                "avg", "count"):
                    return True
                i -= 1
                continue
            depth -= 1
        i -= 1
    return False


def _blank_span_interiors(sql: str) -> str:
    blanked = list(sql)
    for s, e in _select_spans(sql):
        for k in range(s + 1, e - 1):
            if blanked[k] not in "()":
                blanked[k] = " "
    return "".join(blanked)


def decorrelate_select_list(sql: str, columns_of=None) -> str:
    """Hoist additively-separable outer references out of scalar
    subqueries Catalyst rejects (SELECT-list / GROUP BY / HAVING /
    join-ON correlation, 2-level nesting).  Iterates to a fixpoint
    (bounded): unwrapping an inner no-FROM subquery can expose its
    parent as the next rewritable shape — `(SELECT (SELECT 42+i1.i)
    +i1.i)` unwraps inside-out, and a LATERAL hoist can expose a
    no-FROM unwrap.  `columns_of(table) -> columns|None` optionally
    resolves bare identifiers against table schemas.  Unchanged text
    means no rewrite found."""
    sql = _on_subquery_to_where(sql)
    sql = _min_wrap_grouped(sql)
    for _ in range(8):
        nxt = _decorrelate_once(sql, columns_of)
        if nxt == sql:
            nxt = _lateral_hoist(sql)
            if nxt == sql:
                return sql
        sql = nxt
    return sql


def _decorrelate_once(sql: str, columns_of=None) -> str:
    spans = [(s, e) for s, e in _select_spans(sql)
             if _expr_position(sql, s)]
    # innermost = spans contained in another; rewrite right-to-left so
    # indices stay valid, skipping spans that contain an already-edited one
    edited: list[tuple[int, int]] = []
    for s, e in sorted(spans, key=lambda p: (-p[0], p[1])):
        if any(s <= es and ee <= e for es, ee in edited):
            continue
        body = sql[s + 1:e - 1]
        rep = _rewrite_one_subquery(body, columns_of)
        if rep is not None:
            sql = sql[:s] + "(" + rep + ")" + sql[e:]
            edited.append((s, e))
    return sql


# ---------------------------------------------------------------------------
# Monotone-EXISTS -> scalar-aggregate rewrite (the SCALE rewrite class)
# ---------------------------------------------------------------------------
# Catalyst plans a correlated EXISTS/NOT EXISTS as a left-semi/anti hash
# join whose BUILD side is the inner table — when that table is the
# unbounded fact (TPC-H q4/q21: lineitem), the build side scales with
# the data, the exact hazard the r10 sf10 study measured at 2.9-3.3 s
# before the library queries were rewritten (queries/tpch.py:q4,
# tpch2.py:q21).  The same algebra applies at the SQL door: an EXISTS
# whose residual correlation is a single monotone comparison is exactly
# a per-key MIN/MAX (or COUNT) aggregate compared against the outer
# expression — and Catalyst decorrelates a correlated SCALAR aggregate
# subquery into a per-key aggregate + join, whose build/shuffle side is
# one row per key, never the fact.  (The reference reaches the same
# shape through its general unnesting + groupjoin fusion,
# Unnesting.cpp / OptimizeImplementations.cpp:771-850.)
#
# Recognized class (everything else is left untouched):
#   [NOT] EXISTS (SELECT ... FROM one_table [alias]
#                 WHERE conj AND conj AND ...)
# where every conjunct is one of
#   - an equality  inner_expr = outer_expr   (>= 1 required: the
#     correlation keys Catalyst needs to decorrelate the scalar form),
#   - a predicate over inner columns only (stays in the subquery), or
#   - at most ONE comparison  inner_expr <op> outer_expr  with
#     <op> in {<, <=, >, >=, <>, !=}.
# Rewrites (each wrapped coalesce(..., false), so the replacement is
# two-valued exactly like EXISTS and safe in any boolean context):
#   no comparison: (SELECT count(1) ...) > 0
#   a <  e: (SELECT min(a) ...) <  e      a >  e: (SELECT max(a) ...) >  e
#   a <= e: (SELECT min(a) ...) <= e      a >= e: (SELECT max(a) ...) >= e
#   a <> e: (SELECT min(a) ...) <> e OR (SELECT max(a) ...) <> e
# NULL semantics check out case-by-case: rows with NULL a can never
# witness the EXISTS and min/max ignore NULLs; an empty group makes the
# scalar NULL (count: 0) and coalesce(NULL, false) matches the empty
# EXISTS; a NULL outer e makes both forms false.
#
# FUSION (the groupjoin analogue): several EXISTS in one statement
# sharing the same (table, correlation keys) but differing in
# inner-only residuals (q21: the NOT EXISTS side adds the late-line
# filter) must not each pay their own fact aggregation — measured
# 11.8 s vs the library's fused 1.1 s at sf1 as separate scalar
# subqueries (Catalyst's MergeScalarSubqueries cannot merge CORRELATED
# scalar subqueries, and its LEFT JOIN LATERAL decorrelation plans
# BroadcastNestedLoopJoin domain joins — a timeout at sf1).  Fused
# groups therefore emit a PRE-DECORRELATED derived table: residuals
# move INTO the aggregate as CASE (min(a) WHERE p == min(CASE WHEN p
# THEN a END); count(1) WHERE p == count(CASE WHEN p THEN 1 END) —
# row-for-row identical by NULL semantics), the single aggregate
# GROUPs BY the correlation's inner sides, and the outer query
# LEFT-joins on them — one per-key aggregate, plain equi-join, zero
# correlation left for the planner: the reference's relalg.groupjoin
# fusion (OptimizeImplementations.cpp:771-850) realized in SQL text.
# Measured at sf1: door q21 1.8 s vs 3.1 s (Catalyst semi/anti) vs
# 1.25 s (hand-fused library).  Singleton groups keep the WHERE-form
# scalar subquery: pre-aggregation row pruning beats CASE when there
# is nothing to fuse.

_EXISTS_RE = re.compile(r"\b(not\s+)?exists\s*\(", re.IGNORECASE)
_EXISTS_BODY_RE = re.compile(
    r"^\s*select\b.*?\bfrom\s+([A-Za-z_]\w*)"
    r"(?:\s+(?:as\s+)?(?!where\b)([A-Za-z_]\w*))?\s*"
    r"\bwhere\b(.*)$",
    re.IGNORECASE | re.DOTALL)
_IN_BODY_RE = re.compile(
    r"^\s*select\s+(?:distinct\s+)?(.+?)\s+from\s+([A-Za-z_]\w*)"
    r"(?:\s+(?:as\s+)?(?!where\b)([A-Za-z_]\w*))?\s*"
    r"\bwhere\b(.*)$",
    re.IGNORECASE | re.DOTALL)
_CMP_OPS = ("<=", ">=", "<>", "!=", "=", "<", ">")
_AGG_FOR_OP = {"<": "min", "<=": "min", ">": "max", ">=": "max"}


def _strip_strings(s: str) -> str:
    """Blank single-quoted string literals so ident scans can't match
    inside them ('SAUDI ARABIA' must not read as columns).  NOT
    length-preserving — never use the result for offsets into the
    original text (use _blank_strings for that)."""
    return re.sub(r"'(?:[^']|'')*'", "''", s)


def _blank_strings(s: str) -> str:
    """Length-preserving literal blanking: string interiors become
    spaces, so offsets computed on the result index correctly into the
    original text (r11's _fusion_insert_point used _strip_strings and
    spliced the fused join mid-token when a top-level string literal
    preceded the FROM)."""
    return re.sub(r"'(?:[^']|'')*'",
                  lambda m: "'" + " " * (len(m.group(0)) - 2) + "'", s)


def _blank_comments_and_strings(s: str) -> str:
    """One lexer scan that blanks string-literal interiors, `--` line
    comments, and `/* */` block comments — each region recognized in
    source order, so a `--` INSIDE a literal is not a comment and a
    quote inside a comment does not open a literal (the two-regex
    compose-order bug class).  Length-preserving."""
    out = list(s)
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            j = i + 1
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j, n)):
                out[k] = " "
            i = j + 1
        elif c == "-" and s[i:i + 2] == "--":
            j = s.find("\n", i)
            j = n if j < 0 else j
            for k in range(i, j):
                out[k] = " "
            i = j
        elif c == "/" and s[i:i + 2] == "/*":
            j = s.find("*/", i)
            j = n if j < 0 else j + 2
            for k in range(i, min(j, n)):
                out[k] = " "
            i = j
        else:
            i += 1
    return "".join(out)


def main_statement_keyword(sql: str) -> str:
    """First keyword of the MAIN statement, lowercased — skipping past
    `--`/`/* */` comments, string literals, and a leading depth-0 CTE
    list.  Spark accepts CTE-prefixed DML (``WITH x AS (...) INSERT
    INTO ...``), so a caller that gates "is this a bare query?" on the
    leading keyword alone would classify that as a query and re-execute
    the INSERT through a rewrite retry (the double-DML hazard fixed for
    plain DML in a54e20a; the reference dialect executes each statement
    exactly once, run-sql.cpp).  Returns '' when the shape doesn't
    parse — callers must treat '' as "not provably a bare query" and
    refuse."""
    s = _blank_comments_and_strings(sql).lstrip()
    m = re.match(r"(?is)with\b(?:\s+recursive\b)?", s)
    if m is None:
        first = re.match(r"[A-Za-z_]\w*|\(", s)
        return first.group(0).lower() if first else ""
    pos = m.end()

    def _past_parens(i: int) -> int:
        # s[i] == '(' -> index just past its matching ')' (-1: unbalanced)
        depth = 0
        while i < len(s):
            if s[i] == "(":
                depth += 1
            elif s[i] == ")":
                depth -= 1
                if depth == 0:
                    return i + 1
            i += 1
        return -1

    while True:                       # ident [ (cols) ] AS ( body ) [,]*
        nm = re.match(r"\s*(?:[A-Za-z_]\w*|`[^`]+`|\"[^\"]+\")", s[pos:])
        if nm is None:
            return ""
        pos += nm.end()
        cm = re.match(r"\s*\(", s[pos:])
        if cm is not None:            # optional column list
            pos = _past_parens(pos + cm.end() - 1)
            if pos < 0:
                return ""
        am = re.match(r"(?is)\s*as\s*\(", s[pos:])
        if am is None:
            return ""
        pos = _past_parens(pos + am.end() - 1)
        if pos < 0:
            return ""
        sep = re.match(r"\s*,", s[pos:])
        if sep is None:
            break
        pos += sep.end()
    tail = s[pos:].lstrip()
    first = re.match(r"[A-Za-z_]\w*|\(", tail)
    return first.group(0).lower() if first else ""


def _split_cmp(c: str) -> tuple[str, str, str] | None:
    """Split a conjunct into (lhs, op, rhs) on its single top-level
    comparison operator; None if there is none or more than one."""
    found = None
    depth = 0
    i = 0
    while i < len(c):
        ch = c[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            for op in _CMP_OPS:
                if c.startswith(op, i):
                    if found is not None:
                        return None
                    found = (c[:i].strip(), op, c[i + len(op):].strip())
                    i += len(op) - 1
                    break
        i += 1
    return found


def _split_body(body: str):
    """(select_seg, from_seg, preds) of a single-scope body split at
    its depth-0 FROM and WHERE — exactly one FROM, at most one WHERE
    after it (preds is "" when absent: a JOIN body may carry all its
    predicates in ON clauses) — else None.  Keyword matches in
    _blank_parens(_blank_strings(..)) output are depth-0 outside
    literals by construction."""
    blanked = _blank_parens(_blank_strings(body))
    m = re.match(r"\s*select\b", blanked, re.IGNORECASE)
    if not m:
        return None
    froms = list(re.finditer(r"\bfrom\b", blanked, re.IGNORECASE))
    wheres = list(re.finditer(r"\bwhere\b", blanked, re.IGNORECASE))
    if len(froms) != 1 or len(wheres) > 1:
        return None
    if wheres and wheres[0].start() < froms[0].end():
        return None
    if not wheres:
        return (body[m.end():froms[0].start()],
                body[froms[0].end():], "")
    return (body[m.end():froms[0].start()],
            body[froms[0].end():wheres[0].start()],
            body[wheres[0].end():])


def _parse_from_list(seg: str):
    """[(table, alias)] from a comma-list of PLAIN table references —
    None on anything else (joins, derived tables, repeats).  Repeated
    tables are refused: the class comment's alias-remap reasoning
    assumes a table identifies its FROM item."""
    tables: list[tuple[str, str | None]] = []
    for item in seg.split(","):
        m = re.match(r"^\s*([A-Za-z_]\w*)(?:\s+(?:as\s+)?"
                     r"([A-Za-z_]\w*))?\s*$", item)
        if not m:
            return None
        tables.append((m.group(1), m.group(2)))
    names = [(a or t).lower() for t, a in tables]
    tbls = [t.lower() for t, _ in tables]
    if len(set(names)) != len(names) or len(set(tbls)) != len(tbls):
        return None
    return tables


def _parse_ansi_join_from(seg: str):
    """([(table, alias)], [on_cond, ...]) from an ANSI INNER-JOIN
    chain `t1 [a1] JOIN t2 [a2] ON c2 [JOIN t3 [a3] ON c3 ...]` —
    None on anything else (outer/cross/natural joins, USING, LATERAL,
    derived tables/parens, comma mixes, repeated tables).  Only INNER
    joins qualify: their ON conditions are WHERE-equivalent, so the
    caller splices them into the predicate list and re-emits a plain
    comma FROM — the widening the reference gets for free from
    Unnesting.cpp's arbitrary inner trees (r14; r13 refused any body
    containing `join`)."""
    blanked = _blank_strings(seg)
    if not _balanced(blanked):
        return None
    # depth-0 scan: keywords/commas INSIDE parens belong to ON-clause
    # expressions (coalesce(a,b), a parenthesized disjunction) and are
    # someone else's problem — _parse_subquery refuses nested selects
    # and classifies opaque paren groups conjunct-by-conjunct.  Parens
    # are only refused where a FROM *item* would carry them (derived
    # tables / lateral subqueries), via the item regex below.
    pblanked = _blank_parens(blanked)
    if re.search(r",|\b(left|right|full|outer|cross|natural|semi"
                 r"|anti|lateral|using|group|having|order|limit"
                 r"|offset|window|qualify|union|intersect|except"
                 r"|fetch)\b", pblanked, re.IGNORECASE):
        return None
    matches = list(re.finditer(r"\b(?:inner\s+)?join\b", pblanked,
                               re.IGNORECASE))
    if not matches:
        return None
    item_re = re.compile(r"^\s*([A-Za-z_]\w*)(?:\s+(?:as\s+)?"
                         r"([A-Za-z_]\w*))?\s*$")
    m0 = item_re.match(seg[:matches[0].start()])
    if m0 is None:
        return None
    tables = [(m0.group(1), m0.group(2))]
    ons: list[str] = []
    for i, jm in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(seg)
        chunk, bchunk = seg[jm.end():end], pblanked[jm.end():end]
        om = re.search(r"\bon\b", bchunk, re.IGNORECASE)
        if om is None:
            return None                 # JOIN without ON (cross): refuse
        mi = item_re.match(chunk[:om.start()])
        cond = chunk[om.end():]
        if mi is None or not cond.strip():
            return None
        tables.append((mi.group(1), mi.group(2)))
        ons.append(cond.strip())
    names = [(a or t).lower() for t, a in tables]
    tbls = [t.lower() for t, _ in tables]
    if len(set(names)) != len(names) or len(set(tbls)) != len(tbls):
        return None                     # same rule as _parse_from_list
    return tables, ons


def _parse_joined_from(frm_seg: str, preds: str, columns_of):
    """Shared multi-table dispatch for the EXISTS/IN body parsers:
    comma-list FROM (needs a real WHERE — no predicates means no
    correlation) or ANSI INNER-JOIN chain (ON conjuncts merge into the
    predicate list RAW, so a depth-0 OR inside an ON cond lands at the
    merged top level and _parse_subquery's OR bail refuses the body —
    refusal, never a regrouped mis-rewrite).  Returns _parse_subquery's
    result or None."""
    tables = _parse_from_list(frm_seg)
    if tables is not None:
        if len(tables) < 2 or not preds.strip():
            return None
        return _parse_subquery(tables, preds, columns_of,
                               frm_sql=frm_seg.strip())
    joined = _parse_ansi_join_from(frm_seg)
    if joined is None:
        return None
    tables, ons = joined
    merged = " and ".join(ons + ([preds] if preds.strip() else []))
    frm_sql = ", ".join(f"{t} {a}" if a else t for t, a in tables)
    return _parse_subquery(tables, merged, columns_of, frm_sql=frm_sql)


def _parse_exists_body(body: str, columns_of):
    """Parse one EXISTS body into (table, alias, corr_conjuncts,
    inner_preds, extract, multi) — or None when the body is outside
    the recognized class.  Single-table first; then the multi-table
    FROM — comma-list (r12: the TPC-DS q10/q35 shape) or ANSI
    INNER-JOIN chain (r14: ON conjuncts are WHERE-equivalent for
    inner joins)."""
    m = _EXISTS_BODY_RE.match(body)
    if m:
        head = body[:m.start(3)]
        blocked = re.search(r",|\bjoin\b|\bgroup\b|\bunion\b",
                            _blank_parens(head), re.IGNORECASE)
        if not blocked:
            got = _parse_subquery([(m.group(1), m.group(2))],
                                  m.group(3), columns_of)
            return got[0] if got else None
        if not re.search(r"\bjoin\b", _blank_parens(head),
                         re.IGNORECASE):
            return None
        # else: the depth-0 JOIN may be an ANSI chain — fall through
    parts = _split_body(body)
    if parts is None:
        return None
    _sel, frm_seg, preds = parts
    got = _parse_joined_from(frm_seg, preds, columns_of)
    return got[0] if got else None


def _parse_in_body(body: str, outer_expr: str, columns_of):
    """Parse `<outer_expr> IN (body)` — positive membership in a
    correlated single-table subquery — into the SAME parsed tuple as
    _parse_exists_body: the membership is one more equality
    correlation `y = outer_expr` (`x IN (SELECT y ...)` is TRUE
    exactly when a row with y = x exists; in a TRUE-only conjunct
    position the two-valued coalesce replacement is exact, and a NULL
    x or y never equi-joins, matching IN's no-witness reading).
    Requires at least one REAL correlation conjunct in the body's
    WHERE: uncorrelated IN is left to Catalyst, whose plain semi join
    already handles it — the rewrite targets the correlated family
    Catalyst plans as fact-side hash builds."""
    m = _IN_BODY_RE.match(body)
    got = None
    if m:
        y, table, alias, preds = m.groups()
        head = body[:m.start(4)]
        blocked = re.search(r",|\bjoin\b|\bgroup\b|\bunion\b",
                            _blank_parens(head), re.IGNORECASE)
        if blocked and not re.search(r"\bjoin\b", _blank_parens(head),
                                     re.IGNORECASE):
            return None
        if not blocked:
            got = _parse_subquery([(table, alias)], preds, columns_of)
        # else: depth-0 JOIN in the head — retry as an ANSI chain below
    if got is None:
        parts = _split_body(body)
        if parts is None:
            return None
        y, frm_seg, preds = parts
        y = re.sub(r"^\s*distinct\b", "", y, flags=re.IGNORECASE)
        got = _parse_joined_from(frm_seg, preds, columns_of)
    if got is None:
        return None
    (table, alias, corr, inner_preds, extract, multi), kind = got
    if not corr:
        return None                 # membership alone: leave to Catalyst
    y = y.strip()
    # ALLOWLIST (r13, ADVICE): the select item must be a bare inner
    # column or simple arithmetic over inner columns — identifiers,
    # numeric literals, + - * / %, parens.  ANY function call refuses:
    # the r12 blacklist was an open list (max_by/percentile/UDAFs, and
    # aggregates nested under non-aggregate calls like
    # coalesce(max(a),0), all slipped through and fabricated an
    # `agg(...) = x` WHERE conjunct — invalid SQL that only the
    # callers' analysis-failure fallback caught).  Refusing strictly
    # can only cost the optimization, never correctness.
    ystr = _strip_strings(y)
    if (re.search(r"[A-Za-z_]\w*\s*\(", ystr)
            or re.fullmatch(r"[\w.`\"\s()+\-*/%]*", ystr) is None
            or re.search(r"\b(case|and|or|not|select|null|interval"
                         r"|between|distinct|cast|over)\b",
                         ystr, re.IGNORECASE)
            or kind(y) != "inner"):
        return None
    # outer_expr sits in the OUTER scope: every reference must look
    # outer from the subquery's viewpoint (a bare ident that is also
    # an inner column classifies inner here — conservatively bail
    # rather than fabricate a correlation on the wrong scope)
    if (re.search(r"\b(or|and|not)\b|\(\s*select\b",
                  _strip_strings(_blank_parens(outer_expr)),
                  re.IGNORECASE)
            or _split_cmp(outer_expr) is not None
            or kind(outer_expr) != "outer"):
        return None
    corr = corr + [(f"{y} = {outer_expr}", y, outer_expr)]
    return table, alias, corr, inner_preds, extract, multi


def _parse_subquery(tables, preds, columns_of, frm_sql=None):
    """Shared core for the EXISTS/IN body parsers: classify the WHERE
    conjuncts of a subquery over `tables` (a [(table, alias)] list)
    into equality correlations, inner residuals and at most one
    monotone outer comparison.
    Returns ((table, alias, corr, inner_preds, extract, multi), kind)
    or None; `kind` is the scope classifier, exposed so the IN wrapper
    can validate its membership expressions against the same column
    resolution.  Multi-table bodies (the TPC-DS q10/q35 fact-joins-dim
    EXISTS shape) set multi=True and carry the verbatim FROM text in
    the `table` slot (alias None): they re-emit the FROM list as-is,
    and the caller must keep them OUT of fusion and CASE-form — both
    would move the JOIN conjuncts out of WHERE and cross-join the
    FROM items."""
    if re.search(r"\(\s*select\b|\bunion\b|\bintersect\b|\bexcept\b"
                 r"|\bgroup\s+by\b|\bhaving\b|\border\s+by\b|\blimit\b",
                 preds, re.IGNORECASE):
        return None
    if not _balanced(preds):
        return None
    # _split_top_and is not string-literal-aware: a boolean keyword
    # INSIDE a literal ('a and b') would split mid-literal and parse
    # garbage, and a literal 'between' desyncs the splitter's
    # pending-BETWEEN counter so the NEXT real AND is silently merged
    # into the preceding conjunct (r13, ADVICE: previously only
    # downstream bails kept that from mis-rewriting) — refuse the body
    # outright
    for lit in re.findall(r"'(?:[^']|'')*'", preds):
        if re.search(r"\b(and|or|not|between)\b", lit, re.IGNORECASE):
            return None
    # a top-level OR anywhere in the WHERE invalidates the AND-split
    # decomposition itself: `a and b or c` means `(a and b) or c`,
    # so no conjunct list exists — even an inner-only `or c` fragment
    # must bail.  Parenthesized disjunctions are blanked and survive
    # as opaque inner conjuncts.
    if re.search(r"\bor\b", _strip_strings(_blank_parens(preds)),
                 re.IGNORECASE):
        return None
    inner_names = {(a or t).lower() for t, a in tables}
    inner_cols: set[str] | None = None
    if columns_of is not None:
        cols: set[str] = set()
        resolved_all = True
        for t, _a in tables:
            try:
                c = columns_of(t)
            except Exception:           # noqa: BLE001
                c = None
            if c:
                cols |= {str(x).lower() for x in c}
            else:
                resolved_all = False
        # a partially-resolved union would misclassify the unresolved
        # table's bare columns as outer — all or nothing
        if resolved_all and cols:
            inner_cols = cols

    def _kind(expr: str) -> str | None:
        """'inner' | 'outer' | None (mixed/unclassifiable)."""
        e = _strip_strings(expr)
        kinds: set[str] = set()
        for r in _alias_refs(e):
            kinds.add("inner" if r in inner_names else "outer")
        bare = _bare_idents(e)
        if bare:
            if inner_cols is None:
                return None
            for b in bare:
                kinds.add("inner" if b in inner_cols else "outer")
        if kinds == {"inner"}:
            return "inner"
        if not kinds or kinds == {"outer"}:
            # no column refs at all (a literal) counts as outer-only:
            # constants are legal on the comparison's outer side
            return "outer"
        return None

    corr: list[str] = []
    inner_preds: list[str] = []
    extract: tuple[str, str, str] | None = None
    for conj in _split_top_and(preds):
        if _kind(conj) == "inner":
            # kept VERBATIM as a row filter (emission parenthesizes
            # it); NOT binds tighter than AND, so a `not ...` inner
            # conjunct is a well-formed standalone filter
            inner_preds.append(conj)
            continue
        # `not t.a = o.b` means not(t.a = o.b) — NOT binds looser
        # than the comparison — so _split_cmp's lhs `not t.a` would
        # fabricate a correlation on a negated column.  Any non-inner
        # conjunct carrying a top-level NOT is outside the class.
        if re.search(r"\bnot\b",
                     _strip_strings(_blank_parens(conj)), re.IGNORECASE):
            return None
        cmp_parts = _split_cmp(conj)
        if cmp_parts is None:
            return None
        lhs, op, rhs = cmp_parts
        lk, rk = _kind(lhs), _kind(rhs)
        if lk == "outer" and rk == "inner":
            lhs, rhs, lk, rk = rhs, lhs, rk, lk
            op = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}.get(op, op)
        if lk != "inner" or rk != "outer":
            return None
        if op == "=":
            corr.append((conj, lhs, rhs))   # (raw, inner side, outer side)
        elif extract is None:
            extract = (lhs, op, rhs)
        else:
            return None                 # two monotone extractions: bail
    if not corr:
        return None                     # uncorrelated (or non-equi): leave
    if len(tables) == 1:
        table, alias = tables[0]
        return (table, alias, corr, inner_preds, extract, False), _kind
    return (frm_sql, None, corr, inner_preds, extract, True), _kind


def _emit_scalar(parsed, case_form: bool) -> str:
    """The scalar-aggregate replacement expression for one parsed
    EXISTS.  WHERE-form keeps inner residuals as row filters
    (pre-aggregation pruning — best when the subquery stands alone);
    CASE-form moves them into the aggregate argument so every member
    of a shared-(table, correlation) group has an IDENTICAL child and
    Catalyst's MergeScalarSubqueries fuses the group into one
    aggregate.  Multi-table bodies re-emit their FROM list verbatim
    and are never CASE-form (inner preds include the JOIN conjuncts —
    moving them into the aggregate argument would cross-join the FROM
    items)."""
    table, alias, corr, inner_preds, extract, multi = parsed
    case_form = case_form and not multi
    frm = f"{table} {alias}" if alias else table
    # every conjunct re-emitted parenthesized: inner predicates may
    # hold top-level ORs (`t.a=1 or t.b=2` classified inner-only) and
    # a bare " and ".join would rebind them
    corr_raw = [f"({c[0]})" for c in corr]
    residuals = [f"({p})" for p in inner_preds]
    if case_form:
        where_sql = " and ".join(corr_raw)
        p = " and ".join(residuals)

        def wrap(x: str) -> str:
            return f"case when {p} then {x} end" if inner_preds else x
    else:
        where_sql = " and ".join(corr_raw + residuals)

        def wrap(x: str) -> str:
            return x
    if extract is None:
        return (f"(select count({wrap('1')}) from {frm} "
                f"where {where_sql}) > 0")
    a, op, e = extract
    if op in ("<>", "!="):
        return (f"(select min({wrap(a)}) from {frm} "
                f"where {where_sql}) {op} {e} or "
                f"(select max({wrap(a)}) from {frm} "
                f"where {where_sql}) {op} {e}")
    return (f"(select {_AGG_FOR_OP[op]}({wrap(a)}) from {frm} "
            f"where {where_sql}) {op} {e}")


def _norm_corr_key(parsed) -> tuple:
    """Fusion-group key: (table, normalized correlation conjuncts) with
    the subquery's own alias canonicalized away, so `l2.x = l1.x` and
    `l3.x = l1.x` over the same table land in one group.  Single-table
    parses only — callers keep multi-table entries out of grouping."""
    table, alias, corr, _, _, _ = parsed
    inner = (alias or table).lower()
    normed = frozenset(
        re.sub(rf"\b{re.escape(inner)}\s*\.", "#.",
               re.sub(r"\s+", " ", raw.strip().lower()))
        for raw, _, _ in corr)
    return table.lower(), normed


def _member_agg_exprs(parsed) -> list[tuple[str, str]]:
    """The (agg_fn, argument) pairs one parsed EXISTS needs from its
    group's fused aggregate — CASE-form arguments so every member
    shares the group's single child."""
    _, _, _, inner_preds, extract, _ = parsed
    p = " and ".join(f"({x})" for x in inner_preds)

    def wrap(x: str) -> str:
        return f"case when {p} then {x} end" if inner_preds else x
    if extract is None:
        return [("count", wrap("1"))]
    a, op, _ = extract
    if op in ("<>", "!="):
        return [("min", wrap(a)), ("max", wrap(a))]
    return [(_AGG_FOR_OP[op], wrap(a))]


def _member_predicate(parsed, fields: dict[tuple[str, str], str],
                      lat: str) -> str:
    """The outer-scope predicate for one parsed EXISTS, referencing its
    group's fused-aggregate fields instead of scalar subqueries."""
    _, _, _, _, extract, _ = parsed
    aggs = _member_agg_exprs(parsed)
    cols = [f"{lat}.{fields[a]}" for a in aggs]
    if extract is None:
        return f"{cols[0]} > 0"
    a, op, e = extract
    if op in ("<>", "!="):
        return f"{cols[0]} {op} {e} or {cols[1]} {op} {e}"
    return f"{cols[0]} {op} {e}"


_WHERE_END_RE = re.compile(
    r"\b(group\s+by|having|order\s+by|limit|offset|window|qualify"
    r"|union|intersect|except)\b", re.IGNORECASE)


def _depth0_where_conjuncts(ssql: str) -> list[tuple[int, int]]:
    """(start, end) spans — in original coordinates — of the top-level
    conjuncts of every depth-0 WHERE clause in `ssql` (which must be
    the string-blanked sql, so literals can't fake keywords).  Every
    keyword match in _blank_parens output is depth-0 by construction
    (paren interiors are spaces)."""
    blanked = _blank_parens(ssql)
    spans: list[tuple[int, int]] = []
    for m in re.finditer(r"\bwhere\b", blanked, re.IGNORECASE):
        endm = _WHERE_END_RE.search(blanked, m.end())
        lo, hi = m.end(), endm.start() if endm else len(ssql)
        base = lo
        for conj in _split_top_and(ssql[lo:hi]):
            at = ssql.index(conj, base)
            spans.append((at, at + len(conj)))
            base = at + len(conj)
    return spans


def _match_in_subquery(conj: str) -> tuple[str, str, bool] | None:
    """If the conjunct is exactly `<expr> [not] in (select ...)` — a
    membership predicate whose subquery parens close the conjunct —
    return (expr, body, negated); else None.  Positive IN rewrites
    directly.  `not in` carries three-valued NULL semantics (a NULL
    probe or NULL member flips the whole predicate), so the CALLER may
    only use a negated match when probe and member are both PROVABLY
    non-null (catalog metadata) — then NOT IN collapses to NOT EXISTS,
    which the negate machinery already emits (r13; the reference's
    analogue is InferNotNullConditions.cpp feeding
    ImplicitToExplicitJoins.cpp's mark-join simplification)."""
    c = conj.rstrip()
    if not c.endswith(")"):
        return None
    m = re.search(r"\b(not\s+)?in\s*\(", _blank_parens(c), re.IGNORECASE)
    if m is None:
        return None
    p = c.index("(", m.start())
    depth, i = 1, p + 1
    while i < len(c) and depth:
        if c[i] == "(":
            depth += 1
        elif c[i] == ")":
            depth -= 1
        i += 1
    if depth or i != len(c):        # group must end the conjunct
        return None
    expr = c[:m.start()].strip()
    if not expr:
        return None
    body = c[p + 1:i - 1]
    if not re.match(r"\s*select\b", body, re.IGNORECASE):
        return None
    return expr, body, bool(m.group(1))


def _outer_from_items(sql: str):
    """[(table, alias)] of the OUTER query's depth-0 FROM comma-list —
    None unless the statement is a single-SELECT scope over plain table
    references (joins/derived tables/set-ops refuse: alias resolution
    would need real scoping)."""
    ssql = _blank_strings(sql)
    b = _blank_parens(ssql)
    if len(re.findall(r"\bselect\b", b, re.IGNORECASE)) != 1:
        return None
    fm = re.search(r"\bfrom\b", b, re.IGNORECASE)
    if fm is None:
        return None
    endm = re.search(r"\b(where|group|having|qualify|window|order"
                     r"|limit|offset|union|intersect|except)\b",
                     b[fm.end():], re.IGNORECASE)
    seg = (ssql[fm.end():fm.end() + endm.start()] if endm
           else ssql[fm.end():])
    if "(" in seg or ")" in seg:
        return None                 # derived table / function source
    return _parse_from_list(seg)


def _notin_nullfree(sql: str, probe: str, body: str,
                    columns_of, notnull_of) -> bool:
    """True only when a `probe NOT IN (body)` is PROVABLY free of the
    three-valued NULL corner: the probe is a bare (possibly qualified)
    column of exactly one outer FROM table with a catalog NOT NULL
    declaration, and the member item is a bare inner column likewise
    declared NOT NULL.  Then `x NOT IN (SELECT y ...)` ≡ `NOT EXISTS
    (SELECT 1 ... AND y = x)` — the mark-join simplification the
    reference derives from inferred not-null facts
    (InferNotNullConditions.cpp -> ImplicitToExplicitJoins.cpp).
    Any doubt returns False: the caller simply keeps Catalyst's
    null-aware anti join, so this gate can only COST the rewrite."""
    if notnull_of is None:
        return False

    def _nn(table: str) -> set[str]:
        try:
            got = notnull_of(table)
        except Exception:           # noqa: BLE001 — metadata gap: refuse
            return set()
        return {c.lower() for c in (got or ())}

    m = _IN_BODY_RE.match(body)
    if m is not None and not re.search(
            r",|\bjoin\b", _blank_parens(body[:m.start(4)]),
            re.IGNORECASE):
        y, table, alias, _preds = m.groups()
        inner_tables = [(table, alias)]
    else:
        # multi-table body (r14): comma-list or ANSI INNER-JOIN chain —
        # member values over INNER-join rows come from their base
        # table, so a base-table NOT NULL declaration still proves the
        # member never NULL.  Outer joins / derived tables refuse in
        # the FROM parsers.
        parts = _split_body(body)
        if parts is None:
            return False
        y, frm_seg, _preds = parts
        y = re.sub(r"^\s*distinct\b", "", y, flags=re.IGNORECASE)
        inner_tables = _parse_from_list(frm_seg)
        if inner_tables is None:
            joined = _parse_ansi_join_from(frm_seg)
            if joined is None:
                return False
            inner_tables = joined[0]
    ym = re.fullmatch(r"(?:([A-Za-z_]\w*)\s*\.\s*)?([A-Za-z_]\w*)",
                      y.strip())
    if ym is None:
        return False                # arithmetic member: keep it simple
    yq, yc = ym.groups()
    if yq is not None:
        cands_in = [t for t, a in inner_tables
                    if (a or t).lower() == yq.lower()]
    elif columns_of is None:
        return False
    else:
        cands_in = [t for t, _a in inner_tables
                    if yc.lower() in {str(c).lower()
                                      for c in (columns_of(t) or ())}]
    if len(cands_in) != 1:
        return False                # outer-scope / ambiguous member
    if yc.lower() not in _nn(cands_in[0]):
        return False
    pm = re.fullmatch(r"(?:([A-Za-z_]\w*)\s*\.\s*)?([A-Za-z_]\w*)",
                      probe.strip())
    if pm is None:
        return False
    pq, pc = pm.groups()
    frm = _outer_from_items(sql)
    if frm is None:
        return False
    if pq is not None:
        cands = [t for t, a in frm if (a or t).lower() == pq.lower()]
    else:
        if columns_of is None:
            return False
        cands = [t for t, a in frm
                 if pc.lower() in {c.lower()
                                   for c in (columns_of(t) or ())}]
    if len(cands) != 1:
        return False
    return pc.lower() in _nn(cands[0])


def _fusion_insert_point(sql: str) -> int | None:
    """Index where a fused join item can be appended to the OUTER
    query's FROM list — only when the statement is a single SELECT
    scope (every paren group in it is a recognized EXISTS body or
    plain expression parens, no other subqueries): exactly one
    top-level `select` and `from` in the blanked text.  Returns the
    position of the clause keyword that ends the FROM list (where/
    group/having/order/limit) or end-of-statement; None = not safely
    fusable.  Refuses when the outer select list contains a top-level
    bare `*` (including DISTINCT *): the fused derived table is a new
    FROM item, so a bare star would expand over its helper columns
    and change the output schema (qualified `alias.*` stays eligible
    — it never reaches the new item).  Blanking is length-preserving
    end to end (strings first, then parens) so the returned offset
    indexes the ORIGINAL sql."""
    blanked = _blank_parens(_blank_strings(sql)).lower()
    selects = list(re.finditer(r"\bselect\b", blanked))
    if len(selects) != 1:
        return None
    froms = list(re.finditer(r"\bfrom\b", blanked))
    if len(froms) != 1:
        return None
    sellist = blanked[selects[0].end():froms[0].start()]
    sellist = re.sub(r"^\s*(all|distinct)\b", "", sellist)
    for item in sellist.split(","):
        if item.strip() == "*":
            return None
    m = re.compile(r"\b(where|group\s+by|having|order\s+by|limit"
                   r"|union|intersect|except)\b").search(
        blanked, froms[0].end())
    return m.start() if m else len(sql.rstrip().rstrip(";"))


def exists_to_aggregate(sql: str, columns_of=None, notnull_of=None) -> str:
    """Rewrite every recognized [NOT] EXISTS in `sql` — and every
    positive correlated `IN (subquery)` standing as a depth-0 WHERE
    conjunct (r12: membership is one more equality correlation, see
    _parse_in_body) — to its scalar-aggregate form (see the class
    comment above).  Groups of predicates sharing (table, correlation
    keys) FUSE: in a single-SELECT
    statement they become ONE pre-decorrelated derived table in the
    outer FROM — the aggregate GROUPs BY the correlation's inner
    sides, the outer query LEFT-joins on them, and the predicates
    reference its fields (see the FUSION class comment for why
    neither MergeScalarSubqueries nor LATERAL could be left to do
    this).  When the statement has other subqueries (scope not
    provably single), fused groups fall back to CASE-form scalar
    subqueries.
    Unchanged text means no rewrite applied.  Callers must value-gate
    the result (Connection.sql falls back to the original text if the
    rewritten form fails analysis; the verbatim suites, the sqllogic
    corpus and the hypothesis property suite value-check it)."""
    occs = []       # (start, end, negate, parsed)
    ssql = _blank_strings(sql)  # scan/depth-track outside literals;
    #                             length-preserving, so offsets map
    #                             straight onto the original text
    for m in _EXISTS_RE.finditer(ssql):
        depth, i = 1, m.end()
        while i < len(ssql) and depth:
            if ssql[i] == "(":
                depth += 1
            elif ssql[i] == ")":
                depth -= 1
            i += 1
        if depth:
            return sql                  # unbalanced: refuse to touch
        parsed = _parse_exists_body(sql[m.end():i - 1], columns_of)
        if parsed is not None:
            occs.append((m.start(), i, bool(m.group(1)), parsed))
    # positive correlated `IN (subquery)` conjuncts of a depth-0 WHERE
    # join the same occurrence list (r12): membership is one more
    # equality correlation, so the algebra — and the fusion groups —
    # are shared across the two predicate kinds.  Conjunct position
    # only: IN is three-valued (NULL probe against a non-matching
    # non-empty set is NULL, not FALSE), so the two-valued coalesce
    # replacement is exact only where rows are kept on TRUE.
    taken = [(s, e) for s, e, *_ in occs]
    for s0, e0 in _depth0_where_conjuncts(ssql):
        frag = sql[s0:e0]
        s = s0 + (len(frag) - len(frag.lstrip()))
        e = s0 + len(frag.rstrip())
        if e <= s or any(s < te and ts < e for ts, te in taken):
            continue
        hit = _match_in_subquery(sql[s:e])
        if hit is None:
            continue
        if hit[2] and not _notin_nullfree(sql, hit[0], hit[1],
                                          columns_of, notnull_of):
            continue        # NOT IN: three-valued unless provably null-free
        parsed = _parse_in_body(hit[1], hit[0], columns_of)
        if parsed is not None:
            occs.append((s, e, hit[2], parsed))
    if not occs:
        return sql
    groups: dict[tuple, list[int]] = {}
    keyed: list[tuple | None] = []      # None = multi-table: never
    #                                     grouped, fused, or CASE-form
    for idx, (*_, parsed) in enumerate(occs):
        if parsed[5]:
            keyed.append(None)
            continue
        k = _norm_corr_key(parsed)
        keyed.append(k)
        groups.setdefault(k, []).append(idx)

    insert_at = _fusion_insert_point(sql)
    fused: list[str] = []               # fused join items to insert
    fused_pred: dict[int, str] = {}     # occ idx -> predicate text
    if insert_at is not None:
        # sort by a fully-orderable key: frozensets are not comparable,
        # so two groups on the SAME table would TypeError a bare sort
        for gi, (key, idxs) in enumerate(
                sorted(groups.items(),
                       key=lambda kv: (kv[0][0], sorted(kv[0][1])))):
            if len(idxs) < 2:
                continue
            # canonical FROM item + correlation: the first member; other
            # members' inner-alias qualifiers re-map onto it (same table
            # and same normalized correlation by group construction)
            table, alias, corr, _, _, _ = occs[idxs[0]][3]
            canon = alias or table
            lat = f"__exq{gi}"
            fields: dict[tuple[str, str], str] = {}
            for oi in idxs:
                p = occs[oi][3]
                member_inner = (p[1] or p[0])
                for fn, arg in _member_agg_exprs(p):
                    arg = re.sub(rf"\b{re.escape(member_inner)}\s*\.",
                                 f"{canon}.", arg)
                    fields.setdefault((fn, arg),
                                      f"__a{len(fields)}")
            sel = ", ".join(f"{fn}({arg}) as {col}"
                            for (fn, arg), col in fields.items())
            frm = f"{table} {alias}" if alias else table
            # PRE-DECORRELATED derived table, not a correlated lateral:
            # the fused aggregate GROUPs BY the correlation's inner
            # sides and the outer query LEFT-joins on them — zero
            # correlation left for the planner to unnest.  Two engine
            # behaviors forced this shape (both caught by gates):
            # an inner/comma lateral over an ungrouped aggregate DROPS
            # outer rows whose key has no inner rows (the count-bug,
            # found by hypothesis), and Spark decorrelates LEFT JOIN
            # LATERAL ... ON true via BroadcastNestedLoopJoin domain
            # joins (q21 at sf1 went from 3 s to a timeout).  A NULL
            # key never equi-joins, which is exactly the no-witness
            # EXISTS reading; missing keys leave NULL fields and every
            # emitted predicate coalesces NULL to false.
            keys = ", ".join(
                f"{inner} as __k{ki}" for ki, (_, inner, _)
                in enumerate(corr))
            on = " and ".join(
                f"{lat}.__k{ki} = {outer}" for ki, (_, _, outer)
                in enumerate(corr))
            gby = ", ".join(inner for _, inner, _ in corr)
            fused.append(
                f" left join (select {keys}, {sel} from {frm} "
                f"group by {gby}) as {lat} on {on}")
            for oi in idxs:
                p = occs[oi][3]
                member_inner = (p[1] or p[0])
                # re-map this member's agg args the same way for lookup
                member_fields = {
                    (fn, arg): fields[(fn, re.sub(
                        rf"\b{re.escape(member_inner)}\s*\.",
                        f"{canon}.", arg))]
                    for fn, arg in _member_agg_exprs(p)}
                fused_pred[oi] = _member_predicate(
                    p, member_fields, lat)

    edits = []      # (start, end, replacement)
    for idx, (start, end, negate, parsed) in enumerate(occs):
        if idx in fused_pred:
            expr = f"coalesce({fused_pred[idx]}, false)"
        else:
            case_form = (keyed[idx] is not None
                         and len(groups[keyed[idx]]) >= 2)
            expr = f"coalesce({_emit_scalar(parsed, case_form)}, false)"
        expr = f"(not {expr})" if negate else f"({expr})"
        edits.append((start, end, expr))
    if fused:
        edits.append((insert_at, insert_at, "".join(fused) + " "))
    out = sql
    for start, end, rep in sorted(edits, reverse=True):
        out = out[:start] + rep + out[end:]
    return out
