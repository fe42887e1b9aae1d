"""Common-subtree elimination: compute duplicated plan fragments once.

Reference parity: src/compiler/Dialect/RelAlg/Transforms/CommonSubtreeElimination.cpp
(:18-120 builds an equivalence checker over RelAlg subtrees and replaces
every duplicate with the leader's result).  The Spark-first analogue does
not rewrite the plan by hand: Spark's CacheManager already substitutes an
``InMemoryRelation`` for EVERY plan fragment that ``sameResult``-matches a
persisted DataFrame (``QueryExecution.withCachedData``).  So CSE here is:

1. walk the analyzed logical plan (py4j), bucketing subtrees by
   ``semanticHash()`` and verifying with ``sameResult()`` (both already
   canonicalize away expression IDs and aliases);
2. keep the MAXIMAL duplicated subtrees that are worth materializing
   (contain an aggregate/join/window, or at least a filter over a scan —
   a bare table scan is cheaper re-read from parquet than cached);
3. lift each one into a DataFrame via ``Dataset.ofRows`` and ``persist()``
   it — the CacheManager then routes every occurrence through the single
   cached copy at execution time.

At 100 TB this is the difference between scanning a fact table once or N
times when a query references the same derived relation repeatedly (the
reference motivates the pass with exactly that: year_total-style
self-joined CTEs).  ``persist()`` defaults to MEMORY_AND_DISK, so an
oversized fragment degrades to local spill, not OOM.

A second, SQL-level entry point (`persist_repeated_ctes`) covers the case
the plan-level pass cannot see: a ``WITH`` CTE referenced twice is NOT
duplicated in the analyzed plan (Spark inlines it at optimization time,
after cache substitution), so it is materialized from the SQL text
instead — the generalization of the manual ``.persist()`` calls in
queries/dsq2.py:96,167.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

# Node names that make a fragment expensive enough to materialize.
_HEAVY_NODES = {
    "Aggregate", "Join", "Window", "Intersect", "Except", "Distinct",
    "Deduplicate", "Sort", "Expand",
}
# Leaf/wrapper nodes that are never worth caching on their own.
_TRIVIAL_NODES = {"LogicalRelation", "SubqueryAlias", "Project", "LocalRelation"}


def _children(jplan: Any) -> list[Any]:
    ch = jplan.children()
    return [ch.apply(i) for i in range(ch.size())]


def _iter_nodes(jplan: Any):
    """Yield every node of a java logical plan, depth-first, pre-order."""
    stack = [jplan]
    while stack:
        node = stack.pop()
        yield node
        stack.extend(_children(node))


def _deterministic(jplan: Any) -> bool:
    """True if every expression in the subtree is deterministic.

    Caching a fragment that contains rand()/uuid() would change how many
    times the nondeterministic source is evaluated; the reference's
    equivalence checker refuses those too.
    """
    for node in _iter_nodes(jplan):
        exprs = node.expressions()
        for i in range(exprs.size()):
            if not exprs.apply(i).deterministic():
                return False
    return True


def _worth_caching(jplan: Any) -> bool:
    """Gate: the fragment must do real work above its scans."""
    names = [n.nodeName() for n in _iter_nodes(jplan)]
    if all(n in _TRIVIAL_NODES for n in names):
        return False
    if any(n in _HEAVY_NODES for n in names):
        return True
    # Filter-over-scan fragments pay off only once they are non-trivial.
    return "Filter" in names and len(names) >= 3


def find_repeated_subtrees(df: DataFrame) -> list[Any]:
    """Return the maximal duplicated, cache-worthy subtrees of df's plan.

    Each returned java plan is the leader of a group of >=2 occurrences
    verified equivalent by ``sameResult`` (canonicalized comparison, so
    independently-built identical fragments with different expression IDs
    still match).  Only the OUTERMOST duplicated subtree of any chain is
    returned — its children are covered by caching the parent.
    """
    root = df._jdf.queryExecution().analyzed()

    # Bucket every subtree by semanticHash, then split hash collisions by
    # pairwise sameResult against each bucket's leaders.
    groups: dict[int, list[list[Any]]] = {}
    for node in _iter_nodes(root):
        bucket = groups.setdefault(node.semanticHash(), [])
        for grp in bucket:
            if node.sameResult(grp[0]):
                grp.append(node)
                break
        else:
            bucket.append([node])

    def occurrences(node: Any) -> int:
        for grp in groups.get(node.semanticHash(), []):
            if grp and node.sameResult(grp[0]):
                return len(grp)
        return 1

    # Top-down: the first duplicated cache-worthy node on any root-to-leaf
    # path wins; do not descend into it (children are covered), and emit
    # each group once.
    leaders: list[Any] = []
    seen_keys: list[Any] = []
    stack = [root]
    while stack:
        node = stack.pop()
        if (
            occurrences(node) >= 2
            and node.nodeName() not in _TRIVIAL_NODES
            and _worth_caching(node)
            and _deterministic(node)
        ):
            if not any(node.sameResult(k) for k in seen_keys):
                leaders.append(node)
                seen_keys.append(node)
            continue
        stack.extend(_children(node))
    return leaders


def _of_rows(spark: SparkSession, jplan: Any) -> DataFrame:
    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        spark._jsparkSession, jplan
    )
    return DataFrame(jdf, spark)


class CseScope:
    """Holds the persisted fragments (and any backing temp views) of one
    auto-CSE'd query.

    Unpersist when the consuming query (and anything else sharing the
    fragments) is done: ``scope.unpersist_all()`` or use as a context
    manager.  Dropping the scope also drops its ``__cse_*`` temp views —
    a long-lived session must not accumulate one view per execution.
    """

    def __init__(self, fragments: list[DataFrame],
                 views: list[str] | None = None,
                 spark: SparkSession | None = None):
        self.fragments = fragments
        self.views = views or []
        self._spark = spark

    def __enter__(self) -> "CseScope":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.unpersist_all()

    def unpersist_all(self) -> None:
        for f in self.fragments:
            f.unpersist()
        self.fragments = []
        if self._spark is not None:
            for v in self.views:
                self._spark.catalog.dropTempView(v)
        self.views = []


def auto_persist_common_subtrees(df: DataFrame) -> CseScope:
    """Persist every maximal duplicated fragment of df's analyzed plan.

    Returns a CseScope of the persisted DataFrames (possibly empty).  The
    input df is NOT modified — Spark's CacheManager substitutes the cached
    fragments into its physical plan automatically on the next action.
    """
    spark = df.sparkSession
    frags = [_of_rows(spark, p) for p in find_repeated_subtrees(df)]
    for f in frags:
        # idempotent: re-running the same query must not re-persist a
        # fragment the CacheManager already holds (storageLevel consults
        # the cache by plan, not by DataFrame identity)
        sl = f.storageLevel
        if not (sl.useMemory or sl.useDisk):
            f.persist()
    return CseScope(frags)


# ---------------------------------------------------------------------------
# SQL-level CSE: materialize WITH-CTEs referenced more than once.
# ---------------------------------------------------------------------------

_IDENT_RE = re.compile(r'[A-Za-z_][A-Za-z0-9_]*|"[^"]+"')


def _skip_ws(sql: str, i: int) -> int:
    while i < len(sql) and sql[i].isspace():
        i += 1
    return i


def _match_paren(sql: str, i: int) -> int:
    """i points at '('; return index just past the matching ')'.

    Quote-aware: parens inside single-quoted literals don't count.
    """
    depth = 0
    in_str = False
    while i < len(sql):
        c = sql[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced parens in SQL")


def _split_quoted(sql: str) -> list[tuple[bool, str]]:
    """Split into (is_literal, segment) runs so rewrites skip string bodies."""
    out: list[tuple[bool, str]] = []
    i = 0
    while i < len(sql):
        j = sql.find("'", i)
        if j < 0:
            out.append((False, sql[i:]))
            break
        out.append((False, sql[i:j]))
        k = j + 1
        while k < len(sql):
            if sql[k] == "'":
                if k + 1 < len(sql) and sql[k + 1] == "'":  # escaped ''
                    k += 2
                    continue
                break
            k += 1
        out.append((True, sql[j : k + 1]))
        i = k + 1
    return out


def _masked(sql: str) -> str:
    """Same-length text with string-literal bodies blanked."""
    return "".join(" " * len(seg) if lit else seg
                   for lit, seg in _split_quoted(sql))


_NONALIAS_KEYWORDS = {
    "where", "group", "order", "having", "limit", "union", "intersect",
    "except", "on", "join", "inner", "left", "right", "full", "cross",
    "natural", "using", "select", "from", "and", "or", "when", "then",
    "else", "end", "asc", "desc",
}


def _classify_refs(sql: str, names) -> list[tuple[int, int, str, bool]] | None:
    """Occurrences of CTE `names` in TABLE-REFERENCE position (after
    FROM/JOIN).  Returns [(start, end, name_lower, alias_follows)], or
    None when an occurrence is ambiguous — after a comma, which this
    scanner cannot prove is a SELECT-list comma rather than a FROM-list
    item (a FROM-list table ref it failed to rewrite would dangle).
    Occurrences in every other position (output alias `AS revenue`,
    qualifier `revenue.x`, bare column) are intentionally NOT table
    refs — the blanket word-boundary substitution this replaces
    rewrote output aliases and same-named columns too, silently
    changing result schemas."""
    text = _masked(sql)
    pat = re.compile(
        r"\b(%s)\b" % "|".join(re.escape(n) for n in names), re.IGNORECASE)
    out: list[tuple[int, int, str, bool]] = []
    for m in pat.finditer(text):
        s, e = m.span()
        before = text[:s].rstrip()
        after = text[e:].lstrip()
        if before.endswith(".") or after.startswith("."):
            continue                      # qualifier / qualified column
        prev_word = re.search(r"([A-Za-z_]\w*)\s*$", before)
        prev = prev_word.group(1).lower() if prev_word else ""
        if prev in ("from", "join"):
            am = re.match(r"(?:as\s+)?([A-Za-z_]\w*)", after, re.IGNORECASE)
            alias_follows = bool(
                am and (after[:2].lower() == "as"
                        or am.group(1).lower() not in _NONALIAS_KEYWORDS))
            out.append((s, e, m.group(1).lower(), alias_follows))
        elif before.endswith(","):
            return None                   # can't prove not a FROM list
    return out


def _count_refs(sql: str, name: str) -> int | None:
    """Table-position reference count, or None on an ambiguous text."""
    refs = _classify_refs(sql, [name])
    return None if refs is None else len(refs)


def _sub_refs(sql: str, mapping: dict[str, str]) -> str | None:
    """Replace table-position references per `mapping`, binding the
    original name as the item alias (`FROM revenue` ->
    `FROM __cse_revenue_1 AS revenue`) so qualified refs keep working;
    items with their own alias keep it.  None on ambiguous text."""
    if not mapping:
        return sql
    refs = _classify_refs(sql, list(mapping))
    if refs is None:
        return None
    for s, e, name, alias_follows in sorted(refs, reverse=True):
        rep = mapping[name] if alias_follows else (
            f"{mapping[name]} AS {sql[s:e]}")
        sql = sql[:s] + rep + sql[e:]
    return sql


def parse_ctes(sql: str) -> tuple[list[tuple[str, str]], str] | None:
    """Parse a leading WITH-clause.

    Returns ([(name, body), ...], main_query) or None when the statement
    has no WITH clause / uses RECURSIVE / has a shape this scanner cannot
    prove (CTE column aliases) — callers fall back to plain execution.
    """
    i = _skip_ws(sql, 0)
    if sql[i : i + 4].lower() != "with" or (
        i + 4 < len(sql) and not sql[i + 4].isspace() and sql[i + 4] != "("
    ):
        return None
    i = _skip_ws(sql, i + 4)
    if sql[i : i + 9].lower() == "recursive":
        return None
    ctes: list[tuple[str, str]] = []
    while True:
        m = _IDENT_RE.match(sql, i)
        if not m:
            return None
        name = m.group(0).strip('"')
        i = _skip_ws(sql, m.end())
        if sql[i : i + 1] == "(":  # WITH t(a, b) AS — column aliases: bail
            return None
        if sql[i : i + 2].lower() != "as":
            return None
        i = _skip_ws(sql, i + 2)
        if sql[i : i + 1] != "(":
            return None
        end = _match_paren(sql, i)
        ctes.append((name, sql[i + 1 : end - 1]))
        i = _skip_ws(sql, end)
        if sql[i : i + 1] == ",":
            i = _skip_ws(sql, i + 1)
            continue
        return ctes, sql[i:]


def _view_tag(sql: str) -> str:
    """Deterministic per-statement tag: re-running the same statement
    reuses the same __cse_* view names (createOrReplaceTempView makes
    that idempotent), so a long-lived session's catalog stays stable
    instead of accumulating sequence-numbered names; distinct
    statements still get distinct names."""
    import hashlib
    return hashlib.md5(sql.encode()).hexdigest()[:8]


def persist_repeated_ctes(
    spark: SparkSession, sql: str, min_refs: int = 2
) -> tuple[str, CseScope]:
    """Materialize CTEs referenced >= min_refs times as persisted temp views.

    Returns (rewritten_main_query, scope).  Every CTE (reused or not) is
    registered as a uniquely-named temp view so later CTE bodies resolve,
    but only the reused ones are persisted.  The analyzed-plan pass cannot
    catch these: Spark holds a single CTERelationRef in the analyzed plan
    and only duplicates the subtree during optimization, after cache
    substitution has already run.
    """
    parsed = parse_ctes(sql)
    if parsed is None:
        return sql, CseScope([])
    ctes, main = parsed
    # Dry-run the classification over every text the rewrite will touch:
    # an ambiguous occurrence (comma position) bails BEFORE any view or
    # persist side effect, falling back to plain execution.
    probe = {n.lower(): n.lower() for n, _ in ctes}
    if any(_sub_refs(b, probe) is None for _, b in ctes) or (
            _sub_refs(main, probe) is None):
        return sql, CseScope([])
    persisted: list[DataFrame] = []
    views: list[str] = []
    mapping: dict[str, str] = {}
    tag = _view_tag(sql)
    for idx, (name, body) in enumerate(ctes):
        uniq = "__cse_%s_%s" % (name.lower(), tag)
        rest = " ".join(b for _, b in ctes[idx + 1 :]) + " " + main
        refs = _count_refs(rest, name)
        cdf = spark.sql(_sub_refs(body, mapping))
        if refs is not None and refs >= min_refs:
            sl = cdf.storageLevel     # idempotent across repeated runs
            if not (sl.useMemory or sl.useDisk):
                cdf.persist()
            persisted.append(cdf)
        cdf.createOrReplaceTempView(uniq)
        views.append(uniq)
        mapping[name.lower()] = uniq
    return _sub_refs(main, mapping), CseScope(persisted, views, spark)


def sql_with_cte_cse(spark: SparkSession, sql: str) -> tuple[DataFrame, CseScope]:
    """Run a SQL statement with reused-CTE materialization applied."""
    main, scope = persist_repeated_ctes(spark, sql)
    return spark.sql(main), scope
