"""C-language scalar UDFs — the reference's third UDF surface
(``CREATE FUNCTION ... LANGUAGE C``, UDFImplementer.cpp:132-254, gated
by test/sqlite-small/udf.test): the reference JIT-compiles the C body
into its query; Spark has no C toolchain in-plan, so the equivalent
door TRANSLATES the C body to Python and registers it as an
Arrow-batched pandas UDF under the same SQL name (re-registration
replaces, matching the corpus's ``create or replace`` re-definition
semantics).

Scope — the translator handles the scalar-C subset the reference's own
test corpus exercises, and REFUSES anything else loudly (no silent
misparses): single/multi-statement bodies made of

  - ``return <expr>;``
  - declarations  ``size_t x = <expr>;`` / ``int|long|float|double|bool|auto``
  - assignments   ``x = <expr>;``
  - braceless     ``if (<cond>) <stmt>;`` and ``if (<cond>)`` + next stmt

with C operators ``+ - * / % == != < <= > >= && || !`` and
``true/false`` literals.  Arguments are coerced to the DECLARED C
parameter types before the body runs (so a Spark DECIMAL literal
arriving as ``decimal.Decimal`` behaves like the C float it was typed
as), and the result is coerced to the declared return type.  NULL in,
NULL out — the reference's generated wrapper does the same null check
before invoking the C kernel.
"""

from __future__ import annotations

import re
from typing import Callable

_C_FN_RE = re.compile(
    r"create\s+(?:or\s+replace\s+)?function\s+(\w+)\s*"
    r"\(([^)]*)\)\s*returns\s+(\w+)\s*language\s+c\s*as\s*"
    r"\$\$(.*?)\$\$",
    re.IGNORECASE | re.DOTALL)

# C / SQL type name -> (spark type, python coercion)
_TYPES: dict[str, tuple[str, Callable]] = {
    "int": ("int", int), "integer": ("int", int),
    "bigint": ("bigint", int), "smallint": ("smallint", int),
    "bool": ("boolean", bool), "boolean": ("boolean", bool),
    "float4": ("float", float), "float": ("float", float),
    "float8": ("double", float), "double": ("double", float),
}

_DECL_RE = re.compile(
    r"^(?:size_t|u?int\d*_t|int|long|short|double|float|bool|auto)\s+"
    r"([A-Za-z_]\w*)\s*=\s*(.+)$", re.DOTALL)
_ASSIGN_RE = re.compile(r"^([A-Za-z_]\w*)\s*=\s*(?!=)(.+)$", re.DOTALL)
_RETURN_RE = re.compile(r"^return\b(.*)$", re.DOTALL)
_IF_RE = re.compile(r"^if\s*\(", re.DOTALL)


def is_c_function_stmt(sql: str) -> bool:
    return _C_FN_RE.search(sql) is not None


def _fix_expr(expr: str) -> str:
    """C expression -> Python expression (documented subset)."""
    e = expr.strip()
    e = re.sub(r"\btrue\b", "True", e)
    e = re.sub(r"\bfalse\b", "False", e)
    e = e.replace("&&", " and ").replace("||", " or ")
    # unary ! (but not !=)
    e = re.sub(r"!(?!=)", " not ", e)
    if not re.fullmatch(r"[\w\s().+\-*/%<>=!,']*", e):
        raise ValueError(f"unsupported C expression: {expr!r}")
    # the subset has NO function calls: an identifier adjacent to '('
    # is either a call or a cast — both refused (keywords excepted)
    for ident in re.findall(r"([A-Za-z_]\w*)\s*\(", e):
        if ident not in ("and", "or", "not"):
            raise ValueError(f"function call not supported: {expr!r}")
    return e


def _translate_body(body: str) -> str:
    """C statement list -> Python function body (indented one level).
    Raises ValueError on anything outside the documented subset."""
    if "{" in body or "}" in body:
        raise ValueError("braced C blocks not supported")
    stmts = [s.strip() for s in body.split(";") if s.strip()]
    out: list[str] = []
    indent = "    "
    pending_if: str | None = None
    for st in stmts:
        st = re.sub(r"\s+", " ", st)
        line_indent = indent
        # a braceless if(...) may prefix this statement, or be pending
        # from the previous fragment
        if _IF_RE.match(st):
            depth, i = 0, st.index("(")
            j = i
            while j < len(st):
                if st[j] == "(":
                    depth += 1
                elif st[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            cond, rest = st[i + 1:j], st[j + 1:].strip()
            out.append(f"{indent}if {_fix_expr(cond)}:")
            if rest:
                st = rest
                line_indent = indent * 2
            else:
                pending_if = cond
                continue
        elif pending_if is not None:
            line_indent = indent * 2
            pending_if = None
        if m := _RETURN_RE.match(st):
            out.append(f"{line_indent}return {_fix_expr(m.group(1))}")
        elif m := _DECL_RE.match(st):
            out.append(f"{line_indent}{m.group(1)} = "
                       f"{_fix_expr(m.group(2))}")
        elif m := _ASSIGN_RE.match(st):
            out.append(f"{line_indent}{m.group(1)} = "
                       f"{_fix_expr(m.group(2))}")
        else:
            raise ValueError(f"unsupported C statement: {st!r}")
    if not out:
        raise ValueError("empty C body")
    return "\n".join(out)


def compile_c_function(stmt: str):
    """Parse + translate a CREATE FUNCTION ... LANGUAGE C statement.
    Returns (name, python_callable, spark_return_type, n_args)."""
    m = _C_FN_RE.search(stmt)
    if m is None:
        raise ValueError("not a C function statement")
    name, params_s, ret_s, body = m.groups()
    params = []
    for p in [x.strip() for x in params_s.split(",") if x.strip()]:
        toks = p.split()
        if len(toks) != 2 or toks[1].lower() not in _TYPES:
            raise ValueError(f"unsupported parameter: {p!r}")
        params.append((toks[0], _TYPES[toks[1].lower()][1]))
    if ret_s.lower() not in _TYPES:
        raise ValueError(f"unsupported return type: {ret_s!r}")
    ret_spark, ret_coerce = _TYPES[ret_s.lower()]
    src = (f"def __c_{name}({', '.join(n for n, _ in params)}):\n"
           + _translate_body(body))
    ns: dict = {}
    exec(src, {"__builtins__": {}}, ns)          # noqa: S102 — source is
    #   generated exclusively by the whitelisting translator above
    raw = ns[f"__c_{name}"]
    coercions = [c for _, c in params]

    from lingo_db_spark.functions.udfbridge import is_null

    def scalar(*args):
        if any(is_null(a) for a in args):         # NULL in, NULL out
            return None
        r = raw(*[c(a) for c, a in zip(coercions, args)])
        return None if r is None else ret_coerce(r)

    return name, scalar, ret_spark, len(coercions)


def register_c_function(spark, stmt: str) -> str:
    """Register the translated function as an Arrow-batched pandas UDF
    under its SQL name (shared shim: functions/udfbridge.py)."""
    from lingo_db_spark.functions.udfbridge import register_scalar

    name, scalar, ret_spark, n_args = compile_c_function(stmt)
    return register_scalar(spark, name, scalar, ret_spark, n_args)
