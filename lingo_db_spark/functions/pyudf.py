"""Python-language scalar UDFs — the reference's ENABLE_PYTHON build
surface (``CREATE FUNCTION ... LANGUAGE python``, gated by
test/sqlite-small-python/python-udfs.test and run by the CI job
`.github/workflows/workflow-ubuntu-latest-x86_64.yml:376-384`): the
reference embeds CPython and calls the function defined by the ``$$``
body; our door execs the SAME body and registers the resulting callable
as an Arrow-batched pandas UDF under the SQL name.

Semantics pinned by the corpus and mirrored here:
  - the body defines a Python function named like the SQL function
    (``def py_add_one(x):`` for ``CREATE FUNCTION py_add_one``); if the
    names differ but the body defines exactly one function, that one is
    used;
  - arguments are coerced to the DECLARED parameter types before the
    body runs (int/float/bool/str; date arrives as ``datetime.date``);
  - the result is coerced to the declared return type;
  - NULL in, NULL out — any NULL argument short-circuits to NULL
    without entering the interpreter (python-udfs.test py-9);
  - ``CREATE OR REPLACE`` re-registration rebinds the name.

The body is the user's own Python, executed with full builtins — the
same trust model as the reference, which runs it in its embedded
interpreter.
"""

from __future__ import annotations

import datetime
import re
import textwrap
from typing import Callable

from lingo_db_spark.functions.udfbridge import is_null, register_scalar

# Both clause orders appear in the wild: the python corpus writes
# `RETURNS t AS $$..$$ LANGUAGE python`, the C corpus the reverse.
_PY_FN_RE = re.compile(
    r"create\s+(?:or\s+replace\s+)?function\s+(\w+)\s*"
    r"\(([^)]*)\)\s*returns\s+(\w+)\s*"
    r"(?:as\s*\$\$(.*?)\$\$\s*language\s+python"
    r"|language\s+python\s*as\s*\$\$(.*?)\$\$)",
    re.IGNORECASE | re.DOTALL)


def _to_date(v):
    if isinstance(v, datetime.datetime):
        return v.date()
    if hasattr(v, "to_pydatetime"):            # pd.Timestamp
        return v.to_pydatetime().date()
    return v


# SQL type name -> (spark type, python coercion)
_TYPES: dict[str, tuple[str, Callable]] = {
    "int": ("int", int), "integer": ("int", int),
    "bigint": ("bigint", int), "smallint": ("smallint", int),
    "bool": ("boolean", bool), "boolean": ("boolean", bool),
    "float4": ("float", float), "float": ("float", float),
    "float8": ("double", float), "double": ("double", float),
    "varchar": ("string", str), "text": ("string", str),
    "string": ("string", str), "char": ("string", str),
    "date": ("date", _to_date),
}


def is_py_function_stmt(sql: str) -> bool:
    return _PY_FN_RE.search(sql) is not None


def compile_py_function(stmt: str):
    """Parse a CREATE FUNCTION ... LANGUAGE python statement and exec
    its body.  Returns (name, python_callable, spark_return_type,
    n_args).  Raises ValueError loudly on anything malformed — never a
    silent misparse."""
    m = _PY_FN_RE.search(stmt)
    if m is None:
        raise ValueError("not a python function statement")
    name, params_s, ret_s = m.group(1), m.group(2), m.group(3)
    body = m.group(4) if m.group(4) is not None else m.group(5)
    coercions: list[Callable] = []
    for p in [x.strip() for x in params_s.split(",") if x.strip()]:
        toks = p.split()
        if len(toks) != 2 or toks[1].lower() not in _TYPES:
            raise ValueError(f"unsupported parameter: {p!r}")
        coercions.append(_TYPES[toks[1].lower()][1])
    if ret_s.lower() not in _TYPES:
        raise ValueError(f"unsupported return type: {ret_s!r}")
    ret_spark, ret_coerce = _TYPES[ret_s.lower()]

    ns: dict = {}
    exec(textwrap.dedent(body), ns)             # noqa: S102 — the body
    #   IS user Python, executed exactly as the reference's embedded
    #   interpreter would execute it
    fn = ns.get(name)
    if not callable(fn):
        fns = [v for k, v in ns.items()
               if callable(v) and not k.startswith("__")]
        if len(fns) != 1:
            raise ValueError(
                f"body must define a function named {name!r} "
                f"(or exactly one function); found {len(fns)}")
        fn = fns[0]

    def scalar(*args):
        if any(is_null(a) for a in args):       # NULL in, NULL out
            return None
        r = fn(*[c(a) for c, a in zip(coercions, args)])
        return None if r is None else ret_coerce(r)

    return name, scalar, ret_spark, len(coercions)


def register_py_function(spark, stmt: str) -> str:
    """Compile and register under the SQL name; create-or-replace."""
    name, scalar, ret_spark, n_args = compile_py_function(stmt)
    return register_scalar(spark, name, scalar, ret_spark, n_args)
