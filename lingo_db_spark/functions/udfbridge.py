"""Shared plumbing for the SQL-door scalar UDF surfaces (LANGUAGE C via
functions/cudf.py, LANGUAGE python via functions/pyudf.py — reference
UDFImplementer.cpp:132-254 and the ENABLE_PYTHON build's embedded
CPython): a null test robust to pandas' null encodings and the
pandas-UDF registration shim both doors share.

The registration is Arrow-batched (pandas_udf), never row-at-a-time
Python UDF: the scalar kernel runs per value inside one Python call per
Arrow batch, so the per-row overhead is a function call, not a Spark
serialization round-trip.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd


def is_null(v) -> bool:
    """NULL under every encoding a pandas batch can deliver: None
    (object dtype), NaN (nullable ints arrive as float64), pd.NA
    (nullable extension dtypes), NaT (datetimes).  The reference's
    generated wrapper does the same check before invoking the kernel —
    NULL in, NULL out, the interpreter is never entered."""
    if v is None or v is pd.NA or v is pd.NaT:
        return True
    return isinstance(v, float) and v != v


def register_scalar(spark, name: str, scalar: Callable, ret_spark: str,
                    n_args: int) -> str:
    """Register a per-value scalar kernel as an Arrow-batched pandas UDF
    under its SQL name (create-or-replace semantics: re-registration
    rebinds the name, as udf.test's addOne redefinition requires)."""
    from pyspark.sql import functions as F

    def _apply(cols):
        if not cols or len(cols[0]) == 0:
            return pd.Series([], dtype=object)
        return pd.Series([scalar(*vals) for vals in zip(*cols)],
                         dtype=object)

    # pandas_udf requires a FIXED-arity annotated signature — generate
    # one matching the declared parameter list.
    params = ", ".join(f"c{i}: pd.Series" for i in range(n_args))
    arglist = ", ".join(f"c{i}" for i in range(n_args))
    ns: dict = {"pd": pd, "_apply": _apply}
    exec(f"def _u({params}) -> pd.Series:\n"
         f"    return _apply([{arglist}])\n", ns)   # noqa: S102 — arity
    #   shim only; the kernel itself is the caller-supplied scalar
    spark.udf.register(name, F.pandas_udf(ns["_u"], ret_spark))
    return name
