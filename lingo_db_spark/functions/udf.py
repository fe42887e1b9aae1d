"""User-defined function registration — the engine's CREATE FUNCTION
surface (reference parser.y:3558-3568; Python UDF implementation
src/catalog/UDFImplementer.cpp:132-254, which embeds CPython and marshals
per call).  Spark's vectorized pandas UDFs are the strictly-better
analogue: Arrow batch transfer, one interpreter per worker, no per-row
marshalling.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def register_python_udf(spark: SparkSession, name: str, fn: Callable,
                        return_type: str, vectorized: bool = True):
    """CREATE FUNCTION <name> ... LANGUAGE python.

    vectorized=True (default): `fn` maps pandas.Series -> pandas.Series
    (Arrow-batched, the fast path).  vectorized=False: `fn` is per-row
    (only for non-vectorizable logic; 10-100x slower, reference-equivalent
    semantics).  The function becomes callable from both the DataFrame API
    (returned handle) and SQL (spark.sql(f"SELECT {name}(col) ...")).
    """
    udf = (F.pandas_udf(return_type)(fn) if vectorized
           else F.udf(fn, return_type))
    spark.udf.register(name, udf)
    return udf


def register_pandas_udaf(spark: SparkSession, name: str, fn: Callable,
                         return_type: str):
    """User-defined AGGREGATE function (extension beyond the reference:
    its frontend has no UDAF surface, SURVEY.md §2.6) — a pandas
    GROUPED_AGG UDF: `fn` maps a pandas.Series holding one group's values
    to one scalar.  Arrow-batched; usable from the DataFrame API and SQL,
    including over windows.  Distributed caveat: grouped-agg UDFs are NOT
    partial-aggregatable (no map-side combine) — Spark shuffles raw group
    rows, so at 100 TB prefer built-ins where one exists."""
    udaf = F.pandas_udf(fn, return_type, F.PandasUDFType.GROUPED_AGG)
    spark.udf.register(name, udaf)
    return udaf
