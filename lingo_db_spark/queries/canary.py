"""Oracle-environment semantics canary.

Round 3's driver gate hash-mismatched 4 queries that all pass the faithful
local replica (DuckDB 1.0.0) — the divergence was the driver DuckDB
version's handling of >38-digit decimal intermediates and double->decimal
casts in the ORACLE SQL, not the Spark results.  The decimal oracle
renderers were rewritten to be version-robust (functions/decimal.py); this
one-row query pins every semantic those renderers still rely on, each as a
boolean column the oracle computes and the Spark side asserts TRUE:

- `//` and `%` on non-negative HUGEINTs (trunc == floor there);
- double->VARCHAR is the shortest round-trip repr;
- VARCHAR->decimal rounds half-away-from-zero and parses exact-scale
  literals exactly;
- decimal x small-int unscaling is integer-exact;
- trunc(double) truncates toward zero;
- date->VARCHAR is ISO yyyy-MM-dd.

Registered FIRST so it appears in every CORRECTNESS file: if a future
driver environment breaks one of these, this row goes red alongside the
queries whose oracles depend on it, separating environment drift from
engine bugs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lingo_db_spark.queries import register

_PROBES: dict[str, str] = {
    "c01_hugeint_div_nonneg":
        "(CAST(7 AS HUGEINT) // CAST(2 AS HUGEINT)) = CAST(3 AS HUGEINT)",
    "c02_hugeint_mod_nonneg":
        "(CAST(7 AS HUGEINT) % CAST(2 AS HUGEINT)) = CAST(1 AS HUGEINT)",
    "c03_dbl_repr_short":
        "CAST(CAST(0.1 AS DOUBLE) AS VARCHAR) = '0.1'",
    "c04_dbl_repr_money":
        "CAST(CAST(173665.47 AS DOUBLE) AS VARCHAR) = '173665.47'",
    "c05_str_dec_half_away":
        "CAST('0.145' AS DECIMAL(18,2)) = CAST('0.15' AS DECIMAL(18,2))",
    "c06_str_dec_half_away_neg":
        "CAST('-0.145' AS DECIMAL(18,2)) = CAST('-0.15' AS DECIMAL(18,2))",
    "c07_str_dec_exact_parse":
        "CAST(CAST('-12.34' AS DECIMAL(12,2)) AS VARCHAR) = '-12.34'",
    "c08_dec_unscale_exact":
        "CAST(CAST('1.23' AS DECIMAL(12,2)) * 100 AS HUGEINT) = "
        "CAST(123 AS HUGEINT)",
    "c09_trunc_toward_zero":
        "CAST(trunc(CAST(-3.7 AS DOUBLE)) AS BIGINT) = -3",
    "c10_date_iso_repr":
        "CAST(DATE '1997-03-05' AS VARCHAR) = '1997-03-05'",
}

_ORACLE = "SELECT " + ",\n       ".join(
    f"({sql}) AS {name}" for name, sql in _PROBES.items())


@register("semantics_canary", _ORACLE)
def semantics_canary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One constant row of TRUEs vs the oracle's computed probes — a
    driver-environment attestation, not an engine feature.  Any hash
    mismatch here means the oracle DuckDB diverged on a semantic the
    decimal/cast oracle renderers rely on."""
    return spark.range(1).select(
        *[F.lit(True).alias(name) for name in _PROBES])
