"""Deterministic sampling operators for corpus curation.

`df.sample`/`sampleBy` are seeded-random — fine for one-off jobs, wrong
for reproducible pipelines (a retry or a different partitioning changes
the sample).  These operators derive keep/drop from a multiplicative
hash of a stable id, so the sample is a pure function of the data:
re-runs, re-partitions, and other engines (the DuckDB oracle) produce
the identical row set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative constant (2^32 / phi).  id * K mod 2^32 scatters
# consecutive ids uniformly over [0, 2^32); exact in int64 for ids up to
# ~3.5e9 (larger id spaces should pre-fold with a 64-bit hash).
_KNUTH = 2654435761
_MOD = 4294967296


def hash_fraction(id_col: Column | str) -> Column:
    """Deterministic uniform [0,1) value per id — the reproducible
    replacement for rand()."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return ((c * F.lit(_KNUTH)) % F.lit(_MOD)) / F.lit(float(_MOD))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict[str, float],
                      id_col: str,
                      default_fraction: float = 0.0) -> DataFrame:
    """Keep each row with its stratum's fraction, deterministically by id
    (the curation primitive behind 'cap English at 10%, keep all code'
    data-mix recipes).  Narrow per-row op: no shuffle, no state, exactly
    reproducible at any scale."""
    frac = F.lit(default_fraction)
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == value, F.lit(f)).otherwise(frac)
    return df.filter(hash_fraction(id_col) < frac)
