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


def mix_to_proportions(df: DataFrame, strata_col: str, id_col: str,
                       targets: dict[str, float]) -> DataFrame:
    """Compose a training mix with TARGET PROPORTIONS: downsample
    over-represented strata so the output approaches the requested
    shares (e.g. {'web': 0.5, 'code': 0.3, 'books': 0.2}) without
    upsampling anything.  The binding stratum is the one whose full
    count divided by its target share is smallest; every stratum s then
    keeps min(1, target_s * T / count_s) of its rows via the
    deterministic per-id hash — reproducible at any scale, one tiny
    aggregate + a broadcast join + a narrow filter.  Strata missing from
    `targets` are dropped."""
    counts = (df.filter(F.col(strata_col).isin(list(targets)))
              .groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n")))
    tgt = F.create_map(*[x for kv in targets.items()
                         for x in (F.lit(kv[0]), F.lit(float(kv[1])))])
    sized = counts.withColumn("__share", tgt[F.col(strata_col)])
    # total output size T = min over strata of count/share (the binding
    # stratum is kept whole).
    t = sized.agg(F.min(F.col("__n") / F.col("__share")).alias("__t"))
    plan = (sized.crossJoin(F.broadcast(t))
            .withColumn("__frac", F.least(
                F.lit(1.0),
                F.col("__share") * F.col("__t") / F.col("__n")))
            .select(strata_col, "__frac"))
    return (df.join(F.broadcast(plan), strata_col)
            .filter(hash_fraction(id_col) < F.col("__frac"))
            .drop("__frac"))


def oversample(df: DataFrame, strata_col: str, id_col: str,
               weights: dict[str, float]) -> DataFrame:
    """Deterministic oversampling — repeat each stratum's rows by a
    possibly fractional epoch weight (e.g. {'code': 2.5} = every code
    row twice, half the rows a third time): integer part via a JVM
    sequence explode, fractional remainder via the per-id hash.  The
    training-mix counterpart to downsampling when a small high-quality
    source must appear multiple epochs per pass.  Output carries
    __epoch (0-based copy index) so downstream shuffles can salt on it;
    rows in strata without a weight pass through once."""
    w = F.lit(1.0)
    for value, wt in sorted(weights.items()):
        w = F.when(F.col(strata_col) == value, F.lit(float(wt))).otherwise(w)
    n_full = F.floor(w).cast("int")
    frac = w - n_full
    extra = (hash_fraction(id_col) < frac).cast("int")
    return (df.withColumn("__copies", n_full + extra)
            .filter(F.col("__copies") > 0)
            .withColumn("__epoch",
                        F.explode(F.sequence(F.lit(0), F.col("__copies") - 1)))
            .drop("__copies"))
