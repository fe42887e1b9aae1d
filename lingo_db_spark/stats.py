"""Cost-based-optimizer statistics — the engine's stand-in for the
reference's per-table statistics: row count, reservoir sample, and
per-column HyperLogLog distinct counts
(reference include/lingodb/catalog/MetaData.h:17-27,
src/runtime/storage/LingoDBTable.cpp:237, src/utility/HyperLogLog.cpp),
which its DPhyp/GOO join-order optimizer consumes through sample
evaluation (reference src/compiler/Dialect/RelAlg/Transforms/queryopt/
QueryGraph.cpp:264-294 estimateUsingSample).

Spark's equivalent chain: `ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL
COLUMNS` persists rowCount/sizeInBytes plus per-column ndv (HLL-based),
min/max, null counts into the catalog; `spark.sql.cbo.enabled` +
`spark.sql.cbo.joinReorder.enabled` (set in session.ENGINE_CONFS) then
drive cost-based join reordering — but ONLY for catalog tables.
Path-based temp views carry file sizes and nothing else, so CBO is
decorative for them; a deployment that wants the reference's
stats-driven planning must route hot tables through this module once
per ingest."""

from __future__ import annotations

from pyspark.sql import SparkSession

from lingo_db_spark.catalog import TABLE_NAMES, load_table


def materialize_with_stats(spark: SparkSession, sf_dir: str,
                           names: tuple[str, ...] = TABLE_NAMES,
                           prefix: str = "cbo_",
                           overwrite: bool = False) -> dict[str, str]:
    """Register parquet tables as MANAGED catalog tables and compute
    full column statistics, enabling cost-based join reordering.

    Returns {logical name: catalog table name}.  Idempotent per session
    unless overwrite=True.  At 100 TB this is a metadata-only operation
    per ANALYZE scan and runs once per ingest, not per query."""
    out: dict[str, str] = {}
    for n in names:
        t = f"{prefix}{n}"
        if overwrite or not spark.catalog.tableExists(t):
            df = load_table(spark, sf_dir, n)
            df.write.mode("overwrite" if overwrite else "errorifexists") \
                .saveAsTable(t)
            spark.sql(
                f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
        out[n] = t
    return out


def drop_stats_tables(spark: SparkSession,
                      names: tuple[str, ...] = TABLE_NAMES,
                      prefix: str = "cbo_") -> None:
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}{n}")


def materialize_bucketed(spark: SparkSession, sf_dir: str,
                         name: str, bucket_col: str, n_buckets: int,
                         table_name: str | None = None,
                         overwrite: bool = False) -> str:
    """Write a table bucketed (hash-partitioned on disk) by a join key —
    Spark's persistent co-location primitive.  Two tables bucketed by
    the same key with the same bucket count join WITHOUT any exchange:
    the shuffle is paid once at ingest instead of per query, the
    on-cluster equivalent of the reference's persisted hash index
    (reference LingoDBHashIndex.cpp, used for index-nested-loop joins,
    OptimizeImplementations.cpp:544-590).  At 100 TB this turns the
    nightly fact-to-fact join from the dominant shuffle into a local
    zip of bucket files."""
    t = table_name or f"bkt_{name}"
    if overwrite or not spark.catalog.tableExists(t):
        df = load_table(spark, sf_dir, name)
        writer = (df.write.mode("overwrite" if overwrite else "errorifexists")
                  .bucketBy(n_buckets, bucket_col)
                  .sortBy(bucket_col)
                  .format("parquet"))
        writer.saveAsTable(t)
    return t
