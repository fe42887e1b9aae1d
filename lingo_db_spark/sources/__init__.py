"""Sources and sinks beyond the parquet catalog: CSV/JSON ingest (the
reference's COPY FROM, parser.y:575 + RelationHelper.h:16) and table
creation/insert plumbing (CREATE TABLE / INSERT INTO,
parser.y:2851-2870, 3247-3260).

Schemas are always declared (the engine's fixed-schema contract) — no
inference on the ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def copy_from_csv(spark: SparkSession, path: str, schema: T.StructType,
                  header: bool = True, delimiter: str = ",",
                  view_name: str | None = None) -> DataFrame:
    """COPY <table> FROM '<file>' (CSV ...) — declared schema, no
    inference; optionally registered as a temp view."""
    df = (spark.read.schema(schema)
          .option("header", str(header).lower())
          .option("sep", delimiter)
          .csv(path))
    if view_name:
        df.createOrReplaceTempView(view_name)
    return df


def copy_from_json(spark: SparkSession, path: str, schema: T.StructType,
                   view_name: str | None = None) -> DataFrame:
    """JSON-lines ingest with declared schema."""
    df = spark.read.schema(schema).json(path)
    if view_name:
        df.createOrReplaceTempView(view_name)
    return df


def write_table(df: DataFrame, path: str, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    """Materialize a DataFrame as a parquet table (the engine's CREATE
    TABLE AS / INSERT INTO sink).  partition_by gives the on-disk layout
    partition pruning needs at scale — choose low-cardinality columns."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def upsert_partitions(df: DataFrame, path: str,
                      partition_by: list[str]) -> None:
    """Idempotent partition-level upsert WITHOUT a table format:
    dynamic partition overwrite replaces exactly the partitions present
    in this batch and leaves every other partition's files untouched —
    the parquet-only ingestion pattern for reprocessed days/shards
    (MERGE at the partition grain).  Re-running the same batch converges
    to the same files; readers never see a half-written partition
    directory only if the layout keys are coarse enough that a batch
    owns whole partitions — choose partition_by accordingly."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (df.write.mode("overwrite").partitionBy(*partition_by).parquet(path))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_keep_latest(spark: SparkSession, path: str, key_cols: list[str],
                        version_col: str) -> None:
    """Row-level upsert compaction for an unpartitioned parquet dir:
    keep the highest-version row per key and rewrite.  The read is cut
    from the files with an eager localCheckpoint before the overwrite
    (Spark cannot lazily read a path it is replacing).  At scale prefer
    upsert_partitions; this is the small-dimension compactor."""
    from pyspark.sql import Window

    cur = spark.read.parquet(path)
    w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
    latest = (cur.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn")
              .localCheckpoint(eager=True))
    latest.write.mode("overwrite").parquet(path)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files were written with EVOLVING
    schemas (columns added over time): mergeSchema unions the footers,
    older files surface NULL for columns they predate.  The read-side
    half of schema evolution — the write side just writes the new
    column; no table-format metadata needed."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def compact_small_files(spark: SparkSession, path: str,
                        target_files: int) -> int:
    """Small-file compaction: rewrite a parquet directory into
    target_files output files (the maintenance job that keeps scan task
    counts sane after streaming/incremental ingest produces thousands of
    tiny files).  Uses an eager localCheckpoint to cut the read from the
    files being replaced.  Returns the row count rewritten."""
    cur = spark.read.parquet(path).localCheckpoint(eager=True)
    n = cur.count()
    cur.repartition(target_files).write.mode("overwrite").parquet(path)
    return n
