"""Sources and sinks beyond the parquet catalog: CSV/JSON ingest (the
reference's COPY FROM, parser.y:575 + RelationHelper.h:16) and table
creation/insert plumbing (CREATE TABLE / INSERT INTO,
parser.y:2851-2870, 3247-3260).

Schemas are always declared (the engine's fixed-schema contract) — no
inference on the ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
