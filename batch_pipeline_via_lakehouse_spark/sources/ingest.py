"""Bronze-style ingestion: raw files -> engine table with lineage columns.

Replicates the reference's bronze layer contract:
- CSV read with header, no inference — everything lands as string
  (`src/elt/bronze/_bronze_handler.py:30-33`; S1)
- JSON read (`_bronze_handler.py:34-35`; S2)
- three appended metadata columns: ingest_timestamp, ingest_year,
  ingest_month (`_bronze_handler.py:40-47`; F1)
- append into a partitioned table (`_bronze_handler.py:50-57`; K1)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..table.catalog import Table, conform_schema

INGEST_META = ["ingest_timestamp", "ingest_year", "ingest_month"]


def read_file(spark: SparkSession, path: str, fmt: str, schema: StructType | None = None) -> DataFrame:
    """Raw file scan; CSV stays schema-on-read (all strings) like bronze."""
    if fmt == "csv":
        reader = spark.read.option("header", True).option("inferSchema", False)
        return reader.csv(path, schema=schema) if schema else reader.csv(path)
    if fmt == "json":
        return spark.read.json(path, schema=schema)
    if fmt == "parquet":
        return spark.read.schema(schema).parquet(path) if schema else spark.read.parquet(path)
    raise ValueError(f"unsupported format {fmt!r}")


def with_ingest_metadata(df: DataFrame) -> DataFrame:
    ts = F.current_timestamp()
    return (
        df.withColumn("ingest_timestamp", ts)
        .withColumn("ingest_year", F.year(ts))
        .withColumn("ingest_month", F.month(ts))
    )


def ingest(
    spark: SparkSession,
    path: str,
    fmt: str,
    table_root: str,
    partition_by: list[str] | None = None,
    schema: StructType | None = None,
) -> tuple[Table, int]:
    """Load a raw file into an engine table (created on first ingest),
    appending the bronze metadata columns. Returns (table, snapshot_id)."""
    df = with_ingest_metadata(read_file(spark, path, fmt, schema))
    if os.path.exists(os.path.join(table_root, "metadata", "table.json")):
        table = Table.load(table_root)
        df = conform_schema(df, table.schema)
    else:
        table = Table.create(table_root, df.schema, partition_by or ["ingest_year", "ingest_month"])
    return table, table.append(df)


def export_csv(df: DataFrame, path: str) -> None:
    """CSV export (K6; `data/_get_all_data.py:186-191`)."""
    df.write.mode("overwrite").option("header", True).csv(path)
