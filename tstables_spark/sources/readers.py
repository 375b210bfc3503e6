"""Schema-enforced batch readers. See package docstring for the rules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """Parquet scan; pass ``schema`` to pin column order/types (extra
    file columns are pruned at the reader, missing ones error)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    mode: str = "FAILFAST",
    **options: str,
) -> DataFrame:
    """CSV scan with a mandatory schema. ``mode``: FAILFAST (default —
    ingest jobs should die loudly) or PERMISSIVE for
    salvage-what-you-can backfills."""
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), mode=mode, **options)
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "FAILFAST",
    **options: str,
) -> DataFrame:
    """JSON-lines scan with a mandatory schema (no inference pass)."""
    return spark.read.schema(schema).options(mode=mode, **options).json(path)
