"""Parquet table loaders for the driver-generated fixtures (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to TIMESTAMP (instant, session
    TZ=UTC). Fixture parquet stores tz-less timestamp[us]; the engine's
    contract (SURVEY.md §1, mirroring the reference's ms-since-epoch-UTC)
    is instant semantics, and NTZ breaks withWatermark, CAST(ts AS
    BIGINT) and the TimestampType storage assert. With the session TZ
    pinned UTC the wall-clock values are preserved exactly, so DuckDB
    oracle hashes are unaffected. Normally a no-op: the session also sets
    spark.sql.parquet.inferTimestampNTZ.enabled=false; this guards
    sessions built without engine defaults."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Older fixture generations stored INT64 TIMESTAMP(NANOS), which
        # Spark's vectorized reader rejects. Read nanos as long and
        # truncate to microseconds with integer division (never float:
        # 1.7e18 ns exceeds double's 2^53 integer range) — exactly
        # DuckDB's nanos->micros truncation, so oracles agree.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _normalize_ntz(df)
    return _normalize_ntz(spark.read.parquet(path))


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views (for spark.sql-based plans)."""
    for name in names or TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
