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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet stores INT64 TIMESTAMP(NANOS), which Spark's
        # vectorized reader rejects. Read nanos as long and truncate to
        # microseconds with integer division (never float: 1.7e18 ns
        # exceeds double's 2^53 integer range) — exactly DuckDB's
        # nanos->micros truncation, so oracles agree.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views (for spark.sql-based plans)."""
    for name in names or TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
