"""Streaming ingest into the TimeSeriesTable layout.

``ingest_stream`` is the Structured Streaming twin of
``TimeSeriesTable.append`` (A3): file/rate/kafka source -> watermark on
the event-time column -> date-partitioned parquet sink. Exactly-once is
inherited from the file sink's commit log + checkpointing. At scale the
only extra concern is small files (one file per partition per
micro-batch): compact_series is the OPTIMIZE-style rewrite job
(SURVEY.md §4's file-layout compactor) that coalesces a partition's
files and restores the in-file ts sort, run periodically out-of-band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def ingest_stream(
    src: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    available_now: bool = True,
) -> StreamingQuery:
    """Start a watermarked streaming write into the engine's layout."""
    out = src.withWatermark(ts_col, watermark).withColumn("date", F.to_date(F.col(ts_col)))
    writer = (
        out.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("date")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_series(spark: SparkSession, path: str, target_files_per_day: int = 1) -> None:
    """Rewrite a series directory to coalesce small files and restore the
    ts sort within each date partition (streaming ingest produces one
    file per partition per micro-batch)."""
    df = spark.read.parquet(path)
    (
        df.repartition(target_files_per_day, "date")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .partitionBy("date")
        .parquet(path + "__compacted")
    )
