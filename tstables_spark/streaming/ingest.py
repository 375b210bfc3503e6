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


def compact_series(spark: SparkSession, path: str, files_per_day: int = 1) -> None:
    """OPTIMIZE-style rewrite: coalesce each date partition's micro-batch
    files down to ``files_per_day`` and restore the in-file ts sort.

    The shuffle key is (date, hash-bucket of ts): each (day, bucket)
    pair lands wholly in one task, so every day produces at most
    ``files_per_day`` sorted files regardless of day count — and the
    rewrite parallelizes across days x buckets on a cluster. The
    compacted tree is written to the side, then swapped in with two
    renames (the same move a table-format OPTIMIZE hides behind a
    metadata commit; readers mid-swap are the documented gap that
    motivates a transactional table format at 100 TB)."""
    df = spark.read.parquet(path)
    tmp = path + "__compacting"
    (
        df.repartition(F.col("date"), F.pmod(F.xxhash64("ts"), F.lit(files_per_day)))
        .sortWithinPartitions("date", "ts")
        .write.mode("overwrite")
        .partitionBy("date")
        .parquet(tmp)
    )
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    jold = jvm.org.apache.hadoop.fs.Path(path + "__precompact")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.rename(jpath, jold)
    fs.rename(jtmp, jpath)
    fs.delete(jold, True)
