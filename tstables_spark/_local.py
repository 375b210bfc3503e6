"""Driver-built small relations as JVM LocalRelations.

``spark.createDataFrame(list_of_tuples)`` parallelizes the data into a
PYTHON-RDD-backed ``Scan ExistingRDD``: every scan of the frame runs
``defaultParallelism`` tasks that each pay a Python-worker roundtrip
(~300 ms of non-CPU runtime on the harness box) to deserialize a
handful of pickled rows. For driver-built O(k) relations that sit under
broadcasts or are scanned repeatedly (IVF centroid tables, sketch gate
readouts, quantile probes), that plumbing dominated whole queries:
jstack attributed 36.7 of ts_robust_zscore's 41.7 s summed task time to
exactly this before r17 (SCALE.md r17).

``local_df`` routes the same rows through pandas + Arrow instead, which
lands as a ``LocalTableScan`` (a true LocalRelation: zero tasks, eligible
for driver-side broadcast and constant folding). Measured: a 16-row
array-typed relation scanned via noop sink — 1.84 s ExistingRDD vs
0.06 s LocalTableScan. Any conversion failure falls back to the classic
path, so the helper is never less capable than createDataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """``spark.createDataFrame(rows, schema)``, but as a JVM
    LocalRelation (LocalTableScan) whenever pandas/Arrow can represent
    the rows — see module docstring. ``schema`` is a DDL string; rows
    are matched to it positionally, exactly like createDataFrame."""
    try:
        import pandas as pd

        pdf = pd.DataFrame(list(rows))
        df = spark.createDataFrame(pdf, schema=schema)
        # Arrow conversion can silently fall back to the pickled-RDD
        # path (spark.sql.execution.arrow.pyspark.fallback.enabled);
        # only trust the result if it really is a local relation.
        if "LocalTableScan" in df._jdf.queryExecution().executedPlan().toString():
            return df
    except Exception:
        pass
    return spark.createDataFrame(rows, schema)
