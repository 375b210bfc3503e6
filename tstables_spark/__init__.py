"""tstables_spark — a PySpark-native time-series analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the reference library ``afiedler/tstables`` (see SURVEY.md; the reference
stores timestamped series in day-partitioned HDF5 tables and supports
create / append / read_range / min_dt / max_dt), re-expressed Spark-first:

- storage: date-partitioned Parquet, rows sorted by ``ts`` within
  partitions (pruning + row-group min/max stats replace the reference's
  manual day-partition walk + binary search — SURVEY.md §4),
- queries: declarative DataFrame / Spark SQL plans optimized by Catalyst,
- streams: Structured Streaming for the ingest path,
- plus a relational / window / UDF / streaming / LLM-pipeline operator
  surface (SURVEY.md §2 Table B) the reference does not have.

Everything here derives from public knowledge only: the Apache Spark API
and the public behavior of afiedler/tstables.
"""

from tstables_spark.session import get_spark
from tstables_spark.tstable import TimeSeriesTable

__version__ = "0.1.0"

__all__ = ["TimeSeriesTable", "get_spark", "__version__"]
