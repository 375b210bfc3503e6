"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``tstables_spark`` package; this module is
only the thin adapter the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's read_range (inclusive time-range
    scan) over the events series at sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from tstables_spark.plans.registry import QUERIES  # registers on import

    import tstables_spark.plans  # noqa: F401  (loads all query modules)

    return QUERIES["ts_range_scan"](spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    import tstables_spark.plans  # noqa: F401

    from tstables_spark.plans.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every hash-checkable query."""
    import tstables_spark.plans  # noqa: F401

    from tstables_spark.plans.registry import ORACLES

    return dict(ORACLES)
