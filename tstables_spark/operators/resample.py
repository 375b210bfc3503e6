"""Time-series resampling: downsample ticks to OHLC bars.

The reference's data model (sorted tick tables, ``tstables/tstable.py``)
exists to feed exactly this kind of derived query; the reference itself
leaves it to pandas after ``read_range``. Here it is a single Spark
aggregation: one shuffle on the bucket, with map-side partial aggregation
(min/max/count/sum and min_by/max_by all have partial merge functions),
so at 100 TB it behaves like any hash aggregate — no windowing, no sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tstables_spark.plans._exact import exact_sum


def resample_ohlc(
    df: DataFrame,
    interval: str,
    ts_col: str = "ts",
    value_col: str = "value",
    tie_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """1 row per time bucket: open/high/low/close/volume/sum.

    open/close are the value at the earliest/latest (ts, *tie_cols) in the
    bucket — the tie-break makes duplicate timestamps deterministic.
    ``min_by``/``max_by`` over a struct key keeps this a pure hash
    aggregate (partial + final) instead of a windowed sort.
    """
    order_key = F.struct(F.col(ts_col), *[F.col(c) for c in tie_cols])
    bucket = F.window(F.col(ts_col), interval)["start"]
    return (
        df.groupBy(bucket.alias("bucket"))
        .agg(
            F.min_by(value_col, order_key).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, order_key).alias("close"),
            F.count("*").alias("volume"),
            exact_sum(value_col).alias("sum_value"),
        )
    )
