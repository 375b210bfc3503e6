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

from tstables_spark._exact import exact_sum


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


def resample_m4(
    df: DataFrame,
    interval: str,
    ts_col: str = "ts",
    value_col: str = "value",
    tie_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """M4 downsampling (Jugel et al., "M4: A Visualization-Oriented Time
    Series Data Aggregation", VLDB 2014): per time bucket keep the four
    POINTS (ts AND value) — first, last, min, max — that render a
    pixel-column-exact line chart of the full series.

    Like ``resample_ohlc`` this is a pure hash aggregate (``min_by`` /
    ``max_by`` over struct keys, all with partial merge functions): one
    shuffle on the bucket, no window sort, so a 100 TB series
    downsamples in a single map-side-combining pass. Ties are
    deterministic: the min point is the row with the smallest
    (value, ts, *tie_cols) tuple, the max point the largest; first/last
    order by (ts, *tie_cols).
    """
    ties = [F.col(c) for c in tie_cols]
    point = F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v"))
    time_key = F.struct(F.col(ts_col), *ties)
    value_key = F.struct(F.col(value_col), F.col(ts_col), *ties)
    bucket = F.window(F.col(ts_col), interval)["start"]
    agg = df.groupBy(bucket.alias("bucket")).agg(
        F.min_by(point, time_key).alias("pf"),
        F.max_by(point, time_key).alias("pl"),
        F.min_by(point, value_key).alias("pmin"),
        F.max_by(point, value_key).alias("pmax"),
        F.count("*").alias("n"),
    )
    return agg.select(
        "bucket",
        F.col("pf.t").alias("t_first"),
        F.col("pf.v").alias("v_first"),
        F.col("pmin.t").alias("t_min"),
        F.col("pmin.v").alias("v_min"),
        F.col("pmax.t").alias("t_max"),
        F.col("pmax.v").alias("v_max"),
        F.col("pl.t").alias("t_last"),
        F.col("pl.v").alias("v_last"),
        "n",
    )
