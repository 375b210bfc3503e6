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


def lttb(
    df: DataFrame,
    n_out: int,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: Sequence[str] = ("user_id",),
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) to
    ``n_out`` points per key — the perceptual line-chart reducer that
    keeps spikes M4's min/max grid can smear across bucket boundaries.

    LTTB is genuinely sequential (each bucket's pick depends on the
    previously picked point), so it cannot be a window/aggregate plan:
    this is the textbook case for a per-key pandas kernel. It runs via
    ``grouped_apply_in_pandas`` (operators/groupmap.py) — the SAME single
    shuffle ``applyInPandas`` would pay, but one Python round-trip per
    PARTITION instead of per key, so a 100 TB table with millions of
    series keys pays O(rows) Arrow transfer and nothing per key.

    Deterministic on any cluster layout: rows are sorted by
    (ts, original order) inside the kernel and area ties resolve to the
    earliest point (np.argmax picks the first maximum).
    """
    import numpy as np
    import pandas as pd

    from tstables_spark.operators.groupmap import grouped_apply_in_pandas

    assert n_out >= 3, "LTTB needs at least first + last + one bucket"
    keys = list(key_cols)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        n = len(g)
        if n <= n_out:
            return g[keys + [ts_col, value_col]]
        t = g[ts_col].astype("int64").to_numpy(dtype=np.float64)
        v = g[value_col].to_numpy(dtype=np.float64)
        # Fixed bucket edges over the middle n-2 points, first/last pinned.
        edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
        picked = [0]
        a = 0
        for b in range(n_out - 2):
            lo, hi = edges[b], edges[b + 1]
            nxt_lo, nxt_hi = (edges[b + 1], n) if b == n_out - 3 else (edges[b + 1], edges[b + 2])
            avg_t, avg_v = t[nxt_lo:nxt_hi].mean(), v[nxt_lo:nxt_hi].mean()
            area = np.abs(
                (t[a] - avg_t) * (v[lo:hi] - v[a]) - (t[a] - t[lo:hi]) * (avg_v - v[a])
            )
            a = lo + int(np.argmax(area))
            picked.append(a)
        picked.append(n - 1)
        return g.iloc[picked][keys + [ts_col, value_col]]

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys, ts_col, value_col).schema.fields
    )
    return grouped_apply_in_pandas(
        df.select(*keys, ts_col, value_col), keys, kernel, schema
    )
