"""Interval (range) joins.

Two strategies:

- ``interval_join``: equi-key + time-range predicate. Catalyst plans the
  equi part as a hash / sort-merge join and evaluates the interval as a
  join-condition filter — linear in the matched key groups. Use whenever
  a join key exists.

- ``banded_range_join``: keyless (or low-cardinality-key) range joins
  would otherwise be a cartesian product with a filter — quadratic, dead
  at scale. Bucketize time into bands of width >= the join horizon and
  explode each left row into the 1-2 candidate bands; the band id becomes
  a synthetic equi key, the exact predicate is applied post-join. This
  bounds each comparison to neighboring bands — the standard bin-packed
  range-join trick (open literature; e.g. interval bucketing in
  Flink/Databricks range-join optimization docs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    lower: Column,
    upper: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-key join with an additional [lower, upper] range condition."""
    return left.join(right, on & lower & upper, how)


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    horizon_seconds: int,
    band_seconds: int | None = None,
) -> DataFrame:
    """Keyless range join: pairs with 0 < right_ts - left_ts <= horizon.

    Left rows are exploded into ceil(horizon/band)+1 candidate bands and
    equi-joined to the right side's band — turning a cartesian filter
    into a shuffle hash join on band id.
    """
    band = band_seconds or horizon_seconds
    n_bands = -(-horizon_seconds // band) + 1  # ceil + own band
    # floor, not cast: cast('long') truncates toward zero, which for
    # pre-1970 (negative-epoch) timestamps shifts band ids by one around
    # the epoch boundary and silently drops matching pairs.
    l_band = F.floor(F.unix_timestamp(F.col(left_ts)) / band).cast("long")
    r_band = F.floor(F.unix_timestamp(F.col(right_ts)) / band).cast("long")
    l = left.withColumn(
        "__band", F.explode(F.sequence(l_band, l_band + F.lit(n_bands - 1)))
    )
    r = right.withColumn("__band", r_band)
    cond = (
        (F.col(f"r.{right_ts}") > F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {horizon_seconds} SECONDS")
        )
    )
    return (
        l.alias("l")
        .join(r.alias("r"), F.col("l.__band") == F.col("r.__band"), "inner")
        .where(cond)
        .drop("__band")
    )
