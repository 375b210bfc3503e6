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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: str,
    band_seconds: int,
) -> DataFrame:
    """Interval-INTERVAL overlap join: pairs whose [start, end] ranges
    intersect, for the same ``by`` key.

    Banding: each interval is exploded into every band of width
    ``band_seconds`` its extent touches, and candidates come from an
    equi-join on (key, band) with the exact overlap predicate as the
    residual — comparisons are bounded by per-band occupancy, never
    |L| x |R| (the cartesian degeneration a bare non-equi join has at
    scale). ``band_seconds`` should be >= the typical interval extent
    so each interval touches O(1) bands.

    Exactly-once WITHOUT a distinct shuffle: a pair overlapping in k
    shared bands would be emitted k times, so the join additionally
    requires the band to be the one containing max(left_start,
    right_start) — both intervals provably cover that band (overlap
    means max(start) <= min(end)), and only one band satisfies it, so
    each qualifying pair survives exactly once. This trades the
    O(pairs) dedup exchange for one codegen'd comparison per
    candidate."""
    w_us = band_seconds * 1_000_000

    def banded(df: DataFrame, start: str, end: str, prefix: str) -> DataFrame:
        b0 = F.expr(f"unix_micros({start}) div {w_us}")
        b1 = F.expr(f"unix_micros({end}) div {w_us}")
        return df.withColumn(f"{prefix}_b0", b0).withColumn(
            "band", F.explode(F.sequence(b0, b1))
        )

    lb = banded(left, left_start, left_end, "l").alias("l")
    rb = banded(right, right_start, right_end, "r").alias("r")
    cond = (
        (F.col(f"l.{by}") == F.col(f"r.{by}"))
        & (F.col("l.band") == F.col("r.band"))
        & (F.col(f"l.{left_start}") <= F.col(f"r.{right_end}"))
        & (F.col(f"r.{right_start}") <= F.col(f"l.{left_end}"))
        & (F.col("l.band") == F.greatest("l.l_b0", "r.r_b0"))
    )
    out_cols = [F.col(f"l.{c}") for c in left.columns if c != by] + [
        F.col(f"r.{c}") for c in right.columns if c != by
    ] + [F.col(f"l.{by}").alias(by)]
    return lb.join(rb, cond).select(*out_cols)
