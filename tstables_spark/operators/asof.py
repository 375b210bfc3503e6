"""As-of join: for each left row, the most recent right row at-or-before
it (per key) — pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics,
built from a union + running ``last(ignorenulls)`` window.

Why this shape and not a range join: a naive non-equi join ("right.ts <=
left.ts") explodes to all prior rows per left row before picking the
max — quadratic per key. The union+window plan is a single shuffle on
the key, a within-partition sort on (time, side), and a linear running
carry-forward: exactly one pass, no explosion, spill-safe. At 100 TB
with a 1000-executor cluster this is the only shape that survives —
cost is O(|L|+|R|) shuffle + sort per key, and AQE's skew-join splitting
still applies to the shuffle.

Semantics matched to DuckDB ``ASOF LEFT JOIN ... ON l.key = r.key AND
l.ts >= r.ts``: inclusive (a right row exactly at the left timestamp
matches), left rows with no prior right row get nulls. Right side must
be unique per (key, time) for deterministic output — pre-aggregate
duplicates upstream (see plans/timeseries.py::join_asof).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TIME = "__asof_time"
_KEY = "__asof_key"
_CARRY = "__asof_carry"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    right_values: Sequence[str],
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join; returns all left columns + ``right_values``
    (null where no right row at-or-before exists).

    ``tolerance_seconds`` bounds staleness (pandas ``merge_asof``'s
    ``tolerance``): a carried right row older than the bound is treated
    as absent — the match nulls out, it does not fall back to an even
    older row. Implemented by carrying the right row's own timestamp
    inside the struct and masking after the window; the plan is
    UNCHANGED (same single shuffle + linear carry-forward), the mask is
    one codegen'd comparison per output row on exact microseconds.

    ``direction`` (pandas ``merge_asof`` naming): ``"backward"`` picks
    the most recent right row at-or-BEFORE each left row; ``"forward"``
    the earliest right row at-or-AFTER it (the "next quote" join).
    Forward is the exact mirror — same single shuffle and linear pass,
    with the window frame flipped to current->following and a running
    ``first(ignorenulls)`` instead of ``last``; at equal timestamps the
    right row sorts on the inclusive side of the left row in both
    directions."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    backward = direction == "backward"
    left_cols = left.columns
    rts = F.col(right_on).alias("__rts")
    l = left.select(
        F.col(left_by).alias(_KEY),
        F.col(left_on).alias(_TIME),
        F.lit(1 if backward else 0).alias(_SIDE),
        F.lit(None).cast(
            right.select(F.struct(*right_values, rts).alias("s")).schema["s"].dataType
        ).alias(_CARRY),
        *[F.col(c) for c in left_cols],
    )
    r = right.select(
        F.col(right_by).alias(_KEY),
        F.col(right_on).alias(_TIME),
        F.lit(0 if backward else 1).alias(_SIDE),
        F.struct(*right_values, rts).alias(_CARRY),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    # Order (time, side): at equal timestamps the right row sorts on the
    # inclusive side of the left row — before it (side 0 < 1) for
    # backward, after it (side 1 > 0) for forward.
    if backward:
        w = (
            W.partitionBy(_KEY)
            .orderBy(_TIME, _SIDE)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        carried = l.unionByName(r).withColumn(
            _CARRY, F.last(_CARRY, ignorenulls=True).over(w)
        )
    else:
        w = (
            W.partitionBy(_KEY)
            .orderBy(_TIME, _SIDE)
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        carried = l.unionByName(r).withColumn(
            _CARRY, F.first(_CARRY, ignorenulls=True).over(w)
        )
    fresh = F.lit(True)
    if tolerance_seconds is not None:
        gap = F.unix_micros(F.col(_TIME)) - F.unix_micros(F.col(f"{_CARRY}.__rts"))
        if not backward:
            gap = -gap
        fresh = gap <= tolerance_seconds * 1_000_000
    out = carried.where(F.col(_SIDE) == (1 if backward else 0)).select(
        *left_cols,
        *[F.when(fresh, F.col(f"{_CARRY}.{v}")).alias(v) for v in right_values],
    )
    return out
