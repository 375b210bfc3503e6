"""Deterministic MRL/KLL-style mergeable quantile sketch.

The classic Munro-Paterson / MRL scheme re-expressed for Spark's
execution model: every input partition builds its own bounded summary
(a set of ``(value, weight=2^level)`` samples) in one streaming
Arrow-batched pass, the per-partition summaries union into a relation
of at most ``partitions x 2k x levels`` rows, and one final compaction
produces the corpus sketch. Compaction is DETERMINISTIC (sort, keep the
even-index element of each adjacent pair) instead of the usual coin
flip: the bias is one-sided and bounded — each compaction at level
``l`` perturbs any rank by at most ``2^l``, and a level compacts about
``n / (k * 2^(l+1))`` times, so the total rank error is at most about
``levels * n / (2k)`` (~0.8% of n at k=512, n=100k). Randomized KLL
would trade that for a tighter expected bound but break reproducibility,
which the differential-testing contract (and any retry-based execution
engine — a re-run task must produce the same sketch) cares about more.

Unlike a t-digest, the summary is a plain weighted-sample relation:
merging two sketches is list concatenation + the same carry loop, so
shard sketches combine associatively on an executor tree or on the
driver — the property that makes the sketch usable as a partial
aggregate at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

K_DEFAULT = 512

_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("value", T.DoubleType()),
        T.StructField("weight", T.LongType()),
    ]
)


def _carry(levels: list[list[float]], k: int) -> None:
    """Compact any level holding >= 2k items: sort the first 2k, keep
    the even-index survivor of each adjacent pair, promote the k
    survivors to the next level (doubled weight)."""
    l = 0
    while l < len(levels):
        buf = levels[l]
        while len(buf) >= 2 * k:
            chunk = np.sort(np.asarray(buf[: 2 * k], dtype=np.float64))
            del buf[: 2 * k]
            if l + 1 == len(levels):
                levels.append([])
            levels[l + 1].extend(chunk[0::2].tolist())
        l += 1


def _levels_to_pairs(levels: list[list[float]]) -> list[tuple[float, int]]:
    return [(float(v), 1 << l) for l, buf in enumerate(levels) for v in buf]


def sketch_partitions(df: DataFrame, col: str, k: int = K_DEFAULT) -> DataFrame:
    """One summary relation from all partitions: mapInPandas streams
    each partition's Arrow batches through the carry loop (peak Python
    memory ``O(k * levels)`` per task, never the partition) and emits
    its ``(value, weight)`` samples. NULL **and NaN** are dropped (the
    Arrow->pandas bridge conflates them, and NaN has no rank) — callers
    must count ``n`` and compute ranks over the same
    ``IS NOT NULL AND NOT isnan`` filter."""

    def build(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        levels: list[list[float]] = [[]]
        for pdf in batches:
            vals = pdf[col].dropna()  # drops SQL NULL and float NaN alike
            if len(vals):
                levels[0].extend(vals.astype(float).tolist())
                _carry(levels, k)
        pairs = _levels_to_pairs(levels)
        yield pd.DataFrame(
            {
                "value": pd.Series([p[0] for p in pairs], dtype="float64"),
                "weight": pd.Series([p[1] for p in pairs], dtype="int64"),
            }
        )

    return df.select(col).mapInPandas(build, schema=_SUMMARY_SCHEMA)


def merge_pairs(
    pairs: Iterable[tuple[float, int]], k: int = K_DEFAULT
) -> list[tuple[float, int]]:
    """Merge any number of sketches (their unioned (value, weight)
    samples) into one: re-bucket by level (weight is always a power of
    two) and re-run the carry. Associative up to the deterministic
    compaction order, which is fixed here by sorting the input."""
    levels: list[list[float]] = []
    for v, w in sorted(pairs):
        l = int(w).bit_length() - 1
        while len(levels) <= l:
            levels.append([])
        levels[l].append(float(v))
    _carry(levels, k)
    return _levels_to_pairs(levels)


def quantile(pairs: list[tuple[float, int]], q: float, n: int) -> float:
    """Smallest sketch value whose cumulative weight reaches q*n
    (weighted percentile_disc over the summary)."""
    if not pairs:
        raise ValueError("empty sketch")
    if not 0.0 < q <= 1.0:
        raise ValueError(f"quantile q must be in (0, 1], got {q}")
    target = q * n
    cum = 0
    s = sorted(pairs)
    for v, w in s:
        cum += w
        if cum >= target:
            return v
    # cum == sum(weights) >= target for any q <= 1 when n == sum(weights);
    # reachable only if the caller's n overstates the sketch weight.
    return s[-1][0]


GATE_BPS = [100, 500, 1000, 2500, 5000, 7500, 9000, 9500, 9900]
EPS_BP = 500

# DuckDB twin shared by agg_kll_gate and stream_kll_gate: the driver
# hash-checks (probe, exact n, TRUE) rows — one definition so the batch
# and streaming twins cannot silently diverge on probes or eps.
GATE_ORACLE = """
    WITH nn AS (SELECT count(*) AS n FROM events
                WHERE value IS NOT NULL AND NOT isnan(value))
    SELECT q.q_bp, nn.n, TRUE AS within_bound
    FROM (SELECT unnest([100, 500, 1000, 2500, 5000, 7500, 9000, 9500,
                         9900]) AS q_bp) q, nn
    """


def rank_gate(ev: DataFrame, merged: list[tuple[float, int]], col: str = "value"):
    """The eps-approximate rank audit shared by the batch and streaming
    KLL queries: estimate every GATE_BPS quantile from the merged
    sketch, compute all exact rank counters in ONE conditional-agg scan
    of ``ev`` (already NULL/NaN-filtered by the caller), and emit the
    (q_bp, n, within_bound) contract rows. n is the sketch's total
    weight — equality with the oracle's batch count is the lossless
    check."""
    from pyspark.sql import functions as F

    n = sum(w for _, w in merged)
    probes = [(bp, quantile(merged, bp / 10000.0, n)) for bp in GATE_BPS]
    aggs = []
    for bp, v in probes:
        aggs.append(F.sum((F.col(col) < F.lit(v)).cast("long")).alias(f"lt_{bp}"))
        aggs.append(F.sum((F.col(col) <= F.lit(v)).cast("long")).alias(f"le_{bp}"))
    row = ev.agg(*aggs).collect()[0]
    out = []
    for bp, _v in probes:
        ok = (row[f"lt_{bp}"] * 10000 <= (bp + EPS_BP) * n) and (
            row[f"le_{bp}"] * 10000 >= (bp - EPS_BP) * n
        )
        out.append((bp, n, bool(ok)))
    from tstables_spark._local import local_df

    return local_df(ev.sparkSession, out, "q_bp int, n long, within_bound boolean")
