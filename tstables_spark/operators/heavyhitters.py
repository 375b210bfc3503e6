"""Misra-Gries heavy-hitters summary — the deterministic counter-based
frequency sketch (Misra & Gries 1982; mergeability per Agarwal et al.,
"Mergeable Summaries", PODS 2012).

The Spark execution shape mirrors operators/kll.py: every input
partition maintains at most ``k`` counters in one Arrow-batched pass —
each Arrow batch is first reduced to EXACT counts at C speed
(``value_counts``), and that batch summary (an MG summary with zero
error) folds into the running counters through the standard
subtract-merge, so no per-item Python loop ever runs. The
per-partition summaries collect as a bounded ``partitions x k``
relation, and a fold of the standard merge (sum counters; if over k,
subtract the (k+1)-th largest value and drop non-positives) yields the
corpus summary. Guarantees, kept under ANY merge schedule: estimates
never exceed true counts, undercount by at most ``n / (k+1)``, and
every item with true frequency above ``n / (k+1)`` is present — the
gate query checks exactly these against exact counts.

Unlike the CMS (plans/llm.py) this summary is deterministic given the
partitioning, stores the ITEMS themselves (no hash collisions), and
bounds error by total count, not per-cell expectation."""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

K_DEFAULT = 64

_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("item", T.StringType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def mg_partitions(df: DataFrame, col: str, k: int = K_DEFAULT) -> DataFrame:
    """Per-partition Misra-Gries summaries: one mapInPandas pass with
    O(k) task state, emitting at most k (item, cnt) rows per
    partition. NULLs are dropped.

    Each Arrow batch is aggregated to exact counts with
    ``value_counts`` (vectorized — this is the pass that touches every
    token of the corpus, so no per-item Python loop) and folded into
    the running counters via ``mg_merge``: exact batch counts are
    themselves an MG summary with zero error, and the guarantees hold
    under any merge schedule (Agarwal et al.), so per-batch folding is
    exactly as sound as per-item decrements — only ~batch_size times
    cheaper. Per-batch cost: O(batch) counting + O(d log d) for the
    merge cut, d <= k + distinct(batch)."""

    def build(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from itertools import chain

        counters: dict[str, int] = {}
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            if vc.empty:
                continue
            counters = mg_merge(
                chain(counters.items(), zip(vc.index, vc.to_numpy())), k
            )
        yield pd.DataFrame(
            {
                "item": pd.Series(list(counters.keys()), dtype="object"),
                "cnt": pd.Series(list(counters.values()), dtype="int64"),
            }
        )

    return df.select(col).mapInPandas(build, schema=_SUMMARY_SCHEMA)


def mg_merge(
    summaries: Iterable[tuple[str, int]], k: int = K_DEFAULT
) -> dict[str, int]:
    """Merge any number of MG summaries: sum counters per item, then if
    more than k remain, subtract the (k+1)-th largest counter value
    from every counter and drop the non-positive ones. Deterministic
    (pure arithmetic — no tie-break needed, equal-valued counters all
    shrink equally) and keeps the n/(k+1) undercount bound."""
    merged: dict[str, int] = {}
    for item, cnt in summaries:
        merged[item] = merged.get(item, 0) + int(cnt)
    if len(merged) > k:
        cut = sorted(merged.values(), reverse=True)[k]
        merged = {t: c - cut for t, c in merged.items() if c - cut > 0}
    return merged
