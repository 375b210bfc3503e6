"""Skew mitigation: salted equi-join.

A shuffle join keyed on a skewed column puts every row of the hot key
in ONE reducer — the task that runs for hours while 999 executors idle.
AQE's skew-join handles the sort-merge case adaptively
(`spark.sql.adaptive.skewJoin.enabled`, on in session.py), but only
splits partitions that exceed its thresholds AFTER a first shuffle;
salting is the explicit, planable fix and the only one available when
the join must be shuffled-hash or the skew is known up front.

Shape: the fact side gets a uniform salt in [0, S); the dimension side
is replicated S times, once per salt value; the join key becomes
(key, salt), spreading each hot key over S reducers. For inner and
left-family joins the output is row-for-row IDENTICAL to the unsalted
join (every fact row still meets every matching dim row exactly once —
on the one salt it carries), so the oracle twin is the plain join;
joins preserving unmatched DIM rows (right/full) are rejected because
the S× replication would duplicate them. Cost: S× replication of the smaller
side — use per-key salting (only the known-hot keys) when S× the whole
dimension is too much.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on ``on``, spreading each key
    over ``salt`` reducers. Result equals ``fact.join(dim, on, how)``
    exactly FOR THE INNER/LEFT FAMILY (every fact row still meets every
    matching dim row exactly once — on the one salt it carries); only
    the shuffle distribution changes. Right/full/right_semi joins are
    NOT equivalent — the replicated dim side would emit every unmatched
    dim row ``salt`` times — so those are rejected (ADVICE r2). The salt
    value is irrelevant to the output (any per-row assignment works), so
    ``rand`` is safe here despite being nondeterministic under task
    retry."""
    safe = {"inner", "left", "left_outer", "leftouter", "left_semi",
            "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in safe}:
        raise ValueError(
            f"salted_join only preserves join semantics for {sorted(safe)}; "
            f"got how={how!r} (the salt-replicated dim side would duplicate "
            f"unmatched dim rows)"
        )
    f = fact.withColumn("__salt", F.floor(F.rand(42) * salt).cast("int"))
    d = dim.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return f.join(d, [on, "__salt"], how).drop("__salt")
