"""Scale-friendly grouped-map: ``applyInPandas`` semantics without the
per-group round-trip cost.

Spark's native GROUPED_MAP (``df.groupBy(k).applyInPandas(fn)``) ships
ONE Arrow batch per group through the Python worker — measured ~16 ms of
fixed overhead per group in this environment (Spark 4.1, local[32]):
150 groups cost 2.4 s before ``fn`` runs a single instruction. That
per-group constant is invisible at toy group counts and fatal at scale,
where a 100 TB table groups by a million keys.

``grouped_apply_in_pandas`` keeps the semantics (``fn`` sees one pandas
DataFrame per distinct key, key columns included) but amortizes the
transfer: hash-repartition by the key columns — the SAME single shuffle
applyInPandas performs, so no extra data movement — then one
``mapInPandas`` pass per partition that concatenates the partition's
Arrow batches and runs a pandas ``groupby`` loop locally. Cost becomes
O(rows) Arrow transfer + one Python round-trip per PARTITION, not per
group; group count stops mattering. Memory model is unchanged from
applyInPandas (a whole group — here, a whole partition — must fit in
the worker; size partitions accordingly).

Use native ``applyInPandas`` only when groups are few and huge (e.g.
per-block matmul in operators/similarity.py, ~10 groups); use this
whenever group count is large relative to partition count.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd

from pyspark.sql import DataFrame


def grouped_apply_in_pandas(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``df.groupBy(*keys).applyInPandas(fn, schema)`` with per-partition
    (not per-group) Python round-trips. ``fn`` receives each group's rows
    as one DataFrame, key columns included, exactly like applyInPandas;
    group and row order within the result are not guaranteed (neither
    does applyInPandas guarantee them)."""
    keys = list(keys)
    parts = (
        df.repartition(num_partitions, *keys) if num_partitions else df.repartition(*keys)
    )

    def run(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        # dropna=False: null keys form a group, as in applyInPandas.
        outs = [fn(g) for _, g in pdf.groupby(keys, sort=False, dropna=False)]
        outs = [o for o in outs if o is not None and len(o)]
        if outs:
            # one yield per partition: output batching overhead is also
            # per-partition, not per-group
            yield pd.concat(outs, ignore_index=True)

    return parts.mapInPandas(run, schema)
