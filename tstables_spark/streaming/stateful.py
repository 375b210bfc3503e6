"""Custom stateful streaming: per-key running aggregates via
applyInPandasWithState (arbitrary state, Arrow-batched).

The canonical use over the reference's data model: maintain per-series
running statistics (count / sum / last value) as ticks arrive, emitting
the updated state every micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_value double"
# "last" is by EVENT TIME (max (ts, event_id)), not arrival order: the
# state carries the winning key so late/out-of-order micro-batches — and
# a group's rows arriving split across several Arrow chunks within one
# batch — can never regress it. This is what makes the end-of-stream
# state deterministic and batch-reproducible (stream_stateful's oracle).
STATE_SCHEMA = "n bigint, total double, last_ts bigint, last_eid bigint, last double"

# "No state yet" sentinel for the (ts, eid) max-tracking: int64 min, so
# ANY real row beats it. (-1, -1) would silently out-rank every
# pre-epoch event (negative micros), leaving last_value NaN while
# n/total still counted those rows.
_NO_TS, _NO_EID = -(2**63), -(2**63)


def _chunk_last(pdf: pd.DataFrame) -> tuple[int, int, float]:
    """(ts_micros, event_id, value) of the chunk's max-(ts, event_id) row."""
    idx = pdf[["ts", "event_id"]].sort_values(["ts", "event_id"]).index[-1]
    row = pdf.loc[idx]
    return int(pd.Timestamp(row["ts"]).value // 1000), int(row["event_id"]), float(row["value"])


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last_ts, last_eid, last = (
        state.get if state.exists else (0, 0.0, _NO_TS, _NO_EID, float("nan"))
    )
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        total += float(pdf["value"].sum())
        c_ts, c_eid, c_val = _chunk_last(pdf)
        if (c_ts, c_eid) > (last_ts, last_eid):
            last_ts, last_eid, last = c_ts, c_eid, c_val
    state.update((n, total, last_ts, last_eid, last))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total], "last_value": [last]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user running stats; one output row per user per
    micro-batch (Update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="Update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """Same per-user running stats on the Spark 4.x
    ``transformWithStateInPandas`` API (typed state variables on a
    StatefulProcessor instead of a raw state tuple; state is stored in
    the RocksDB-backed state store on a real cluster, so per-key state
    scales past executor memory — the forward path for custom stateful
    ops)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total, last_ts, last_eid, last = (
                self._state.get()
                if self._state.exists()
                else (0, 0.0, _NO_TS, _NO_EID, float("nan"))
            )
            for pdf in rows:
                if not len(pdf):
                    continue
                n += len(pdf)
                total += float(pdf["value"].sum())
                c_ts, c_eid, c_val = _chunk_last(pdf)
                if (c_ts, c_eid) > (last_ts, last_eid):
                    last_ts, last_eid, last = c_ts, c_eid, c_val
            self._state.update((n, total, last_ts, last_eid, last))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total], "last_value": [last]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


V_OUTPUT_SCHEMA = "user_id bigint, event_id bigint, ts bigint, depth double"
# The carried context: the last (up to) 4 rows of each user's sequence,
# flattened to fixed slots — a V-trough needs exactly +-2 rows of
# context, so 4 carried rows are sufficient for every cross-batch
# pattern and the state is CONSTANT size regardless of stream length.
V_STATE_SCHEMA = (
    "s int, "
    "t0 bigint, t1 bigint, t2 bigint, t3 bigint, "
    "e0 bigint, e1 bigint, e2 bigint, e3 bigint, "
    "v0 double, v1 double, v2 double, v3 double"
)


def _v_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Detect strict V-troughs (b2 > b1 > v < a1 < a2) in a user's
    in-order value sequence across micro-batches. Rows of one batch are
    sorted by (ts, event_id) before scanning (group rows arrive shuffle
    -ordered WITHIN a batch); batches themselves must arrive in event-
    time order — the standard in-order-source CEP contract, satisfied
    by the file stream's time-ordered fixture and documented in
    stream_pattern. Positions 0..s-3 of the carried suffix were fully
    checked last batch (both their following rows existed), so the scan
    starts at max(2, s-2): every trough is emitted exactly once."""
    (user_id,) = key
    if state.exists:
        st = state.get
        s = st[0]
        carried = [(st[1 + i], st[5 + i], st[9 + i]) for i in range(s)]
    else:
        carried = []
    chunks = [p for p in pdfs if len(p)]
    batch = pd.concat(chunks, ignore_index=True) if chunks else None
    new = []
    if batch is not None and len(batch):
        batch = batch.sort_values(["ts", "event_id"])
        new = [
            (int(pd.Timestamp(r.ts).value // 1000), int(r.event_id), float(r.value))
            for r in batch.itertuples()
        ]
    seq = carried + new
    out = []
    for i in range(max(2, len(carried) - 2), len(seq) - 2):
        b2, b1, v, a1, a2 = (
            seq[i - 2][2], seq[i - 1][2], seq[i][2], seq[i + 1][2], seq[i + 2][2],
        )
        if b2 > b1 and b1 > v and v < a1 and a1 < a2:
            out.append((user_id, seq[i][1], seq[i][0], min(b1, a1) - v))
    tail = seq[-4:]
    pad = [(0, 0, 0.0)] * (4 - len(tail))
    full = tail + pad
    state.update(
        (
            len(tail),
            *[t[0] for t in full],
            *[t[1] for t in full],
            *[t[2] for t in full],
        )
    )
    yield pd.DataFrame(out, columns=["user_id", "event_id", "ts", "depth"])


def v_pattern_stream(events: DataFrame) -> DataFrame:
    """Streaming V-shape detector (see plans/streaming_q.py::
    stream_pattern): per-user bounded-state CEP over
    applyInPandasWithState, Append mode (each trough emitted once, in
    the batch where its full +-2 context first exists)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _v_update,
        outputStructType=V_OUTPUT_SCHEMA,
        stateStructType=V_STATE_SCHEMA,
        outputMode="Append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
