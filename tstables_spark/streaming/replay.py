"""The foreachBatch replay contract, in one place (r14 verdict #6).

``foreachBatch`` is AT-LEAST-ONCE: a crash after the user function
returns but before the streaming commit re-invokes it with the same
batch id and the same rows. Every maintainer in this engine therefore
declares which of three disciplines makes its state exactly-once in
effect — the first two are implemented here; the third lives in the
storage verbs it rides on:

1. **Snapshot-per-batch-id fold** (``SnapshotFold``) — for driver-held
   folds whose merge is NOT idempotent (Misra-Gries subtract-merge,
   KLL weight fold): state is snapshotted per batch id and batch b
   always folds from snapshot b-1, so a replay of b recomputes from
   the same predecessor and lands on the bit-identical snapshot
   (deterministic pure arithmetic). A restarted PROCESS has no
   predecessor snapshot and fails LOUDLY — driver-held state cannot
   survive a driver restart, and folding from empty would silently
   drop every prior batch's weight.

2. **Attempt-versioned state paths** (``VersionedPathFold``) — for
   parquet-materialized folds whose merge IS naturally idempotent
   (KMV/theta: re-merging already-folded rows dedups to the same
   k-smallest set). The state path is versioned by a monotone ATTEMPT
   counter, not the batch id: a replayed batch id would otherwise
   read AND overwrite the same path, which Spark rejects (stalling
   the query); a fresh path per attempt keeps the natural idempotence
   usable on replay.

3. **Idempotent storage writes** (not in this module) — maintainers
   whose state IS a table delegate replay to the write verb:
   ``stream_asof_epochs`` appends with
   ``append_asof_epoch_layout(idempotent=True)`` (a replayed batch's
   rows are excluded by multiset difference against the touched
   epochs; operators/asof.py), and ``stream_asof`` dynamic-overwrites
   its own ``bid=<batch id>`` output partition instead of appending a
   duplicate (plans/streaming_q.py).
"""

from __future__ import annotations

import shutil
from typing import Callable


class SnapshotFold:
    """Snapshot-per-batch-id driver-held fold — discipline (1).

    ``fold(prev_state, batch_df, bid) -> new_state`` must be a pure
    function of its inputs (same predecessor + same rows -> identical
    state), which is exactly what makes a replay land on the identical
    snapshot. ``prev_state`` is ``initial`` for batch 0 and for any
    batch whose predecessor snapshot was GC'd... which cannot happen:
    only the predecessor is retained and a missing one raises.

    Use as the ``foreachBatch`` callable; read ``.result()`` after
    ``awaitTermination()``.
    """

    def __init__(self, fold: Callable, *, name: str, initial=None):
        self._fold = fold
        self._name = name
        self._initial = initial
        self._snaps: dict[int, object] = {}

    def __call__(self, batch, bid: int) -> None:
        if bid > 0 and (bid - 1) not in self._snaps:
            # a restarted query resumes at bid with EMPTY process-local
            # state: folding from the initial value would silently drop
            # every prior batch's weight — fail loudly instead
            raise RuntimeError(
                f"{self._name}: batch {bid} has no predecessor snapshot "
                f"— process restarted mid-stream; driver-held state "
                f"cannot be recovered, restart the query with a fresh "
                f"checkpoint"
            )
        prev = self._snaps.get(bid - 1, self._initial)
        self._snaps[bid] = self._fold(prev, batch, bid)
        self._snaps.pop(bid - 2, None)  # replay window: predecessor only

    def result(self):
        """The latest snapshot, or the initial value if no batch ran."""
        return (
            self._snaps[max(self._snaps)] if self._snaps else self._initial
        )


class VersionedPathFold:
    """Attempt-versioned parquet state paths — discipline (2).

    ``merge(prev_path_or_None, batch_df, new_path)`` reads the previous
    state (if any), folds the batch in, and writes ``new_path``. The
    merge must be idempotent under row replay (KMV truncation is); this
    class only supplies the fresh-path-per-attempt bookkeeping that
    keeps that idempotence usable when a batch id is re-delivered.
    """

    def __init__(self, base: str, merge: Callable):
        self._base = base
        self._merge = merge
        self._attempt = 0
        self._path: str | None = None

    def __call__(self, batch, bid: int) -> None:
        if bid > 0 and self._path is None:
            # a checkpointed query resuming in a NEW process re-enters
            # at bid>0 with this object freshly constructed: merging
            # from prev=None would silently fold from EMPTY state,
            # dropping every prior batch's rows — the same silent
            # underweight SnapshotFold raises loudly for (r15 advice).
            # The state path is process-local bookkeeping, so it cannot
            # be recovered from the checkpoint; restart fresh.
            raise RuntimeError(
                f"VersionedPathFold({self._base}): batch {bid} arrived "
                f"with no in-process state path — process restarted "
                f"mid-stream; restart the query with a fresh checkpoint "
                f"(the attempt-path bookkeeping is process-local)"
            )
        self._attempt += 1
        newp = f"{self._base}/v{self._attempt}"
        prev = self._path
        # A FAILED prior attempt may have partially written its dir
        # before raising: its path never advanced self._path, so the
        # last-good GC below never sees it and it would leak forever —
        # and the soak's O(1)-dirs assertion would then fail on the
        # next healthy batch (r16 advice). The previous attempt's path
        # is an orphan exactly when it differs from the published one.
        if self._attempt > 1:
            stale = f"{self._base}/v{self._attempt - 1}"
            if stale != prev:
                shutil.rmtree(stale, ignore_errors=True)
        self._merge(prev, batch, newp)
        self._path = newp
        # GC the superseded attempt (r15 verdict #3): the replay window
        # only ever needs the CURRENT path — a failed attempt never
        # advanced self._path, so `prev` is provably the last GOOD state
        # and is superseded the moment newp lands. Without this a
        # long-lived stream leaves one state dir per trigger, unbounded.
        # Best-effort and local-FS only (these dirs come from
        # scratch_dir); a missed delete is reclaimed at interpreter exit.
        if prev is not None:
            shutil.rmtree(prev, ignore_errors=True)

    @property
    def path(self) -> str | None:
        """The current state parquet path (None if no batch ran)."""
        return self._path
