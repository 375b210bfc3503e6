"""Per-application scratch space for staged fixtures and sinks.

Every staged layout the plans create (bucketed as-of tables, stream
source dirs, streaming checkpoints, sink outputs) lives under ONE
per-application temp root that is removed at interpreter exit, and
staged catalog tables register a best-effort DROP — so repeated
3-scale sweeps inside one session overwrite or reuse instead of
accumulating orphan mkdtemp dirs and catalog entries.

Kept in a private helper (not a plans module) so importing it never
registers queries.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import threading

_APP_ROOTS: dict[str, str] = {}


def scratch_dir(spark, prefix: str) -> str:
    """``mkdtemp`` under the session's auto-cleaned staging root.

    The root is created once per Spark application and ``rmtree``'d at
    interpreter exit, bounding on-disk accumulation to one live app's
    working set regardless of how many sf sweeps run."""
    app = spark.sparkContext.applicationId
    root = _APP_ROOTS.get(app)
    if root is None:
        root = tempfile.mkdtemp(prefix="tstables_stage_")
        _APP_ROOTS[app] = root
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=root)


# Process-wide writer lock, shared by the two session-conf-adjacent
# critical sections that a streaming foreachBatch can race in one
# process: the dynamic-overwrite toggle-and-restore below, and the
# epoch-append marker check+publish (operators/asof.py) — POSIX rename
# silently REPLACES an existing destination on RawLocalFileSystem, so
# without serialization two in-process appends could both pass the
# exists check and the second would clobber the first writer's crash
# evidence. Cross-process publication stays best-effort on local FS
# (HDFS-class stores enforce rename-refuses-existing themselves).
_OVERWRITE_LOCK = threading.Lock()


def dynamic_partition_overwrite(spark):
    """Context manager: run ``insertInto(..., overwrite=True)`` writes
    under ``spark.sql.sources.partitionOverwriteMode=dynamic``,
    serialized by a process-wide lock.

    The session conf is the ONLY lever — the per-write
    ``.option("partitionOverwriteMode", "dynamic")`` is silently
    IGNORED by the catalog-table insertInto path (verified r13: the
    option-only write truncated every untouched partition), so the
    toggle-and-restore must be made concurrency-safe instead: without
    the lock, two writers in one session (reachable via streaming
    foreachBatch) can interleave so one's restore lands between the
    other's set and write, running that write in STATIC mode and
    truncating every partition of its table."""
    from contextlib import contextmanager

    @contextmanager
    def _cm():
        with _OVERWRITE_LOCK:
            saved = spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "STATIC"
            )
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                yield
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)

    return _cm()


# Streamed scratch tables reused across invocations, keyed by
# (applicationId, prefix, caller-supplied identity). A pinned relation
# that is a pure function of its inputs should be staged ONCE per app —
# best-of-N bench repetition at 100x otherwise re-writes corpus-sized
# tables every run and exhausts the sweep box's disk (the staging
# root's rmtree only fires at interpreter exit).
#
# LRU-bounded (r14 verdict #5): a long-lived session running the full
# registry accumulates one catalog table + one JVM filesource-relation
# cache entry (file listing + schema, heap-resident) per staged pin —
# the r14 full-registry sf0.1 sweep OOM'd a 1 GB vanilla driver after
# ~200 queries of exactly this. Evicting drops the catalog entry
# (which invalidates the JVM relation cache) and reclaims the scratch
# bytes; an evicted pin that is consulted again is simply restaged —
# it is a pure function of its inputs by the cache_key contract.
# Values are (table_tag, scratch_dir). Insertion order == recency
# (dict preserves order; hits re-insert).
_STREAM_PINNED: dict = {}
_STREAM_PINNED_CAP = 48
_STREAM_PINNED_LOCK = threading.Lock()
# In-use refcounts (r15 verdict #7): full_key -> count of live
# hold_stream_pins scopes that touched the pin. Guarded by
# _STREAM_PINNED_LOCK. Eviction skips keys with refs > 0, so a plan
# constructed over the LRU tail cannot lose its files to a concurrent
# insert while its query scope is open.
_STREAM_PINNED_REFS: dict = {}
_PIN_SCOPES = threading.local()


def _note_pin_use(full_key) -> None:
    """Record that the current thread's innermost hold_stream_pins
    scope (if any) touched ``full_key``. Caller holds
    ``_STREAM_PINNED_LOCK``."""
    stack = getattr(_PIN_SCOPES, "stack", None)
    if stack:
        _STREAM_PINNED_REFS[full_key] = _STREAM_PINNED_REFS.get(full_key, 0) + 1
        stack[-1].append(full_key)


def _release_pin_refs(held: list) -> None:
    with _STREAM_PINNED_LOCK:
        for k in held:
            n = _STREAM_PINNED_REFS.get(k, 0) - 1
            if n <= 0:
                _STREAM_PINNED_REFS.pop(k, None)
            else:
                _STREAM_PINNED_REFS[k] = n


class _PinScope:
    """Handle yielded by ``hold_stream_pins``: ``transfer_to(df)`` moves
    the scope's refcounts onto ``df``'s LIFETIME (released by a weakref
    finalizer when the frame is garbage-collected) instead of at scope
    exit. This is what extends the eviction immunity past plan
    CONSTRUCTION to the frame's later EXECUTION (r16 advice: a
    concurrent foreachBatch thread staging >cap pins between the query
    fn returning and the driver's collect could otherwise evict a pin
    the plan still scans)."""

    def __init__(self, held: list):
        self.held = held
        self.transferred = False

    def transfer_to(self, obj) -> None:
        import weakref

        try:
            weakref.finalize(obj, _release_pin_refs, self.held)
        except TypeError:
            return  # not weakref-able: refs release at scope exit
        self.transferred = True


def hold_stream_pins():
    """Context manager: every staged pin touched by THIS THREAD inside
    the scope is refcounted and immune to LRU eviction until the scope
    exits — or, when the yielded scope's ``transfer_to(df)`` is called,
    until ``df`` is garbage-collected. The registry wrapper brackets
    each query's plan construction with it AND transfers the refs to
    the returned frame, so a pin a plan scans stays eviction-immune
    through the driver's execution of that frame for as long as the
    caller holds it (it must, to execute it). A frame held forever
    holds its pins' refs forever — bounded by live DataFrames, the
    caller's working set. Reentrant (nested scopes each hold their own
    touches)."""
    from contextlib import contextmanager

    @contextmanager
    def _cm():
        stack = getattr(_PIN_SCOPES, "stack", None)
        if stack is None:
            stack = _PIN_SCOPES.stack = []
        held: list = []
        scope = _PinScope(held)
        stack.append(held)
        try:
            yield scope
        finally:
            stack.pop()
            if not scope.transferred:
                _release_pin_refs(held)

    return _cm()


def _evict_stream_pins(spark, cap: int) -> None:
    """Drop least-recently-used staged pins beyond ``cap``, skipping
    in-use pins (refcount > 0 — a held pin may transiently push the
    registry over cap; it is reclaimed on the next insert after its
    scope closes). Caller must NOT hold ``_STREAM_PINNED_LOCK``: the
    victims are popped under the lock, but the catalog DROP and the
    rmtree run AFTER release so concurrent pin lookups never stall
    behind metastore calls (r15 advice). Best-effort on the catalog
    side (the metastore may belong to a finished app); the bytes go
    with the rmtree regardless."""
    victims: list = []
    with _STREAM_PINNED_LOCK:
        overflow = len(_STREAM_PINNED) - cap
        if overflow > 0:
            for key in list(_STREAM_PINNED):
                if overflow <= 0:
                    break
                if _STREAM_PINNED_REFS.get(key, 0) > 0:
                    continue
                victims.append(_STREAM_PINNED.pop(key))
                overflow -= 1
    for tag, d in victims:
        try:
            spark.sql(f"DROP TABLE IF EXISTS {tag}")
        except Exception:
            pass
        shutil.rmtree(d, ignore_errors=True)


def stream_pin(
    df,
    prefix: str,
    cache_key: tuple | None = None,
    bucket_by: str | None = None,
    num_buckets: int | None = None,
):
    """Materialize a multiply-consumed CORPUS-SIZED relation by
    STREAMING it into a scratch parquet table, the big-graph
    alternative to a localCheckpoint pin: checkpoint materialization
    holds one serialized per-task block in heap simultaneously (64 MB
    G1-humongous chunks — the 8g GCLocker OOM SCALE.md r12 measured),
    while a file write streams at constant memory and consumers
    re-scan files. ``cache_key``: a tuple identifying the relation as
    a pure function of its inputs (sf_dir + knobs) — when given, the
    staged table is reused per (applicationId, prefix, cache_key).
    ``bucket_by``/``num_buckets``: optionally bucket the staged table
    so key-clustered consumers (a groupBy or shuffle-hash join on the
    bucket key) read it with ZERO exchange — the graph_pagerank edge
    layout, available to any caller."""
    import uuid

    spark = df.sparkSession
    nb = None
    if bucket_by is not None:
        nb = num_buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    full_key = None
    if cache_key is not None:
        # the layout knobs are part of the relation's identity: a
        # cached UNBUCKETED table silently returned to a caller
        # expecting the bucketed zero-exchange scan regains the full
        # corpus-sized shuffle with no error (review r13)
        full_key = (
            spark.sparkContext.applicationId, prefix, cache_key, bucket_by, nb
        )
        with _STREAM_PINNED_LOCK:
            hit = _STREAM_PINNED.get(full_key)
            if hit is not None:
                # re-insert to refresh recency (dict order == LRU order)
                _STREAM_PINNED.pop(full_key)
                _STREAM_PINNED[full_key] = hit
                _note_pin_use(full_key)
                return spark.table(hit[0])
    tag = f"{prefix}_{uuid.uuid4().hex[:8]}"
    if bucket_by is not None:
        # repartition on the bucket key first (the stage_asof_epoch_
        # layout discipline): without it a T-task upstream writes up
        # to T x nb files — every later scan then pays the listing
        # and the per-bucket multi-file merge
        df = df.repartition(nb, bucket_by)
    w = df.write
    if bucket_by is not None:
        w = w.bucketBy(nb, bucket_by)
    d = scratch_dir(spark, prefix + "_")
    (
        w.option("path", d + "/d")
        .mode("overwrite")
        .saveAsTable(tag)
    )
    register_staged_table(spark, tag)
    if full_key is not None:
        # The miss path is check-then-stage with the lock released
        # during the corpus-sized write, so two foreachBatch threads
        # can stage the same full_key concurrently. Re-check under the
        # lock: if another thread already landed the key, ITS entry
        # stays tracked and this thread's freshly staged table/dir is
        # dropped (outside the lock) — a blind overwrite would orphan
        # the winner's catalog table from the LRU forever (r15 advice).
        with _STREAM_PINNED_LOCK:
            winner = _STREAM_PINNED.get(full_key)
            if winner is not None:
                _STREAM_PINNED.pop(full_key)
                _STREAM_PINNED[full_key] = winner  # refresh recency
            else:
                _STREAM_PINNED[full_key] = (tag, d)
            _note_pin_use(full_key)
        if winner is not None:
            try:
                spark.sql(f"DROP TABLE IF EXISTS {tag}")
            except Exception:
                pass
            shutil.rmtree(d, ignore_errors=True)
            return spark.table(winner[0])
        _evict_stream_pins(spark, _STREAM_PINNED_CAP)
    return spark.table(tag)


def register_staged_table(spark, table: str) -> None:
    """Best-effort DROP of a staged catalog table at interpreter exit.

    The data files live under ``scratch_dir`` (external tables), so the
    bytes are reclaimed by the root's ``rmtree`` either way; this keeps
    the metastore from accumulating dangling entries when the warehouse
    outlives the app (e.g. a derby metastore in the repo dir)."""

    def _drop() -> None:
        try:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        except Exception:
            pass  # JVM gateway may already be down at exit

    atexit.register(_drop)


_CONF_SCOPED: dict = {}
_CONF_SCOPED_LOCK = threading.Lock()


def _evict_dead_conf_twins() -> None:
    """Drop twin-cache entries whose parent's SparkContext has stopped:
    they pin dead SparkSession/SessionState pairs forever otherwise
    (the _APP_ROOTS per-app discipline applied to sessions). Caller
    holds ``_CONF_SCOPED_LOCK``."""
    dead = []
    for key, (parent, _twin) in _CONF_SCOPED.items():
        try:
            sc = parent.sparkContext
            if sc is None or sc._jsc is None:
                dead.append(key)
        except Exception:
            dead.append(key)
    for key in dead:
        _CONF_SCOPED.pop(key, None)


def conf_scoped_session(spark, overrides: dict):
    """A SQLConf-scoped twin of ``spark``: same SparkContext and
    external catalog, OWN SQLConf — the only scope that makes an
    EXECUTION-TIME conf local to one query's DataFrame. A set/restore
    around plan CONSTRUCTION is invisible to the driver's later
    execution of the returned frame, and a plain global set is exactly
    the named global trade this helper exists to avoid (SCALE.md r13
    bisection: AQE initialPartitionNum x8 buys the wedge census its 8g
    completion and costs dedup_near 1.6x at the 100x envelope — two
    right answers, one conf slot; r17 inverted the default so the
    census is the twin rider, see wide_initial_partitions).

    ``newSession()`` inherits only BUILDER-time confs (they live in the
    SparkContext conf), so the parent's explicitly-set runtime confs —
    the driver wrapper's UTC/NTZ/output-timestamp trio, harness shuffle
    sizing — are copied onto the clone first (``SET`` enumerates them;
    static entries that reject runtime set are skipped), then the
    overrides land on top. Cached per (app, overrides): SessionState
    construction is not free and queries re-run every round.

    Cache semantics (r14 advice): the twin snapshots the parent's
    runtime confs ONCE, at creation — a parent conf changed AFTER the
    twin is cached does NOT propagate to it (by design: the twin's
    whole point is an immutable per-query conf scope; callers that
    need a different base must pass it in ``overrides``). The cache is
    lock-guarded (streaming foreachBatch threads reach it) and evicts
    entries whose parent SparkContext has stopped, so a long-lived
    process cycling sessions does not pin dead SessionStates."""
    key = (
        spark.sparkContext.applicationId,
        id(spark),  # two sessions in one app must not share a clone
        tuple(sorted((str(k), str(v)) for k, v in overrides.items())),
    )
    with _CONF_SCOPED_LOCK:
        hit = _CONF_SCOPED.get(key)
        if hit is not None:
            return hit[1]
    s = spark.newSession()
    for r in spark.sql("SET").collect():
        k, v = r[0], r[1]
        if not k.startswith("spark.sql."):
            continue
        try:
            s.conf.set(k, v)
        except Exception:
            pass  # static conf (can only be set at builder time)
    for k, v in overrides.items():
        s.conf.set(k, str(v))
    # the PARENT rides in the cache entry: id(spark) is only a stable
    # key while the parent is alive, so pin it — a GC'd session's
    # reused id must never serve a twin cloned from a dead session
    with _CONF_SCOPED_LOCK:
        _evict_dead_conf_twins()
        # a racing builder may have landed the same key while we were
        # cloning — keep the first (both are valid; one clone leaks
        # nothing beyond its SessionState until app end)
        return _CONF_SCOPED.setdefault(key, (spark, s))[1]


def wide_initial_partitions(spark):
    """The conf-scoped twin with AQE's initialPartitionNum raised to 8x
    the shuffle floor — the INVERSE of r16's flat twin (r17 verdict #1):
    the engine global is now flat (session.py), because the x8 setting
    taxed every medium-cardinality shuffle chain ~1.4-1.6x at the 100x
    envelope (SCALE.md r13/r16 bisections) and had exactly ONE
    load-bearing consumer — the wedge census, whose uniformly-huge 100x
    shuffle needs >32 initial reduce partitions to keep per-task
    join/sort state under the 8g heap envelope (the r12 OOM). The
    census family binds its frames to this twin; results are identical
    (partition count only — AQE coalesces small stages back down)."""
    return conf_scoped_session(
        spark,
        {
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum": str(
                int(spark.conf.get("spark.sql.shuffle.partitions")) * 8
            )
        },
    )
