#!/usr/bin/env python
"""100x replica sweeps for the events, text/dedup and graph families
(r11; companion to sweep_100x_ann.py — results in SCALE.md r11).

Replication follows the realistic growth axis:
- events: replica i shifts ts by +i days and remaps user_id to a
  disjoint range — per-user-per-day density constant, 100x longer
  history x 100x users (10M rows, ~9.9M distinct (user, 10-min bucket)
  memberships).
- documents: replica i tags EVERY token (regexp_replace " " ->
  " r{i}x"), so replicas share no shingles — this measures SIZE
  scaling. Do NOT use an append-one-tag replica for dedup sweeps: the
  replicas then share ~50/52 shingles and every doc gains 99 TRUE
  near-duplicates, which measures duplicate-cluster mass (quadratic in
  cluster depth, by design), not throughput. See SCALE.md r11.

Usage: python scripts/sweep_100x_families.py [events|docs|graph] [q1,q2,...]
The optional second argument overrides the family's query list (comma
separated) — e.g. `graph graph_pagerank,graph_triangles_approx` for the
r12 8g-box re-measurement.
Graph queries at 100x need headroom beyond the 8g default
(SPARK_GRAFT_DRIVER_MEM=24g for graph_pagerank; graph_triangles'
uncapped wedge shuffle additionally needs ~100 GB of spill disk).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
EVENT_QUERIES = [
    "ts_resample_ohlc", "win_rolling", "join_asof", "ts_sessionize",
    "ts_robust_zscore", "agg_histogram",
]
DOC_QUERIES = ["dedup_near", "dedup_minhash", "doc_bm25", "token_pmi",
               "lang_id", "token_count", "dedup_substring"]
# pipeline family (r11 one-off numbers, a per-round family since r15):
# runs on the docs fixture — CC over 100x cluster mass, the one-scan
# funnel, and the vocab/packing passes
PIPELINE_QUERIES = ["dedup_clusters", "pipeline_corpus_funnel",
                    "vocab_topk", "bpe_pair_counts", "pack_sequences",
                    "vocab_coverage_curve"]
GRAPH_QUERIES = ["graph_degree_dist", "graph_jaccard", "graph_pagerank",
                 "graph_triangles_doulion_p16"]
# The triangles family's standing 100x representative (r15 verdict #4):
# the EXACT census's uncapped wedge spill exceeds this box's free disk
# (r12: ~100 GB; the r15 attempt died of ENOSPC), so the artifact row
# is the documented disk-budgeted device — DOULION at p=1/16
# (cut='10'), whose wedge volume is p^2 = 1/256 of exact. Its estimate
# is cross-checked against the r12/r13 three-rate consensus (~30.3e9
# triangles at p=1/16 / 3/32 / 1/32, all within 0.3%), so the row
# carries both throughput AND accuracy evidence. Single rep at 100x:
# the estimate is deterministic (md5-coin sample), and 3 reps of a
# ~350 s census would dominate the whole sweep's budget.
_TRIANGLES_P16_CONSENSUS = 30_315_626_496  # r12 p=1/16 run, SCALE.md


def _run_triangles_p16(spark, QUERIES, base: str) -> dict:
    res = {}
    q = QUERIES["graph_triangles_approx"]
    for tag, d, reps in (("1x", SRC, 2), ("100x", base, 1)):
        best, est = None, None
        for _ in range(reps):
            t0 = time.perf_counter()
            rows = q(spark, d, cut="10").collect()  # 3-column, 1-row
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            est = rows[0]["est_triangles"]
            spark.sparkContext._jvm.System.gc()
            time.sleep(5)
        res[tag] = round(best, 2)
        res[f"{tag}_est_triangles"] = est
    res["sampling"] = "DOULION p=1/16 (cut='10'); exact census exceeds box disk"
    res["consensus_dev"] = round(
        abs(res["100x_est_triangles"] - _TRIANGLES_P16_CONSENSUS)
        / _TRIANGLES_P16_CONSENSUS,
        6,
    )
    print(json.dumps({"graph_triangles_doulion_p16": res}), flush=True)
    _record("graph_triangles_doulion_p16", res)
    return res


def build_events_fixture(spark, load, base: str, reps: int = 100) -> None:
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    ev = load(spark, SRC, "events")
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(i * 10_000_000)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {i} DAYS")).alias("ts"),
            (F.col("user_id") + F.lit(i * 100_000)).alias("user_id"),
            "event_type", "value", "props",
        )
        for i in range(reps)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(f"{base}/events.parquet")
    _copy_rest(base, skip="events")


def build_docs_fixture(spark, load, base: str, reps: int = 100) -> None:
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    docs = load(spark, SRC, "documents")
    rest = [c for c in docs.columns if c not in ("doc_id", "text")]
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.regexp_replace("text", " ", f" r{i:03d}x").alias("text"),
            *rest,
        )
        for i in range(reps)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(f"{base}/documents.parquet")
    _copy_rest(base, skip="documents")


def _copy_rest(base: str, skip: str) -> None:
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        src = f"{SRC}/{t}.parquet"
        if t != skip and os.path.exists(src):
            # Fixtures are single files today; a Spark-written fixture
            # would be a directory (ADVICE r11) — handle both.
            if os.path.isdir(src):
                shutil.copytree(src, f"{base}/{t}.parquet", dirs_exist_ok=True)
            else:
                shutil.copy(src, f"{base}/{t}.parquet")


def main() -> None:
    from tstables_spark import get_spark
    import tstables_spark.plans  # noqa: F401
    from tstables_spark.plans.registry import QUERIES
    from tstables_spark.plans.tables import load

    which = sys.argv[1] if len(sys.argv) > 1 else "events"
    spark = get_spark(f"sweep_100x_{which}")
    if which == "events" or which == "graph":
        base = "/tmp/events100x_fixture"
        if not os.path.exists(f"{base}/events.parquet"):
            build_events_fixture(spark, load, base)
        names = EVENT_QUERIES if which == "events" else GRAPH_QUERIES
    else:
        base = "/tmp/docs100x_fixture"
        if not os.path.exists(f"{base}/documents.parquet"):
            build_docs_fixture(spark, load, base)
        names = PIPELINE_QUERIES if which == "pipeline" else DOC_QUERIES
    if len(sys.argv) > 2:
        names = sys.argv[2].split(",")
    for name in names:
        if name == "graph_triangles_doulion_p16":
            _run_triangles_p16(spark, QUERIES, base)
            continue
        q = QUERIES[name]
        res = {}
        for tag, d in (("1x", SRC), ("100x", base)):
            def run():
                t0 = time.perf_counter()
                q(spark, d).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                # Shuffle files and checkpoint RDDs are only reaped by
                # ContextCleaner AFTER a JVM GC (default periodic GC:
                # 30 min) — back-to-back 100x runs otherwise stack tens
                # of GB of dead spill and exhaust the box's disk
                # (measured r12). Harness hygiene, outside the timing.
                # The cleaner drains ASYNC after the GC — give it a
                # beat so the next run starts against a drained pool.
                spark.sparkContext._jvm.System.gc()
                time.sleep(5)
                return dt
            run()
            res[tag] = round(min(run() for _ in range(2)), 2)
        print(json.dumps({name: res}), flush=True)
        _record(name, res)


def _record(name: str, res: dict) -> None:
    """Merge one query's {1x, 100x} walls into the per-round artifact
    (r14 verdict #8: the 100x-envelope claims must be judge-checkable
    round over round, the way bench.py emits BENCH_r{N}). The file is
    merged incrementally so a partial sweep still records; loadavg
    rides along for the same box-noise attribution the bench carries."""
    out = os.environ.get("SWEEP100X_OUT", os.path.join(REPO, "SWEEP100X.json"))
    # The ANN sweep and the families sweep share this artifact: the
    # read-modify-write is guarded by an flock on a sidecar lockfile and
    # the final write is tmp + os.replace, so two concurrently running
    # sweeps can neither interleave load/dump (dropping one writer's
    # rows) nor leave a torn file for a reader (r15 advice).
    import fcntl

    with open(out + ".lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        data: dict = {}
        if os.path.exists(out):
            try:
                with open(out) as f:
                    data = json.load(f)
            except ValueError:
                data = {}
        try:
            with open("/proc/loadavg") as f:
                loadavg = [float(x) for x in f.read().split()[:3]]
        except OSError:
            loadavg = None
        data.setdefault("queries", {})[name] = {**res, "loadavg": loadavg}
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
            f.write("\n")
        os.replace(tmp, out)


if __name__ == "__main__":
    main()
