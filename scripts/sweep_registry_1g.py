#!/usr/bin/env python
"""Full-registry execute-only sweep on a 1 GB VANILLA driver (r14
verdict #5's acceptance check): the r14 full-registry sf0.1 sweep
OOM'd a 1 GB driver after ~200 queries of ACCUMULATED staged state
(one catalog table + one JVM filesource-relation cache entry per
staged pin, never evicted). With the _staging LRU (cap 48) the same
session's scratch footprint is bounded, so the whole registry should
fit the bare-default heap.

Vanilla session on purpose — no engine confs, Spark's bare 1g driver
default, local[8] — mirroring the r14 harness that died. Each query
runs end-to-end via .count() (rows-only: the parity evidence lives in
the driver windows and test_parity; THIS sweep is a memory-bound
proof). A done-list makes a JVM death resumable instead of restarted.

Usage: python scripts/sweep_registry_1g.py [sf_dir] [done_list_path]
Prints one line per query; a final JSON summary line on completion,
also written to $SWEEP1G_OUT (default SWEEP1G.json at the repo root —
the standing per-round artifact, r15 verdict #8: driver-side state
regressions should show up as a number in review, not as an OOM two
rounds later). The summary carries peak driver heap from the JVM's
memory-pool MXBeans."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DONE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_registry_1g.done"


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E

    Q = E.queries()
    done = set()
    if os.path.exists(DONE):
        with open(DONE) as f:
            done = {line.strip() for line in f if line.strip()}
    failed = {}
    t_start = time.time()
    for name, fn in Q.items():
        if name in done:
            continue
        t0 = time.perf_counter()
        try:
            n = fn(spark, SF_DIR).count()
            print(
                f"{name}: {n} rows in {time.perf_counter() - t0:.1f}s",
                flush=True,
            )
            with open(DONE, "a") as f:
                f.write(name + "\n")
        except Exception as e:  # record and continue: the sweep maps
            # the whole envelope; one failure must not hide the rest
            failed[name] = f"{type(e).__name__}: {str(e)[:200]}"
            print(f"{name}: FAILED {failed[name]}", flush=True)
    # Peak driver heap across the sweep (sum of heap-pool peak usage —
    # the number the 1 GB bound is about). Best-effort: a py4j hiccup
    # must not void the pass/fail evidence.
    peak_heap_mb = None
    try:
        mf = spark._jvm.java.lang.management.ManagementFactory
        it = mf.getMemoryPoolMXBeans().iterator()
        total = 0
        while it.hasNext():
            b = it.next()
            if "HEAP" in b.getType().name().upper():
                total += b.getPeakUsage().getUsed()
        peak_heap_mb = round(total / (1024 * 1024), 1)
    except Exception:
        pass
    summary = {
        "sweep": "registry_1g",
        "sf_dir": SF_DIR,
        "total": len(Q),
        "ran": len(Q) - len(done),
        "resumed_past": len(done),
        "passed": len(Q) - len(failed),
        "failed": failed,
        "wall_s": round(time.time() - t_start, 1),
        "peak_driver_heap_mb": peak_heap_mb,
    }
    out = os.environ.get("SWEEP1G_OUT", os.path.join(REPO, "SWEEP1G.json"))
    try:
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
            f.write("\n")
        os.replace(tmp, out)
    except OSError:
        pass
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
