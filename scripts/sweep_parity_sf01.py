#!/usr/bin/env python
"""Full-registry PARITY sweep at sf0.1 (10x the driver's correctness
scale): every oracle-backed query is hash-compared against its DuckDB
twin; rows-only queries are executed and counted. Resumable via a
done-list (a JVM death resumes instead of restarting — the r14
lesson). Run detached on the engine session; the summary line lands
in $PARITY01_OUT (default SWEEP_PARITY01.json at the repo root).

Usage: python scripts/sweep_parity_sf01.py [sf_dir] [done_list]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DONE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_parity_sf01.done"


def main() -> None:
    import __spark_entry__ as E
    from tests.parity import duck_connect, run_parity

    Q, O = E.queries(), E.oracle_sql()
    done = set()
    if os.path.exists(DONE):
        with open(DONE) as f:
            done = {line.strip() for line in f if line.strip()}
    # oracle results first, then Spark (the EMFILE discipline) is not
    # practical for 276 queries; the engine session's NOFILE headroom
    # has handled per-query interleave in every r13+ sweep
    from tstables_spark import get_spark

    spark = get_spark("sweep_parity_sf01")
    con = duck_connect(SF_DIR)
    failed = {}
    t0 = time.time()
    for name, fn in Q.items():
        if name in done:
            continue
        try:
            if name in O:
                r = str(run_parity(spark, con, name, fn, O[name], SF_DIR))
                ok = "OK" in r
            else:
                n = fn(spark, SF_DIR).count()
                r, ok = f"rows-only ({n} rows)", n >= 0
            if not ok:
                failed[name] = r[:200]
            print(f"{name}: {r[:120]}", flush=True)
            if ok:
                with open(DONE, "a") as f:
                    f.write(name + "\n")
        except Exception as e:
            failed[name] = f"{type(e).__name__}: {str(e)[:200]}"
            print(f"{name}: FAILED {failed[name]}", flush=True)
    summary = {
        "sweep": "parity_sf01",
        "sf_dir": SF_DIR,
        "total": len(Q),
        "resumed_past": len(done),
        "failed": failed,
        "wall_s": round(time.time() - t0, 1),
    }
    out = os.environ.get(
        "PARITY01_OUT", os.path.join(REPO, "SWEEP_PARITY01.json")
    )
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
