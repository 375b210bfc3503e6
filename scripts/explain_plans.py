"""Emit ``explain("formatted")`` for a set of registry queries.

Usage: python scripts/explain_plans.py OUTDIR SUFFIX [query ...]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` for each name. Runs against
$SPARK_GRAFT_SF_DIR (default sf0.1), same session factory as bench.py,
so the plan shape (Exchange count, join strategy, PushedFilters,
Python-eval nodes) matches what the bench actually executes. The plan
is captured from the query frame's own session (conf-twin queries
return frames bound to their twin), so scoped conf (e.g. AQE
initialPartitionNum) is reflected in the printed plan.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from tstables_spark import get_spark
    import tstables_spark.plans  # noqa: F401
    from tstables_spark.plans.registry import QUERIES

    spark = get_spark("tstables_spark_explain")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        df = QUERIES[name](spark, SF_DIR)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")

    spark.stop()


if __name__ == "__main__":
    main()
