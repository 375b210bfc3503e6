"""Isolated per-query measurement: noop sink, warm pass + best-of-N,
task/cpu via the same REST status probe as bench.py.

Usage: python scripts/measure_queries.py [-nREPS] query [query ...]

Prints one JSON line {query: {"wall": s, "task": s, "cpu": s}, ...,
"loadavg": [...]}. Same session factory and methodology as bench.py so
numbers are comparable; this is the guide §1.1 empirical loop for one
query without paying for the whole headline set.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0].startswith("-n"):
        reps = int(args[0][2:])
        args = args[1:]
    names = args

    from tstables_spark import get_spark
    import tstables_spark.plans  # noqa: F401
    from tstables_spark.plans.registry import QUERIES

    import bench  # the REST probe lives there

    spark = get_spark(
        "tstables_spark_measure",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.retainedJobs": "20000",
            "spark.ui.retainedStages": "20000",
        },
    )
    sc = spark.sparkContext
    for name in names:
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    out: dict = {}
    groups_of: dict = {}
    for name in names:
        best = float("inf")
        groups_of[name] = []
        for rep in range(reps):
            group = f"measure:{name}:{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
            groups_of[name].append(group)
        sc.setLocalProperty("spark.jobGroup.id", None)
        out[name] = {"wall": round(best, 3)}
    tt = bench._group_task_times(spark, groups_of)
    for name, m in tt.items():
        out[name].update(m)
    out["loadavg"] = list(os.getloadavg())
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
