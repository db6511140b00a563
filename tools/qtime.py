"""Isolated per-query timing harness for the optimization rounds.

Times registry queries exactly the way bench.py does (sf dir from
$SPARK_GRAFT_SF_DIR, master local[$SPARK_GRAFT_CPUS], noop sink,
clearCache before every attempt, 2 priming + N timed runs, median) but
for a chosen subset — so one query's A/B can be measured in ~30 s
instead of a full bench run, with the box otherwise idle.

Usage: python tools/qtime.py [-n RUNS] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    sys.path.insert(0, "/root/repo")
    args = [a for a in sys.argv[1:]]
    n_runs = 5
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mempool_dumpster_spark.plans.registry import all_queries
    from mempool_dumpster_spark.session import get_spark

    queries = all_queries()
    spark = get_spark("qtime")
    for name in args:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        runs: list[float] = []
        for i in range(2 + n_runs):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if i >= 2:
                runs.append(dt)
        runs.sort()
        med = runs[len(runs) // 2]
        print(
            f"{name:30s} med {med:6.3f}  min {runs[0]:6.3f}  "
            f"max {runs[-1]:6.3f}  n {len(runs)}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
