"""Per-entry construct / optimize / execute split for registry queries
(r17, r16 verdict #8: "re-run the registry construction sweep post-round
and COMMIT it so the next optimizer starts from measurements, not
archaeology").

For each entry this measures, after one full priming pass:

- ``construct_sec`` — the Python-side time for ``fn(spark, sf_dir)`` to
  return a DataFrame: pure driver/py4j plan assembly (guide §5 — the
  driver should do almost no work; the r16 rounds showed this phase was
  ~half the sf0.1 bench).
- ``optimize_sec`` — forcing ``queryExecution().optimizedPlan()``:
  Catalyst analysis + optimization of the constructed tree.
- ``execute_sec`` — the noop-sink write of the already-optimized frame
  (bench methodology, guide §1.4).

Each phase is the median of ``-n`` timed repetitions (default 3), with
``clearCache`` before every repetition so no run reads another's cache.
The sum of medians can differ slightly from an end-to-end wall reading
(phases measured on separate frames), so ``total_sec`` — the median
end-to-end noop run — is recorded too.

Usage:
    python tools/construct_sweep.py [-n RUNS] [--min-sec S] [--out F.json] \
        [query ...]           # default: every registry entry
"""

from __future__ import annotations

import json
import os
import sys
import time


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    n = len(xs)
    mid = xs[n // 2]
    return (xs[n // 2 - 1] + mid) / 2 if n % 2 == 0 else mid


def main() -> int:
    sys.path.insert(0, "/root/repo")
    args = sys.argv[1:]
    n_runs, min_sec, out_path = 3, 0.0, None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "-n":
            n_runs = int(args[i + 1]); i += 2
        elif args[i] == "--min-sec":
            min_sec = float(args[i + 1]); i += 2
        elif args[i] == "--out":
            out_path = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mempool_dumpster_spark.plans.registry import all_queries
    from mempool_dumpster_spark.session import get_spark

    queries = all_queries()
    names = names or sorted(queries)
    spark = get_spark("construct_sweep")

    results: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"construct_sweep:{name}")
        try:
            # one full priming pass (JIT, shuffle dirs, Python workers)
            spark.catalog.clearCache()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

            cons, opt, execu, total = [], [], [], []
            for _ in range(n_runs):
                spark.catalog.clearCache()
                t0 = time.time()
                df = fn(spark, sf_dir)
                t1 = time.time()
                df._jdf.queryExecution().optimizedPlan()
                t2 = time.time()
                df.write.format("noop").mode("overwrite").save()
                t3 = time.time()
                cons.append(t1 - t0)
                opt.append(t2 - t1)
                execu.append(t3 - t2)
                total.append(t3 - t0)
        except Exception as exc:  # a broken entry must not kill the sweep
            results[name] = {"error": str(exc)[:200]}
            continue
        finally:
            spark.sparkContext.setJobDescription(None)
        entry = {
            "construct_sec": round(_median(cons), 3),
            "optimize_sec": round(_median(opt), 3),
            "execute_sec": round(_median(execu), 3),
            "total_sec": round(_median(total), 3),
            "n": n_runs,
        }
        if entry["total_sec"] >= min_sec:
            results[name] = entry
        print(f"{name}: {entry}", flush=True)

    out = {
        "__meta__": {
            "sf_dir": sf_dir,
            "n_runs": n_runs,
            "min_sec": min_sec,
            "methodology": (
                "1 priming noop run, then per repetition: clearCache; "
                "construct=fn() wall; optimize=queryExecution()."
                "optimizedPlan() wall; execute=noop save wall; medians"
            ),
        },
        "entries": results,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
