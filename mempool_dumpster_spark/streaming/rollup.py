"""Incremental materialized rollups over the hourly-bucketed archive.

The archive answers "what happened at 14:32" cheaply (partition pruning,
streaming/collector.py ST2 + compact.py), but dashboard queries — per-hour
counts, per-source volumes, daily uniques — re-scan every partition they
touch. At 100 TB a daily rollup that re-reads the month is the single
most wasteful recurring job on the cluster. The reference never faces
this (its summary is one in-process pass over one day's files,
common/analyzer.go); a cluster archive needs MAINTAINED rollups.

`incremental_rollup` keeps a per-partition aggregate table beside the
archive and recomputes ONLY partitions whose file set changed:

- a FINGERPRINT per leaf partition (file count, total bytes, max mtime)
  is compared against the previous run's state; unchanged partitions are
  not even opened — the steady-state cost of the hourly cron is one
  partition;
- each changed partition is aggregated independently (`agg` is a
  per-partition DataFrame → small-DataFrame function) and written to the
  SAME relative path under the rollup root, so the rollup inherits the
  archive's partition layout and `spark.read.parquet(rollup_root)`
  restores the partition columns from the paths;
- vanished partitions (retention deletes) drop their rollup directory;
- state updates only for partitions that committed, so a failure mid-run
  re-does exactly the unfinished partitions next cycle (aggregates are
  deterministic → idempotent);
- the state file and any work dirs are underscore-prefixed, invisible to
  partition discovery.

Correctness contract: `agg` must be an ALGEBRAIC per-partition aggregate
(counts, sums, min/max, or anything whose global answer is derived by
re-aggregating partition results — the same contract as Spark's partial
aggregation). Non-decomposable aggregates (exact global distinct) need
the sketch twins or a full pass — store a mergeable sketch IN the rollup
(`hll_sketch_agg` per partition, `hll_union_agg` at query time; tested
in tests/test_streaming.py::test_incremental_rollup_mergeable_hll_sketches)
and the global distinct stays incremental too.

On object stores, the per-partition overwrite becomes a table-format
commit (Iceberg/Delta); the change-detection plan above it is unchanged —
same note as streaming/compact.py.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mempool_dumpster_spark.streaming.compact import (
    _leaf_partitions,
    _partition_files,
)

STATE_FILE = "_rollup_state.json"


def _fingerprint(part_dir: str) -> list:
    files = _partition_files(part_dir)
    sizes = [os.stat(f) for f in files]
    return [
        len(files),
        sum(s.st_size for s in sizes),
        max((s.st_mtime_ns for s in sizes), default=0),
    ]


def incremental_rollup(
    spark: SparkSession,
    root: str,
    rollup_root: str,
    agg: Callable[[DataFrame], DataFrame],
    files_per_partition: int = 1,
) -> dict[str, int]:
    """Bring the rollup at `rollup_root` up to date with the archive at
    `root`, recomputing only changed partitions. Returns
    {'changed': n, 'removed': n, 'unchanged': n}."""
    os.makedirs(rollup_root, exist_ok=True)
    state_path = os.path.join(rollup_root, STATE_FILE)
    state: dict[str, list] = {}
    if os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)

    parts = _leaf_partitions(root)
    current = {os.path.relpath(p, root): _fingerprint(p) for p in parts}
    changed = [rel for rel, fp in current.items() if state.get(rel) != fp]
    removed = [rel for rel in state if rel not in current]

    committed = dict(state)
    for rel in removed:
        shutil.rmtree(os.path.join(rollup_root, rel), ignore_errors=True)
        committed.pop(rel, None)
    # Refresh via hidden work dirs + rename swap, never mode('overwrite')
    # on the live partition: Spark's overwrite truncates then rewrites
    # over seconds, during which a concurrent rollup reader sees an
    # empty/partial partition. The swap window here is two renames
    # (microseconds), and a crash inside it self-heals: the state file is
    # only advanced after the swap, so the next run recomputes this
    # partition from the archive.
    work_root = os.path.join(rollup_root, "_rollup_work")
    shutil.rmtree(work_root, ignore_errors=True)
    for rel in changed:
        out = agg(spark.read.parquet(os.path.join(root, rel)))
        work = os.path.join(work_root, "staging", rel)
        retired = os.path.join(work_root, "retired", rel)
        (
            out.coalesce(files_per_partition)
            .write.mode("overwrite")
            .parquet(work)
        )
        live = os.path.join(rollup_root, rel)
        os.makedirs(os.path.dirname(retired), exist_ok=True)
        shutil.rmtree(retired, ignore_errors=True)
        if os.path.isdir(live):
            os.rename(live, retired)
        else:
            os.makedirs(os.path.dirname(live), exist_ok=True)
        os.rename(work, live)
        shutil.rmtree(retired, ignore_errors=True)
        committed[rel] = current[rel]
        # persist state after EVERY commit: a crash re-does only the
        # partitions after this one (tiny file, one json dump per changed
        # partition — the hourly steady state changes a single partition)
        tmp = state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(committed, f)
        os.replace(tmp, state_path)
    if not changed and removed:
        tmp = state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(committed, f)
        os.replace(tmp, state_path)
    shutil.rmtree(work_root, ignore_errors=True)
    return {
        "changed": len(changed),
        "removed": len(removed),
        "unchanged": len(current) - len(changed),
    }
