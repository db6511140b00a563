"""Small-file compaction for the hourly-bucketed archive (ST2's output).

A streaming collector writes `date=…/hour=…/part-*.parquet` continuously:
every micro-batch × every task emits a file, so a day on a busy cluster
leaves thousands of KB-sized files per hour — and at read time each one
costs a scan task plus object-store round-trips, which is what actually
kills 100 TB archive queries (the reference sidesteps this by buffering
in ONE process and writing one CSV per hour, collector/output.go — a
shape that can't scale past one box).

`compact_partitions` rewrites each hour's files into ~`target_file_bytes`
parquet files. Design points:

- **Incremental**: partitions already at ≤ the target layout are skipped,
  so running it every hour only touches the hour that just closed.
- **Per-partition jobs, not one global shuffle**: each partition is read,
  coalesced to `ceil(bytes/target)` files, and swapped in independently —
  a failure mid-run leaves every other partition intact, and the work for
  one hour never reshuffles the rest of the day.
- **Write-then-rename swap**: the new files land in a staging dir next to
  the partition and replace it with two renames. On a POSIX/HDFS-style
  filesystem the windows are tiny; an object-store deployment would swap
  the rename for a manifest/table-format commit (Iceberg/Delta) — the
  compaction plan above it is unchanged.
- `coalesce`, not `repartition`: compaction must not shuffle — it only
  narrows the file fan-in, keeping the write a single read-merge pass.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

PARQUET_FOOTER_OVERHEAD = 1.15  # recompressed output runs slightly smaller


def _leaf_partitions(root: str) -> list[str]:
    """Directories under `root` that directly hold parquet files (any
    `key=value` nesting depth)."""
    leaves = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") for f in filenames):
            leaves.append(dirpath)
    return sorted(leaves)


def _partition_files(d: str) -> list[str]:
    return [
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    ]


def compact_partitions(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict:
    """Compact every leaf partition under `root` whose parquet-file count
    exceeds both `min_files_to_compact` and the count the target size
    implies. Returns stats: partitions seen/compacted, files before/after.
    """
    seen = compacted = files_before = files_after = 0
    for part_dir in _leaf_partitions(root):
        seen += 1
        files = _partition_files(part_dir)
        total = sum(os.path.getsize(f) for f in files)
        want = max(1, int(total * PARQUET_FOOTER_OVERHEAD // target_file_bytes) + 1)
        if len(files) < max(min_files_to_compact, want + 1):
            continue
        staging = part_dir + "__compacting"
        retired = part_dir + "__retired"
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(retired, ignore_errors=True)
        # Read THIS partition's files only — partition values live in the
        # directory name, not the rows, so the rewrite is value-identical.
        (
            spark.read.parquet(*files)
            .coalesce(want)
            .write.mode("overwrite")
            .option("compression", "gzip")
            .parquet(staging)
        )
        os.rename(part_dir, retired)
        os.rename(staging, part_dir)
        # Spark leaves _SUCCESS markers; harmless, but drop for cleanliness.
        marker = os.path.join(part_dir, "_SUCCESS")
        if os.path.exists(marker):
            os.remove(marker)
        shutil.rmtree(retired)
        compacted += 1
        files_before += len(files)
        files_after += len(_partition_files(part_dir))
    return {
        "partitions_seen": seen,
        "partitions_compacted": compacted,
        "files_before": files_before,
        "files_after": files_after,
    }
