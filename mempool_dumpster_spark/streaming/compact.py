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
- **Live-partition aware**: a partition with a file modified within
  `quiesce_seconds` is skipped — the hour the collector is still writing
  is never compacted under it; late data just defers that hour one cycle.
- **Concurrent-append safe**: the file set is re-checked after the
  (slow) Spark rewrite and the swap aborts if it changed; files that
  race into the microsecond rename window are rescued from the retired
  dir before it is deleted. Nothing appended during compaction is lost.
- **Invisible work dirs**: staging/retired live under `root/_compaction`
  — the leading underscore keeps them out of Spark/Hadoop partition
  discovery (hiddenFileFilter), so concurrent readers never see a
  partition value like `hour=00__compacting` or double-counted rows.
- **Crash recoverable**: a run killed between the two renames leaves the
  partition's data intact under `_compaction/retired/...`; the next run
  restores it before doing any new work (stale staging is discarded —
  it is always a re-derivable copy).
- **Per-partition jobs, not one global shuffle**: each partition is
  read, `coalesce`d (never shuffled) to `ceil(bytes/target)` files, and
  swapped independently — a failure mid-run leaves every other
  partition intact.

On a POSIX/HDFS filesystem the swap windows are tiny; an object-store
deployment would replace the renames with a manifest/table-format commit
(Iceberg/Delta) — the compaction plan above it is unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import SparkSession

PARQUET_FOOTER_OVERHEAD = 1.15  # recompressed output runs slightly smaller
WORK_DIR = "_compaction"  # underscore prefix: hidden from partition discovery


def _leaf_partitions(root: str) -> list[str]:
    """Directories under `root` that directly hold parquet files (any
    `key=value` nesting depth). Hidden dirs (`_…`, `.…`) are pruned — they
    are work/metadata dirs (`_compaction`, `_temporary`), not partitions."""
    leaves = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
        if any(f.endswith(".parquet") for f in filenames):
            leaves.append(dirpath)
    return sorted(leaves)


def _partition_files(d: str) -> list[str]:
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


def _recover(root: str) -> int:
    """Restore partitions stranded by a crash mid-swap: anything under
    `retired/` whose live partition dir vanished is renamed back; files the
    live dir does have already are merged in (never overwritten). Staging
    leftovers for a partition mean the fallback merge never finished, so
    the partition is rolled BACK to the retired originals (the live dir's
    partially-moved compacted files are dropped) — only then is staging
    discarded as the re-derivable copy it is."""
    restored = 0
    staging_root = os.path.join(root, WORK_DIR, "staging")
    retired_root = os.path.join(root, WORK_DIR, "retired")
    if os.path.isdir(retired_root):
        for dirpath, _dirnames, filenames in os.walk(retired_root):
            if not any(f.endswith(".parquet") for f in filenames):
                continue
            rel = os.path.relpath(dirpath, retired_root)
            live = os.path.join(root, rel)
            staging = os.path.join(staging_root, rel)
            staging_leftovers = os.path.isdir(staging) and any(
                f.endswith(".parquet") for f in os.listdir(staging)
            )
            if not os.path.exists(live):
                # crash BETWEEN the two swap renames: the retired dir IS the
                # partition — restore it wholesale
                os.makedirs(os.path.dirname(live), exist_ok=True)
                os.rename(dirpath, live)
            elif staging_leftovers:
                # crash MID-MERGE in the fallback branch: the live dir holds
                # only SOME of the compacted files — treating the swap as
                # complete would lose the rows in the files still sitting in
                # staging. Roll back: drop the partially-moved compacted
                # files (named in the staging manifest) and merge every
                # retired original back in; staging is a re-derivable copy,
                # the next compaction pass simply redoes this partition.
                # A missing manifest (pre-manifest leftovers) drops nothing
                # and merges everything back — lossless, possibly
                # duplicating already-moved compacted rows, the safe side.
                compacted: set[str] = set()
                try:
                    with open(staging + ".files.json") as mf:
                        compacted = set(json.load(mf))
                except FileNotFoundError:
                    pass
                for f in _partition_files(live):
                    if os.path.basename(f) in compacted:
                        os.remove(f)
                for f in filenames:
                    if f.endswith(".parquet"):
                        dst = os.path.join(live, f)
                        if not os.path.exists(dst):
                            os.rename(os.path.join(dirpath, f), dst)
            else:
                # live dir exists and staging is drained → the swap (or its
                # fallback merge) COMPLETED and the crash hit after it. The
                # snapshot marker lists the basenames the compacted output
                # already represents: restoring those would DUPLICATE every
                # row, so only non-snapshot files (appends that raced in
                # after the snapshot) are rescued. A marker is always
                # written before the swap; a missing marker (pre-marker
                # leftovers only) falls back to merging everything — the
                # lossless side, since the recovery sweep deletes whatever
                # stays behind.
                snapshot: set[str] = set()
                try:
                    with open(dirpath + ".snapshot.json") as mf:
                        snapshot = set(json.load(mf))
                except FileNotFoundError:
                    pass
                for f in filenames:
                    if f.endswith(".parquet") and f not in snapshot:
                        dst = os.path.join(live, f)
                        if not os.path.exists(dst):
                            os.rename(os.path.join(dirpath, f), dst)
            restored += 1
        shutil.rmtree(retired_root, ignore_errors=True)
    shutil.rmtree(staging_root, ignore_errors=True)
    return restored


def compact_partitions(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
    quiesce_seconds: float = 300.0,
) -> dict:
    """Compact every leaf partition under `root` whose parquet-file count
    exceeds both `min_files_to_compact` and the count the target size
    implies, skipping partitions written to within `quiesce_seconds`.
    Returns stats: partitions seen/compacted/skipped-live, files
    before/after, crash-recovered partitions.
    """
    recovered = _recover(root)
    staging_root = os.path.join(root, WORK_DIR, "staging")
    retired_root = os.path.join(root, WORK_DIR, "retired")
    seen = compacted = skipped_live = aborted = 0
    files_before = files_after = 0
    cutoff = time.time() - quiesce_seconds
    for part_dir in _leaf_partitions(root):
        seen += 1
        files = _partition_files(part_dir)
        if any(os.path.getmtime(f) > cutoff for f in files):
            skipped_live += 1  # the collector is still writing this hour
            continue
        total = sum(os.path.getsize(f) for f in files)
        want = max(1, int(total * PARQUET_FOOTER_OVERHEAD // target_file_bytes) + 1)
        if len(files) < max(min_files_to_compact, want + 1):
            continue
        rel = os.path.relpath(part_dir, root)
        staging = os.path.normpath(os.path.join(staging_root, rel))
        retired = os.path.normpath(os.path.join(retired_root, rel))
        shutil.rmtree(staging, ignore_errors=True)
        # Read the SNAPSHOTTED files only — partition values live in the
        # directory name, not the rows, so the rewrite is value-identical,
        # and files appended after the snapshot are left alone by design.
        (
            spark.read.parquet(*files)
            .coalesce(want)
            .write.mode("overwrite")
            .option("compression", "gzip")
            .parquet(staging)
        )
        for f in ("_SUCCESS",):
            marker = os.path.join(staging, f)
            if os.path.exists(marker):
                os.remove(marker)
        # The Spark rewrite took real time; if the partition changed under
        # us, abort this one (next run picks it up once it quiesces).
        if _partition_files(part_dir) != files:
            shutil.rmtree(staging)
            aborted += 1
            continue
        # Staging manifest BEFORE the swap: the compacted output basenames.
        # If the fallback merge below crashes half-done, recovery uses this
        # to drop exactly the partially-moved compacted files from the live
        # dir and roll the partition back to the retired originals.
        files_tmp = staging + ".files.json.tmp"
        with open(files_tmp, "w") as mf:
            json.dump(
                sorted(os.path.basename(f) for f in _partition_files(staging)),
                mf,
            )
        os.replace(files_tmp, staging + ".files.json")
        os.makedirs(os.path.dirname(retired), exist_ok=True)
        shutil.rmtree(retired, ignore_errors=True)
        # Snapshot marker BEFORE the swap (atomic sibling file): it records
        # which basenames the compacted output REPLACES, so a crash after
        # the swap but before the retired dir is deleted cannot make
        # recovery merge the old snapshot back in (which would duplicate
        # every row). _recover restores only non-snapshot files (raced
        # appends) when the live dir exists.
        marker_tmp = retired + ".snapshot.json.tmp"
        with open(marker_tmp, "w") as mf:
            json.dump(sorted(os.path.basename(f) for f in files), mf)
        os.replace(marker_tmp, retired + ".snapshot.json")
        if rel == ".":
            # root itself is the leaf (unpartitioned dataset): it cannot
            # be renamed into its own _compaction subtree, so swap
            # file-by-file under the same staging-manifest + snapshot
            # markers — every crash window lands in a _recover branch
            # that is already lossless for partial file moves.
            os.makedirs(retired, exist_ok=True)
            for f in files:
                os.rename(f, os.path.join(retired, os.path.basename(f)))
            for f in _partition_files(staging):
                os.rename(f, os.path.join(part_dir, os.path.basename(f)))
            shutil.rmtree(staging, ignore_errors=True)
        else:
            os.rename(part_dir, retired)
            try:
                os.rename(staging, part_dir)
            except OSError:
                # a concurrent writer re-created the dir inside the rename
                # window: merge the compacted files in file-by-file instead
                os.makedirs(part_dir, exist_ok=True)
                for f in _partition_files(staging):
                    os.rename(f, os.path.join(part_dir, os.path.basename(f)))
                shutil.rmtree(staging, ignore_errors=True)
        # rescue any file that raced into the old dir between the re-check
        # and the first rename — it is in `retired` but not in the snapshot
        snapshot_names = {os.path.basename(f) for f in files}
        for f in _partition_files(retired):
            if os.path.basename(f) not in snapshot_names:
                os.rename(f, os.path.join(part_dir, os.path.basename(f)))
        shutil.rmtree(retired)
        os.remove(retired + ".snapshot.json")
        compacted += 1
        files_before += len(files)
        files_after += len(_partition_files(part_dir))
    shutil.rmtree(os.path.join(root, WORK_DIR), ignore_errors=True)
    return {
        "partitions_seen": seen,
        "partitions_compacted": compacted,
        "partitions_skipped_live": skipped_live,
        "partitions_aborted_changed": aborted,
        "partitions_recovered": recovered,
        "files_before": files_before,
        "files_after": files_after,
    }
