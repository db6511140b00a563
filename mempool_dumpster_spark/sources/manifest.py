"""Manifest-committed parquet publishing — atomic dataset versions.

`df.write.mode("overwrite")` is NOT atomic: it deletes the target then
writes files one task at a time, so a concurrent reader sees an empty or
half-written directory, and a mid-write crash loses the PREVIOUS version
too. Table formats (Iceberg/Delta) fix this with a metadata pointer
swapped atomically over immutable data files; this module is that
mechanism at its minimum viable size, for the outputs this engine
publishes repeatedly (daily merge results, rollups, prep corpora):

    path/
      _manifest.json        <- the only mutable thing: one atomic rename
      _versions/v000001/    <- immutable, complete parquet datasets
      _versions/v000002/

- `commit_write` stages the full dataset into a NEW version directory,
  then swaps `_manifest.json` via os.replace (atomic on POSIX). A crash
  before the swap leaves an orphan version dir and the previous version
  intact and live; the next commit numbers PAST the orphan (never reuses
  a dir), and vacuum sweeps orphans once enough versions pass them.
- `read_committed` reads whatever version the manifest points at —
  never a partial write. Readers holding the old version's file list
  keep working through a concurrent commit (files are immutable until
  vacuum).
- `vacuum` removes version dirs older than the newest `keep`, never the
  live one.

Underscore-prefixed names keep the machinery invisible to plain
`spark.read.parquet(path)` partition discovery (which would otherwise
union every version). On object stores the os.replace becomes a
conditional PUT; everything else is unchanged — the same note as
streaming/compact.py and streaming/rollup.py, now implemented rather
than deferred.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_manifest.json"
VERSIONS_DIR = "_versions"


def _manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST)


def current_version(path: str) -> dict | None:
    """The live manifest, or None when nothing has been committed."""
    try:
        with open(_manifest_path(path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def commit_write(
    df: DataFrame,
    path: str,
    compression: str = "gzip",
    partition_by: list[str] | None = None,
) -> dict:
    """Write `df` as the next version of the dataset at `path` and
    atomically publish it. Returns the new manifest dict."""
    prev = current_version(path)
    vroot = os.path.join(path, VERSIONS_DIR)
    os.makedirs(vroot, exist_ok=True)
    # Version = 1 + max(published, any dir on disk): a commit that crashed
    # mid-write leaves an orphan dir ABOVE the published version, and
    # reusing its number would hit the errorifexists write forever.
    # Numbering past orphans keeps commits available under the module's
    # single-writer contract; `vacuum` sweeps dead dirs later.
    on_disk = [
        int(d[1:])
        for d in os.listdir(vroot)
        if d.startswith("v") and d[1:].isdigit()
    ]
    version = max([prev["version"] if prev else 0, *on_disk], default=0) + 1
    vdir = os.path.join(vroot, f"v{version:06d}")

    w = df.write.mode("errorifexists").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(vdir)

    manifest = {
        "version": version,
        "data_dir": os.path.join(VERSIONS_DIR, f"v{version:06d}"),
        "partition_by": partition_by or [],
        # every version ever PUBLISHED — the membership test that lets
        # readers (diff_versions) distinguish committed data from orphan
        # dirs a crashed commit left behind
        "published": (prev.get("published", [prev["version"]]) if prev else [])
        + [version],
    }
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(path))  # the atomic publish
    return manifest


def read_committed(spark: SparkSession, path: str) -> DataFrame:
    """Read the currently-committed version — never a partial write."""
    m = current_version(path)
    if m is None:
        raise FileNotFoundError(f"no committed version at {path}")
    return spark.read.parquet(os.path.join(path, m["data_dir"]))


def vacuum(path: str, keep: int = 2) -> list[str]:
    """Delete version directories older than the newest `keep` PUBLISHED
    versions (the live version is always retained). Orphan dirs from
    crashed commits are swept separately: below the live version they can
    never become committed (version numbers only move forward) so they go
    unconditionally; above it they may be an in-flight commit and are left
    alone. Counting orphans toward the keep window would let a crashed
    commit silently shorten the documented reader-retention horizon.
    Returns the removed dir names. Run this with a `keep` horizon longer
    than your longest reader — a reader that resolved the manifest before
    a commit keeps reading its (immutable) version until vacuum passes
    it."""
    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    vroot = os.path.join(path, VERSIONS_DIR)
    if not os.path.isdir(vroot):
        return []
    live = current_version(path)
    if live is None:
        # no manifest => nothing is published; every dir might be the
        # first in-flight commit — delete nothing
        return []
    live_name = os.path.basename(live["data_dir"])
    on_disk = sorted(
        d
        for d in os.listdir(vroot)
        if d.startswith("v") and d[1:].isdigit()
    )
    if "published" in live:
        published = {f"v{v:06d}" for v in live["published"]}
    else:
        # legacy manifest (pre-'published' field): can't tell committed
        # dirs from orphans, so treat every dir at-or-below the live
        # version as published — the keep window then protects them,
        # matching the documented retention horizon (the alternative
        # classifies them all as orphans and deletes past readers' files)
        published = {
            d for d in on_disk if int(d[1:]) <= live["version"]
        }
    pub_dirs = [d for d in on_disk if d in published]
    doomed = [d for d in pub_dirs[:-keep] if d != live_name]
    doomed += [
        d
        for d in on_disk
        if d not in published and int(d[1:]) < live["version"]
    ]
    for d in doomed:
        shutil.rmtree(os.path.join(vroot, d), ignore_errors=True)
    # prune vacuumed versions from the manifest's published history —
    # otherwise it grows one entry per commit forever (an --append
    # workload commits twice per batch) and every future commit rewrites
    # the ever-longer list. Data deletion first, manifest second: a crash
    # between the two leaves stale entries whose dirs are gone (harmless
    # — diff_versions reports them as vacuumed), never a published dir
    # unlisted. Same atomic tmp+replace as commit_write, same
    # single-writer contract.
    doomed_published = {int(d[1:]) for d in doomed} & {
        int(d[1:]) for d in pub_dirs
    }
    if doomed_published and "published" in live:
        live["published"] = [
            v for v in live["published"] if v not in doomed_published
        ]
        tmp = _manifest_path(path) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(live, f)
        os.replace(tmp, _manifest_path(path))
    return sorted(doomed)


def upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    compression: str = "gzip",
) -> dict:
    """MERGE INTO for the manifest-committed dataset: rows in `updates`
    replace committed rows sharing their key; new keys append. Publishes
    one new atomic version (read-modify-commit; single-writer, like every
    commit here). The merge plan is one left-anti join on the keys —
    current rows whose key is NOT updated survive, the whole updates
    frame lands as-is — so cost is one shuffle of the current version
    against the (usually much smaller) update keys; at scale AQE
    broadcasts the update side."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    missing = set(key_cols) - set(updates.columns)
    if missing:
        # validated BEFORE the initial-commit branch too: a first upsert
        # without its declared keys would otherwise commit a dataset that
        # every later (correctly-keyed) upsert fails against
        raise ValueError(f"updates missing key columns {sorted(missing)}")
    try:
        current = read_committed(spark, path)
    except FileNotFoundError:
        return commit_write(updates, path, compression=compression)
    if set(current.columns) != set(updates.columns):
        raise ValueError(
            f"updates schema mismatch: {sorted(current.columns)} vs "
            f"{sorted(updates.columns)}"
        )
    survivors = current.join(
        updates.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    merged = survivors.unionByName(updates)
    # preserve the dataset's partition layout: the base version may have
    # been committed partition_by=['split'] etc., and silently dropping it
    # here would turn every later partition-pruned read into a full scan
    layout = current_version(path).get("partition_by") or None
    return commit_write(
        merged, path, compression=compression, partition_by=layout
    )


def diff_versions(
    spark: SparkSession, path: str, v_old: int, v_new: int
) -> DataFrame:
    """Change-data-capture between two committed versions: full rows added
    by / removed since `v_old`, labeled in a `__change` column ('added' /
    'removed'). Multiset semantics (exceptAll both ways), so duplicate-row
    count changes surface too. Both versions must have been PUBLISHED
    (per the manifest's version history — a crashed commit's orphan dir
    is never readable data) and still be on disk (vacuum horizon)."""
    live = current_version(path)
    if live is None:
        raise FileNotFoundError(f"no committed version at {path}")
    published = set(live.get("published", [live["version"]]))

    def load(v: int) -> DataFrame:
        if v not in published:
            raise ValueError(
                f"version {v} is not in the published history (orphan of "
                f"a crashed commit, or vacuumed — vacuum prunes removed "
                f"versions from the manifest); published: "
                f"{sorted(published)}"
            )
        d = os.path.join(path, VERSIONS_DIR, f"v{v:06d}")
        if not os.path.isdir(d):
            raise FileNotFoundError(f"version {v} not on disk (vacuumed?)")
        return spark.read.parquet(d)

    old, new = load(v_old), load(v_new)
    from pyspark.sql import functions as F

    added = new.exceptAll(old).withColumn("__change", F.lit("added"))
    removed = old.exceptAll(new).withColumn("__change", F.lit("removed"))
    return added.unionByName(removed)
