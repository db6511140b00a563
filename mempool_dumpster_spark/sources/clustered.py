"""Range-clustered writes — sort-on-write so time/key-range scans skip data.

Bucketing (sources/bucketed.py) optimizes equi-joins and point lookups;
this is the complementary layout for RANGE predicates — `timestamp
BETWEEN …`, `block_height >= …` — the shape of most archive queries
(the reference's daily files give it this for free at day granularity,
cmd/merge/transactions.go; inside a day it has nothing).

`write_range_clustered` = `repartitionByRange` on the cluster columns +
`sortWithinPartitions` + parquet write. Effects at scan time:

- files hold DISJOINT value ranges (range partitioning), so parquet
  footer min/max prunes whole FILES for a selective range predicate;
- rows are sorted inside each file, so row-group and page min/max stats
  are tight and prune within the surviving files;
- the sampled range boundaries equal-weight the DATA, so skew in the
  cluster key spreads across files instead of hot-spotting one.

Cost: one range shuffle per write — the same price the collector's O1
global sort already pays, made durable. With `partition_by` (e.g.
["date"]), the partition columns LEAD the range keys, so each output
task holds (almost always) a single partition value and writes ~one
file into its directory — n_files total across the write, disjoint
cluster ranges within each directory. It is still ONE shuffle over the
whole input; to bound shuffle size at 100 TB, call this per ingest
batch (per day), not over the full archive at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 32,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "gzip",
) -> None:
    """Write `df` to parquet range-clustered by `cluster_cols`.

    `n_files` is the target file count per write (per partition-value set
    when `partition_by` is given); size it as total_bytes / 128 MB.
    """
    range_keys = [*(partition_by or []), *cluster_cols]
    out = df.repartitionByRange(n_files, *range_keys).sortWithinPartitions(
        *range_keys
    )
    w = out.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
