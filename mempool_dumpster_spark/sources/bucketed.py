"""Bucketed-table materialization — shuffle-free co-located joins at scale.

The reference joins everything on `hash` with in-memory Go maps
(cmd/merge/transactions.go:111-136, common/analyzer.go) — fine for a day
of data on one box, impossible at 100 TB. The Spark-native equivalent of
"keep both sides hash-addressable" is BUCKETING: write `transactions` and
`sourcelog` once, bucketed (and sorted) by `hash` with the same bucket
count, and every subsequent equi-join or aggregation on `hash` reads
co-located buckets with NO Exchange on either side — the join's shuffle
is paid once at write time and amortized over every downstream query
(merge re-runs, analyzer, inclusion enrichment, point lookups).

Why this matters at the target scale:
- A day of mempool data is ~2M txs but a 100 TB *backfill* is thousands
  of days × multiple tables; re-shuffling both sides of the hash join for
  every analytical pass is the dominant cost. Bucketing eliminates it.
- Bucket pruning: a point lookup `hash = 0x...` scans ONE bucket
  (`SelectedBucketsCount: 1 out of N` in the scan node), not the table.
- `sortBy` within buckets gives sort-merge joins their sort for free and
  keeps parquet row groups clustered for min/max skipping on `hash`.

Spark specifics encoded here (and guarded by tests/test_plans.py):
- both sides must have the SAME bucket count on the SAME key for the
  exchange-free plan (Spark does not ratio-match bucket counts);
- tables are saved via `saveAsTable` (bucket metadata lives in the
  catalog; a plain `.parquet(path)` write silently loses it);
- `spark.sql.sources.bucketing.enabled` is on by default; the plan guard
  pins `autoBroadcastJoinThreshold=-1` so the test exercises the
  sort-merge path a 100 TB fact-fact join would take.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "hash",
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    partition_cols: list[str] | None = None,
) -> None:
    """Materialize `df` as a bucketed catalog table.

    `path` makes the table EXTERNAL (data at `path`, metadata in the
    catalog) — the deployment shape for shared object-store data. Bucket
    count is a layout contract: pick it once per dataset family (both
    join sides must match) and size it so one bucket ≈ one task's worth
    of data at the target scale (e.g. 2048 buckets for a 100 TB fact).
    `partition_cols` layers directory partitioning ABOVE the buckets
    (e.g. split=train/val/test dirs, each bucketed by doc_id) — partition
    pruning and bucket co-location compose.
    """
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w = w.bucketBy(n_buckets, bucket_col)
    w = w.sortBy(*(sort_cols or [bucket_col]))
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH THE CATALOG — `spark.read.parquet` on
    the same files would discard the bucket spec and re-shuffle joins."""
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans a sort-merge join with ZERO Exchange
    nodes (and zero Sort nodes when both were written `sortBy` the key):
    each task reads bucket i of both tables. This is the scale path for
    fact-fact joins (txs ⋈ sourcelog, txs ⋈ inclusion log) where neither
    side is broadcastable."""
    keys = [on] if isinstance(on, str) else list(on)
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on=keys, how=how
    )


def write_backfill_bucketed(
    transactions: DataFrame,
    sourcelog: DataFrame,
    base_path: str,
    prefix: str = "mempool",
    n_buckets: int = 32,
) -> tuple[str, str]:
    """Materialize a merge run's two outputs as CO-BUCKETED tables on
    `hash` — the backfill layout for repeated analytics over many days.

    The reference re-reads its parquet and re-builds Go hash maps for every
    analyze/merge pass (common/analyzer.go, cmd/merge/transactions.go);
    here the equivalent hash-addressability is paid once per day at write
    time, after which the analyzer join (J4), inclusion re-checks, and
    per-hash point lookups all plan with zero Exchange and single-bucket
    pruning. Returns the (transactions, sourcelog) table names.
    """
    t_tbl, s_tbl = f"{prefix}_transactions", f"{prefix}_sourcelog"
    write_bucketed(
        transactions,
        t_tbl,
        "hash",
        n_buckets,
        sort_cols=["hash"],
        path=f"{base_path}/transactions",
    )
    write_bucketed(
        sourcelog,
        s_tbl,
        "hash",
        n_buckets,
        sort_cols=["hash"],
        path=f"{base_path}/sourcelog",
    )
    return t_tbl, s_tbl
