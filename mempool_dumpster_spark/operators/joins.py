"""Join operators (SURVEY.md §2.4). All reference joins are equi-joins on
`hash`, done there by hash-map lookup; here they are declarative joins so
Catalyst picks broadcast vs shuffled strategies (AQE re-plans at runtime).

Scale notes (100 TB):
- `attach_sources` aggregates the sourcelog BEFORE joining — the join's right
  side is one row per hash, not one per receipt, and the aggregation is
  partial/map-side combined. Shuffle volume = distinct hashes.
- `anti_join_blacklist` broadcasts the blacklist (a previous day's hash list,
  ~2M rows ≈ 130 MB — broadcastable; pass broadcast=False if it ever is not).
- `inclusion_enrich` broadcasts the blocks table (one day ≈ 7200 blocks ×
  ~1.5M included txs — the tx-hash→block mapping is ~100 MB/day; broadcast
  it per-day, or leave to a shuffled join across many days).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sources_by_first_seen(
    sourcelog: DataFrame,
    hash_col: str = "hash",
    source_col: str = "source",
    ts_col: str = "timestamp_ms",
    pre_partition: int | None = None,
) -> DataFrame:
    """Collapse a sourcelog to one row per hash with the source array ordered
    by first-seen timestamp (reference cmd/merge/transactions.go:111-136).

    Two-level aggregation, both hash aggregates with partial combine:
      (hash, source) → min ts   then   hash → sort_array(collect_list(...))
    The struct sort key is (min_ts, source) so ordering is total and
    deterministic even when two sources tie on the millisecond.

    ``pre_partition`` (r16): when set, the input is hash-partitioned on
    ``hash_col`` into that many partitions FIRST, which makes BOTH
    groupBys exchange-free — HashPartitioning(hash) satisfies the
    clustered distribution of (hash, source) and of (hash), so the plan
    carries exactly one Exchange of raw receipt rows instead of two
    Exchanges of aggregated rows (guide §2.4). The raw form shuffles
    fewer total bytes whenever receipts < distinct(hash, source) +
    distinct(hash) — i.e. whenever the per-(hash, source) duplicate
    factor is below ~2, which holds for the reference's sourcelog (most
    sources deliver a tx once). Leave None when duplicates dominate and
    the map-side combine of the two-exchange form is worth more.
    """
    if pre_partition:
        sourcelog = sourcelog.repartition(pre_partition, hash_col)
    per_source = sourcelog.groupBy(hash_col, source_col).agg(
        F.min(ts_col).alias("__first_ts")
    )
    return per_source.groupBy(hash_col).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("__first_ts", source_col))),
            lambda s: s[source_col],
        ).alias("sources")
    )


def attach_sources(
    txs: DataFrame,
    sourcelog: DataFrame,
    hash_col: str = "hash",
    source_col: str = "source",
    ts_col: str = "timestamp_ms",
) -> DataFrame:
    """txs ⋈ sourcelog: left-outer attach of the first-seen-ordered sources
    array; a tx never seen in the sourcelog keeps an empty array (reference
    cmd/merge/transactions.go:117-135).
    """
    src = sources_by_first_seen(sourcelog, hash_col, source_col, ts_col)
    joined = txs.join(src, on=hash_col, how="left")
    return joined.withColumn(
        "sources",
        F.coalesce(F.col("sources"), F.array().cast("array<string>")),
    )


def anti_join_blacklist(
    df: DataFrame,
    blacklist: DataFrame,
    hash_col: str = "hash",
    blacklist_col: str | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """Drop rows whose hash appears in the blacklist (reference
    common/txsfile.go:115-119). left_anti ≡ set difference on keys.

    `blacklist_col` names the key column on the blacklist side (defaults to
    its first column); it is lowercased and aliased to `hash_col`.
    """
    key = blacklist_col or blacklist.columns[0]
    bl = blacklist.select(F.lower(F.col(key)).alias(hash_col)).distinct()
    if broadcast:
        bl = F.broadcast(bl)
    return df.join(bl, on=hash_col, how="left_anti")


def inclusion_enrich(
    txs: DataFrame,
    blocks: DataFrame,
    ts_col: str = "timestamp",
    broadcast: bool = True,
) -> DataFrame:
    """Attach on-chain inclusion status and compute the inclusion delay.

    Spark restatement of reference cmd/merge/inclusioncheck.go:88-191: instead
    of per-tx RPC fan-out with a shared BlockCache, materialize the day's
    (tx hash → block number, block timestamp) mapping once as a DataFrame and
    left-join it. The BlockCache IS the blocks DataFrame. Not-included txs get
    0 / 0 / 0 (the reference's sentinel, common/txsummary.go:64-66).

    `inclusionDelayMs = includedBlockTimestamp - timestamp` can be negative
    (tx received after its block's timestamp — README.md:84-88).
    """
    b = blocks.select(
        F.lower(F.col("hash")).alias("hash"),
        F.col("block_number").alias("includedAtBlockHeight"),
        F.col("block_timestamp_ms").alias("includedBlockTimestamp"),
    )
    if broadcast:
        b = F.broadcast(b)
    out = txs.join(b, on="hash", how="left")
    return (
        out.withColumn(
            "includedAtBlockHeight", F.coalesce("includedAtBlockHeight", F.lit(0))
        )
        .withColumn(
            "includedBlockTimestamp", F.coalesce("includedBlockTimestamp", F.lit(0))
        )
        .withColumn(
            "inclusionDelayMs",
            F.when(
                F.col("includedAtBlockHeight") > 0,
                F.col("includedBlockTimestamp") - F.col(ts_col),
            ).otherwise(F.lit(0)),
        )
    )


def was_included_before_received(
    threshold_ms: int = -12_000,
):
    """Predicate P12 (reference common/txsummary.go:84-87): tx was included
    on-chain ≥12 s before we first received it."""
    return (F.col("includedAtBlockHeight") > 0) & (
        F.col("inclusionDelayMs") <= F.lit(threshold_ms)
    )
