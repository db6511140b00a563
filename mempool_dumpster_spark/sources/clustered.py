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


def with_bloom_filters(writer, bloom_cols: dict[str, int]):
    """Enable parquet bloom filters on the given columns ({col: expected
    distinct values}). Min/max footer stats are useless for POINT lookups
    on high-cardinality keys that aren't the sort key (every file's
    [min, max] spans the whole key space); a bloom filter answers
    "definitely not in this file" in one footer probe, so a hash lookup
    touches ~1 file instead of all of them. Costs ~1.2 bytes/ndv of
    footer per column chunk; readers that ignore blooms see a normal
    parquet file."""
    for col, ndv in bloom_cols.items():
        writer = writer.option(
            f"parquet.bloom.filter.enabled#{col}", "true"
        ).option(f"parquet.bloom.filter.expected.ndv#{col}", str(ndv))
    return writer


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 32,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "gzip",
    bloom_cols: dict[str, int] | None = None,
) -> None:
    """Write `df` to parquet range-clustered by `cluster_cols`.

    `n_files` is the target file count for the WHOLE write (with
    `partition_by`, the range tasks lead on the partition columns so each
    output task lands in ~one partition directory — n_files total across
    all directories, not per directory); size it as total_bytes / 128 MB.
    `bloom_cols` ({col: expected_ndv}) adds bloom filters for point-lookup
    columns ORTHOGONAL to the sort key — the range clustering prunes range
    scans via min/max, the blooms prune point probes on everything else.
    """
    range_keys = [*(partition_by or []), *cluster_cols]
    out = df.repartitionByRange(n_files, *range_keys).sortWithinPartitions(
        *range_keys
    )
    w = out.write.mode(mode).option("compression", compression)
    if bloom_cols:
        w = with_bloom_filters(w, bloom_cols)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits_per_col: int = 8,
    key_col: str = "__zkey",
) -> DataFrame:
    """Add a Z-order (Morton) key interleaving `cols` — the multi-column
    clustering key range-clustering can't give: sorting by (a, b) prunes
    scans filtered on `a` but scatters `b`; sorting by the interleaved
    bits keeps files tight on BOTH dimensions (each file covers a small
    hyper-rectangle), so min/max footer stats prune for predicates on
    either column. This is the layout OPTIMIZE ZORDER computes in
    lakehouse table formats, built from plain column algebra.

    Each column is first normalized to a `bits_per_col`-bit bucket id by
    equal-WIDTH binning between its global min/max (computed in one tiny
    agg — two doubles per column to the driver). Equal-width keeps the
    op fully distributed; heavy skew in a cluster key degrades toward
    that key dominating the interleave — pre-transform (log, rank) such
    columns at the call site. The interleave itself is a closed-form
    sum of shift/mask terms, JVM-side codegen, zero shuffle."""
    if not (1 <= bits_per_col <= 16):
        raise ValueError(f"bits_per_col must be in [1,16], got {bits_per_col}")
    if len(cols) * bits_per_col > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits_per_col} bits exceeds a signed 64-bit key"
        )
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    n_buckets = (1 << bits_per_col) - 1
    out = df
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1.0
        out = out.withColumn(
            f"__zb_{c}",
            F.least(
                F.lit(n_buckets),
                F.floor(
                    (F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * n_buckets
                ).cast("long"),
            ),
        )
    terms = []
    for ci, c in enumerate(cols):
        for b in range(bits_per_col):
            # bit b of column ci lands at interleaved position
            # b * n_cols + ci
            terms.append(
                F.shiftleft(
                    F.shiftright(F.col(f"__zb_{c}"), b).bitwiseAND(F.lit(1)),
                    b * len(cols) + ci,
                )
            )
    zkey = terms[0]
    for t in terms[1:]:
        zkey = zkey + t
    return out.withColumn(key_col, zkey.cast("long")).drop(
        *[f"__zb_{c}" for c in cols]
    )


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 32,
    bits_per_col: int = 8,
    mode: str = "overwrite",
    compression: str = "gzip",
) -> None:
    """Write `df` to parquet Z-order-clustered on `cluster_cols`: files
    cover small hyper-rectangles of the key space, so footer min/max
    prunes for range predicates on ANY of the cluster columns. One range
    shuffle on the interleaved key, same price as a range-clustered
    write; the key column itself is dropped before writing."""
    keyed = zorder_key(df, cluster_cols, bits_per_col=bits_per_col)
    out = (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
    out.write.mode(mode).option("compression", compression).parquet(path)
