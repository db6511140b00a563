"""Skew-aware aggregation operators.

Spark's partial (map-side) aggregation already neutralizes skew for
algebraic aggregates (sum/count/min/max), and AQE's skew-join splitting
handles joins — but ORDER-sensitive per-key operators (top-k, collect-list)
funnel every row of a hot key through one reducer. `salted_topk` is the
100 TB-safe form: a deterministic salt spreads each key over `n_salt`
partial rankers, then a final ranker merges the ≤ k×n_salt survivors —
the same two-phase shape as partial aggregation, applied to ranking.

The salt is derived from the DATA (crc32 of the ordering column), not from
rand()/partition id, so plans stay deterministic and retryable — a Spark
task retry re-salts identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_topk(
    df: DataFrame,
    key_cols: list[str],
    order_col: str | Column,
    k: int,
    n_salt: int = 32,
    tiebreak: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Top-k rows per key, hot-key-safe. Returns the input columns + `rank`.

    Phase 1 ranks within (key, salt) — a hot key's rows spread over n_salt
    reducers, each keeping ≤ k. Phase 2 ranks the ≤ k×n_salt survivors per
    key. Output is identical to a single global window (ties broken by
    `tiebreak`), verified by the registered oracle query.
    """
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    ordering = [order.desc() if descending else order.asc()]
    if tiebreak:
        ordering.append(F.col(tiebreak).asc())
    if tiebreak:
        salt_src = F.crc32(F.col(tiebreak).cast("string"))
    else:
        # No tiebreak: salting on the order value alone would collapse a hot
        # key whose rows share one order value (e.g. a constant) into a
        # single salt bucket, silently disabling the skew protection. Spread
        # by hashing ALL input columns instead — deterministic per row
        # content, so retries/speculative tasks still agree.
        salt_src = F.crc32(
            F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns])
        )
    salted = df.withColumn("__salt", F.pmod(salt_src, F.lit(n_salt)))
    w1 = Window.partitionBy(*key_cols, "__salt").orderBy(*ordering)
    survivors = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*ordering)
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def two_pass_topk(
    df: DataFrame,
    key_col: str,
    k: int,
    capacity: int = 4096,
    count_col: str = "n",
    broadcast_limit: int = 5_000_000,
) -> DataFrame:
    """Top-k most frequent values of `key_col` WITHOUT shuffling the full
    key cardinality — the heavy-hitters pattern for 10^9+-cardinality keys
    (URLs, wallets, n-grams) where a plain groupBy().count() shuffle
    carries every distinct key.

    Pass 1 (candidate generation, bounded memory): each partition streams
    its rows through a lossy counter (SpaceSaving-style: count per Arrow
    batch, fold into a dict, truncate to the `capacity` locally-largest
    whenever it doubles) and emits its local top-`capacity` candidates —
    shuffle volume is ≤ partitions × capacity rows regardless of key
    cardinality. Pass 2 (exact recount): the candidate union broadcasts
    back as a semi-join filter and ONLY candidate rows are counted
    exactly, then globally top-k'd with a value tiebreak.

    Counts in the output are EXACT (pass 2 recounts from the raw data).
    The top-k SET is exact whenever every true top-k item lands in some
    partition's local top-capacity — guaranteed when per-partition
    distinct keys ≤ capacity (then candidates = all keys), and holds in
    practice for genuinely heavy hitters (an item missed by every
    partition's top-4096 is not a heavy hitter); adversarially flat
    distributions can demote a borderline k-th item. Use
    `salted_topk`/groupBy when cardinality is small enough to shuffle.

    NULL keys count as a group, matching the plain groupBy top-k this
    approximates: pass 1 counts them from Arrow null_count and pass 2
    recounts via a null-safe semi-join.

    The candidate union is ≤ partitions × capacity rows — broadcastable
    at thousands of partitions, but at 10k+ partitions with the default
    capacity it can reach tens of millions. It is materialized
    (localCheckpoint, bounded by the same formula) and counted first;
    above `broadcast_limit` rows the semi-join runs as a plain shuffled
    join instead of a broadcast, so the driver/executor broadcast memory
    is never the scaling ceiling.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if capacity < k:
        raise ValueError(f"capacity {capacity} must be >= k {k}")
    field = df.schema[key_col]
    from pyspark.sql.types import StructType

    out_schema = StructType([field])

    def local_heavy(batches):
        # Arrow batches, NOT pandas: a nullable bigint column converts to
        # float64 under Arrow→pandas, silently rounding keys above 2^53
        # (64-bit hashes). Arrow value_counts keeps the exact type; nulls
        # are counted via null_count and re-emitted as a None candidate.
        import pyarrow as pa
        import pyarrow.compute as pc

        nan_key = object()  # NaN != NaN, so fold all NaNs onto a sentinel
        counts: dict = {}
        key_type = None
        for batch in batches:
            col = batch.column(0)
            key_type = col.type
            if col.null_count:
                counts[None] = counts.get(None, 0) + col.null_count
            for item in pc.value_counts(col.drop_null()).to_pylist():
                v, c = item["values"], item["counts"]
                if isinstance(v, float) and v != v:
                    v = nan_key
                counts[v] = counts.get(v, 0) + c
            if len(counts) > 2 * capacity:
                top = sorted(
                    counts.items(), key=lambda kv: -kv[1]
                )[:capacity]
                counts = dict(top)
        if key_type is None:
            return  # empty partition
        top = sorted(counts.items(), key=lambda kv: -kv[1])[:capacity]
        vals = [float("nan") if t[0] is nan_key else t[0] for t in top]
        yield pa.RecordBatch.from_arrays(
            [pa.array(vals, type=key_type)], names=[key_col]
        )

    candidates = (
        df.select(key_col)
        .mapInArrow(local_heavy, schema=out_schema)
        .distinct()
        .localCheckpoint(eager=True)
    )
    if candidates.count() <= broadcast_limit:
        cand = F.broadcast(candidates)
    else:
        cand = candidates
    cand = cand.withColumnRenamed(key_col, "__cand_key")
    return (
        df.join(
            cand, F.col(key_col).eqNullSafe(F.col("__cand_key")), "left_semi"
        )
        .groupBy(key_col)
        .agg(F.count("*").alias(count_col))
        .orderBy(F.col(count_col).desc(), F.col(key_col).asc())
        .limit(k)
    )
