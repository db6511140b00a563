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
