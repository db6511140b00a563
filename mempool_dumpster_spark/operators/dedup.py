"""Dedup operators — the reference's signature aggregation (SURVEY.md §2.5).

The reference dedups with in-memory hash maps (reference common/txsfile.go:121-129,
common/sourcelog.go:52-62, common/trashfile.go:90-99). Spark-first restatement:
a single hash aggregate (partial map-side combine → shuffle on key → final),
which is exactly the shape that scales — no driver-side state, skew handled by
AQE.

Scale notes (100 TB): `dedup_keep_earliest` is one shuffle on the key column.
Prefer it over the window-function variant (`dedup_keep_earliest_row`) when
all non-key columns are functionally dependent on the key (true for tx
metadata derived from the RLP): the agg variant does map-side partial
aggregation, so the shuffle moves ~unique-keys rows, not all rows. The window
variant shuffles every row, then sorts within partitions — use it only when
you need the exact *row* (arbitrary non-dependent columns) of the earliest
record.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_earliest(
    df: DataFrame,
    key: str | Sequence[str] = "hash",
    ts_col: str = "timestamp_ms",
) -> DataFrame:
    """Per key keep the minimum timestamp and the metadata of one row.

    Net semantics of reference common/txsfile.go:121-129: first writer wins
    for metadata, but a later duplicate with a smaller timestamp updates the
    timestamp — i.e. ``min(ts)`` + any row's metadata (metadata is identical
    per hash since it is derived from the RLP payload).

    Implemented as min_by for the payload so results are deterministic:
    payload columns come from the row with the smallest timestamp.
    """
    keys = [key] if isinstance(key, str) else list(key)
    payload = [c for c in df.columns if c not in keys and c != ts_col]
    aggs = [F.min(ts_col).alias(ts_col)]
    aggs += [F.min_by(c, F.col(ts_col)).alias(c) for c in payload]
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(df.columns)  # restore original column order


def dedup_keep_earliest_row(
    df: DataFrame,
    key: str | Sequence[str],
    order: Sequence[str],
) -> DataFrame:
    """Keep the first whole row per key ordered by ``order`` columns.

    Window-function variant (row_number()==1) — the idiomatic Spark form of
    reference common/trashfile.go:90-99 (trash dedup keeps the earliest whole
    entry). ``order`` should include a tiebreaker column to be deterministic.

    Measured and kept (r16): a ``min_by(struct(payload), struct(order))``
    hash-aggregate rewrite was tried against this form — min_by's
    variable-width struct buffer forces a non-codegen SortAggregate on
    both sides of the exchange, and the bench medians REGRESSED
    (dedup_earliest 0.32 s → 0.43 s, first_source_counts 0.34 s → 0.39 s
    at sf0.1/local[32]). The window form is already shuffle-minimal on
    Spark 3.5+: WindowGroupLimit prunes to ≤1 row per (key, map
    partition) BEFORE the exchange, which is the same map-side reduction
    a partial aggregate would buy, with codegen'd sorts. Equivalence of
    the two forms is pinned by tests/test_operators.py::
    test_dedup_keep_earliest_row_matches_window.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_min_timestamp(
    df: DataFrame,
    keys: Sequence[str] = ("hash", "source"),
    ts_col: str = "timestamp_ms",
) -> DataFrame:
    """Sourcelog dedup: per (hash, source) keep min timestamp.

    Reference common/sourcelog.go:52-62. Pure hash aggregate — partial
    aggregation makes the shuffle proportional to distinct (hash, source)
    pairs, not receipts.

    Output carries keys + ts_col in the INPUT's column order; any other
    input column is dropped (it has no well-defined value after a min
    aggregate). The old `select(*df.columns)` instead raised
    UNRESOLVED_COLUMN the moment the input carried extra columns — e.g.
    a sourcelog read back from the collector's date=/hour= partitioned
    archive, where the partition dirs come back as columns.
    """
    wanted = set(keys) | {ts_col}
    out_cols = [c for c in df.columns if c in wanted]
    return df.groupBy(*keys).agg(F.min(ts_col).alias(ts_col)).select(*out_cols)
