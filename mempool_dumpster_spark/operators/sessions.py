"""Gap-based sessionization — the standard event-stream grouping primitive.

The reference's hourly collector buckets (collector/output.go: date=/hour=
file partitioning) are fixed tumbling windows; sessionization is its
data-dependent sibling: a new session starts whenever a key is silent for
longer than `gap`. Spark-first form — two window functions over one shuffle:

    lag(ts) over (partition by key order by ts, tiebreak)   -- previous event
    new_session = ts - lag(ts) > gap or lag is null         -- boundary flag
    session_seq = sum(new_session) over same window (running)

No UDF, no state store, no iteration: the running sum turns boundary flags
into dense per-key session numbers in the same sort the lag already needed.
At 100 TB this is one shuffle on the key and one in-partition sort — the
same cost envelope as any windowed dedup. (The streaming equivalent is
`session_window()` in Structured Streaming; this is the batch/backfill
form.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mempool_dumpster_spark.functions.scalars import epoch_us


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign `session_seq` (1-based, dense per key) to every row: a new
    session starts when the key's previous event is more than `gap_seconds`
    older (or there is none). `tiebreak` orders equal timestamps
    deterministically."""
    order = [F.col(ts_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # integer-microsecond arithmetic: exact, and bit-identical to any other
    # engine's epoch-µs math (a float-seconds cast would round differently).
    # epoch_us (not raw unix_micros) so TIMESTAMP_NTZ parquet — the common
    # pandas/pyarrow encoding — works; the difference math is tz-invariant.
    prev = F.lag(epoch_us(ts_col)).over(w)
    boundary = (
        prev.isNull() | (epoch_us(ts_col) - prev > gap_seconds * 1_000_000)
    ).cast("long")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_seq", F.sum(boundary).over(running))


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Sessionize then collapse to one row per (key, session): event count,
    start/end timestamps, duration in seconds. Same single shuffle — the
    groupBy reuses the sessionize partitioning key prefix."""
    s = sessionize(df, key_cols, ts_col, gap_seconds, tiebreak)
    return s.groupBy(*key_cols, "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            (epoch_us(F.max(ts_col)) - epoch_us(F.min(ts_col)))
            / F.lit(1_000_000.0)
        ).alias("duration_s"),
    )


def session_stats_window(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """The `session_window()` form of `session_stats` — the one that also
    runs as a Structured Streaming aggregation (the reference's collector is
    a long-lived stream; this is how its session analytics would run live).
    Works identically on a batch frame.

    Boundary parity with `sessionize`: the lag form starts a new session
    when `ts - prev > gap_seconds` — an event landing EXACTLY at the gap
    still merges. `session_window` sessions span [ts, ts + gap] and merge
    when they touch, i.e. ALSO inclusively (`ts - prev <= gapDuration`;
    verified empirically — an event at gap + 1 µs splits, one at exactly
    gap merges), so the same `gap_seconds` value yields identical sessions
    and `test_session_window_parity` asserts batch ≡ window ≡ streaming on
    a fixture that includes both boundary cases.

    Streaming use: append/update mode needs a watermark on `ts_col`
    upstream; complete mode (used by the parity test's memory sink) needs
    none. State per open session is O(keys), merged by Spark's session-state
    store — no per-event state growth.
    """
    sw = F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
    return (
        df.groupBy(sw, *key_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            (
                (epoch_us(F.max(ts_col)) - epoch_us(F.min(ts_col)))
                / F.lit(1_000_000.0)
            ).alias("duration_s"),
        )
        .select(
            *key_cols, "n_events", "session_start", "session_end", "duration_s"
        )
    )
