"""Streaming inclusion enrichment: a watermarked STREAM-STREAM join between
the pending-tx stream and a block-receipt stream.

The reference answers "did this tx land on chain, and when?" with a
per-hash RPC lookup at merge time (cmd/merge/inclusioncheck.go:88-191) —
a batch-era design: the question is asked hours after the fact against a
node. On a cluster the same question is answerable AS THE BLOCKS ARRIVE:
the collector already has the pending stream, and block receipts are just
another stream (a head-subscription feed with (block_ts, block_number,
hash) rows). Joining the two inside the streaming engine gives
time-to-inclusion at source latency, with no RPC fan-out and no driver
lookup table.

Spark's stream-stream join needs two things to bound state (both sides
buffer rows until the other side can no longer match them):

- a WATERMARK on both inputs, and
- a TIME-RANGE predicate tying the two event-time columns together.

Here the range is `received_at - before_slack <= block_ts <= received_at +
max_delay`: a pending tx stays joinable until `max_delay` after receipt
(then it's "not included in window" — the reference's merge marks such txs
not-landed the same way), and `before_slack` admits the
WasIncludedBeforeReceived case (P12, common/analyzer.go:149-156) where a
tx is seen on a feed AFTER the block containing it. State per side is
bounded by watermark + range: ~(max_delay + watermark) of stream volume,
independent of total stream length.

LEFT OUTER emits the not-included rows too — but only once the watermark
passes `received_at + max_delay` (Spark holds the row until no future
block could match). Inner mode emits matches immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_inclusion_join(
    txs: DataFrame,
    receipts: DataFrame,
    max_delay: str = "10 minutes",
    before_slack: str = "30 seconds",
    watermark_delay: str = "5 minutes",
    how: str = "leftOuter",
) -> DataFrame:
    """Join the pending-tx stream (received_at, hash, …) to a block-receipt
    stream (block_ts, block_number, hash) on hash within the event-time
    window [received_at - before_slack, received_at + max_delay].

    Output: every tx column plus `block_number`, `block_ts`, `included`
    (1/0), and `inclusion_delay_ms` (negative when included before
    received, P12; NULL when not included). `how` is 'leftOuter' (emit
    not-included rows once the watermark closes their window) or 'inner'
    (matches only, lowest latency).

    Both inputs may be streaming or batch (the batch form runs the same
    plan as an ordinary interval join — used by tests for parity)."""
    if how not in ("leftOuter", "inner"):
        raise ValueError(f"how must be 'leftOuter' or 'inner', got {how!r}")
    clash = (set(txs.columns) & {"block_number", "block_ts", "rc_hash"}) or (
        {"hash"} - set(txs.columns)
    )
    if clash:
        raise ValueError(f"tx stream column problem: {sorted(clash)}")

    left = txs
    right = receipts.select(
        F.col("hash").alias("rc_hash"),
        F.col("block_number"),
        F.col("block_ts"),
    )
    if txs.isStreaming:
        left = left.withWatermark("received_at", watermark_delay)
    if receipts.isStreaming:
        right = right.withWatermark("block_ts", watermark_delay)

    cond = (
        (F.col("hash") == F.col("rc_hash"))
        & (
            F.col("block_ts")
            >= F.col("received_at") - F.expr(f"INTERVAL {before_slack}")
        )
        & (
            F.col("block_ts")
            <= F.col("received_at") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    joined = left.join(right, cond, how)
    delay = (
        F.col("block_ts").cast("double") - F.col("received_at").cast("double")
    ) * 1000.0
    return joined.select(
        *[F.col(c) for c in txs.columns],
        "block_number",
        "block_ts",
        F.col("block_number").isNotNull().cast("long").alias("included"),
        F.when(
            F.col("block_number").isNotNull(), delay.cast("long")
        ).alias("inclusion_delay_ms"),
    ).drop("rc_hash")
