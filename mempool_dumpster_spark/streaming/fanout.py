"""Downstream fan-out sinks (S21 SSE / S22 HTTP receiver; SURVEY.md §2.1).

The reference forwards raw txs to HTTP receivers gated by a per-receiver
source allowlist (collector/receiver.go:33-52, tx_processor.go:178-199) and
broadcasts to SSE subscribers with drop-when-full queues (api/server.go).

Spark restatement: the allowlist is a plain filter (F6) on the stream; the
delivery side runs in `foreachBatch` with a pluggable `send` callable so
tests inject a recorder and production injects an HTTP/SSE publisher. The
drop-when-slow semantics of SSE belong to the service layer, not the engine
(SURVEY.md ST7) — foreachBatch guarantees at-least-once hand-off to it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALLOW_ALL = "all"


def allowlist_filter(df: DataFrame, allowed_sources: list[str]) -> DataFrame:
    """F6: forward only allowed sources; the 'all' wildcard disables the
    gate (reference collector/tx_processor.go:110-115, 178-181)."""
    if ALLOW_ALL in allowed_sources:
        return df
    return df.filter(F.col("source").isin(allowed_sources))


def receiver_sink(
    df: DataFrame,
    send: Callable[[list[dict]], None],
    allowed_sources: list[str],
    checkpoint: str,
    batch_cap: int = 10_000,
):
    """S22: at-least-once delivery of (hash, raw_tx, source) rows to an
    external receiver. `send` gets one list of row-dicts per micro-batch
    partition-collapsed on the driver — receivers are low-volume by
    definition (first arrivals only); cap guards against replay storms."""
    filtered = allowlist_filter(df, allowed_sources)

    def deliver(batch_df: DataFrame, batch_id: int) -> None:
        rows = [r.asDict() for r in batch_df.limit(batch_cap).collect()]
        if rows:
            send(rows)

    return (
        filtered.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", checkpoint)
        .start()
    )
