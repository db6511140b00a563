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
    external receiver. `send` gets lists of at most `batch_cap` row-dicts —
    batch_cap is a CHUNK size bounding driver memory and per-call receiver
    work, never a truncation: a replay-storm micro-batch (e.g. the whole
    backlog after a restart under availableNow) is delivered in full as
    multiple send() calls. The old `limit(batch_cap)` dropped an arbitrary
    remainder while the checkpoint still committed the batch — rows were
    permanently undelivered, violating at-least-once."""
    filtered = allowlist_filter(df, allowed_sources)

    def deliver(batch_df: DataFrame, batch_id: int) -> None:
        chunk: list[dict] = []
        for r in batch_df.toLocalIterator():
            chunk.append(r.asDict())
            if len(chunk) >= batch_cap:
                send(chunk)
                chunk = []
        if chunk:
            send(chunk)

    return (
        filtered.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", checkpoint)
        .start()
    )
