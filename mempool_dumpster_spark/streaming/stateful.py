"""Custom stateful streaming operator: live arrival-order source attachment.

The reference's collector remembers, per tx hash, which sources have
delivered it and in what order: every receipt appends to the sourcelog
(collector/tx_processor.go:229) while `knownTxs` keeps the hash alive for
30 minutes (tx_processor.go:240-247, TTL cleanup 501-508), and the daily
merge later folds the log into the ordered first-seen-per-source array
(J1, operators/joins.attach_sources). This module is that fold running
LIVE, as Spark's general stateful primitive `applyInPandasWithState` —
the shape Structured Streaming's built-ins genuinely cannot express
(dropDuplicates keeps one row; window aggs can't maintain an ordered,
growing array per key with TTL eviction).

Semantics per micro-batch, per hash:
- new sources are appended in (timestamp, source) order — the emitted
  `sources` array is the arrival order the reference's summarizer reports;
- `first_seen_ms` tracks the earliest receipt across all batches;
- one row is emitted per updated hash per batch (output mode `update`) —
  downstream sees the array GROW as later sources deliver, exactly the
  progressive enrichment a live dashboard wants;
- state expires via an EVENT-time timeout `ttl_minutes` past the key's
  latest receipt, with no emission — mirroring the reference's silent
  knownTxs eviction, with the same deliberate event-time-vs-wall-clock
  difference already documented for ST1's dedup (collector.py:29-34): the
  watermark drives eviction, so slow event time holds state longer, which
  only delays cleanup, never corrupts output. (A processing-time timeout
  would match the reference's wall clock literally, but it also makes
  `availableNow` drains spin until the wall-clock TTL fires — event time
  is the Spark-native eviction clock.) Expired state means a very late
  re-arrival starts a fresh array — same behavior as the reference's
  cache miss; the daily batch merge is authoritative.
- TTL anchor divergence (deliberate, documented like the event-time one
  above): the reference's knownTxs records only the FIRST-seen time and
  evicts 30 min after that (tx_processor.go:240-247,501-508); here the
  deadline anchors on the LATEST receipt ever seen (`last_seen_ms`), so
  a re-delivery extends the key's life. Like the event-time difference,
  this only delays cleanup — it never corrupts output, and it is what
  keeps a still-active hash's source array growing instead of resetting
  mid-flight.

State size: one (array<string> sources, long first_seen_ms, long
last_seen_ms) per live hash — ~45k keys for a 2M-tx day at 30 min TTL,
trivially partitioned by hash across executors. The per-batch Python work
is Arrow-batched and proportional to the batch's updated keys only.

Checkpoint compatibility: the state schema grew from 2 to 3 fields when
`last_seen_ms` was added (so a late-but-in-watermark re-delivery can't
pull the eviction deadline earlier). Spark's state-store schema check
rejects checkpoints written by the 2-field version — restart such a query
with a fresh checkpoint location.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mempool_dumpster_spark.functions.scalars import epoch_ms


def sources_attach_stream(
    stream: DataFrame,
    key_col: str = "hash",
    source_col: str = "source",
    ts_col: str = "received_at",
    ttl_minutes: int = 30,
) -> DataFrame:
    """The streaming form of J1 `attach_sources`: per key, an ordered
    deduplicated array of the sources that delivered it, emitted on every
    update, with TTL state eviction. Input must be a streaming frame with
    (key, source, timestamp) columns."""
    ttl_ms = ttl_minutes * 60 * 1000

    def fold(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # reference: knownTxs TTL eviction, no emission
            return
        if state.exists:
            sources, first_ms, last_ms = state.get
            sources = list(sources)
        else:
            sources, first_ms, last_ms = [], None, 0
        for pdf in pdfs:
            for _, row in pdf.sort_values(["__ts_ms", "__source"]).iterrows():
                if row["__source"] not in sources:
                    sources.append(row["__source"])
                ms = int(row["__ts_ms"])
                first_ms = ms if first_ms is None else min(first_ms, ms)
                last_ms = max(last_ms, ms)
        state.update((sources, int(first_ms), int(last_ms)))
        # evict once the watermark passes the latest receipt + TTL.
        # last_ms persists across batches: a late-but-in-watermark
        # re-delivery older than a prior batch's receipt must not pull
        # the deadline earlier than "latest receipt ever + TTL".
        state.setTimeoutTimestamp(last_ms + ttl_ms)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "sources": [sources],
                "first_seen_ms": [int(first_ms)],
                "n_sources": [len(sources)],
            }
        )

    prepared = stream.select(
        F.col(key_col).alias("__key"),
        F.col(source_col).alias("__source"),
        F.col(ts_col).alias("__ts"),
        epoch_ms(ts_col).alias("__ts_ms"),
    ).withWatermark("__ts", f"{ttl_minutes} minutes")
    return prepared.groupBy("__key").applyInPandasWithState(
        fold,
        outputStructType=(
            "key string, sources array<string>, first_seen_ms long, n_sources int"
        ),
        stateStructType=(
            "sources array<string>, first_seen_ms long, last_seen_ms long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
