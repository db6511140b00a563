"""F5 / J3-live: on-chain inclusion check against an execution-layer RPC,
as a distributed `mapInPandas` operator (SURVEY.md §4.3 item 4; reference
cmd/merge/inclusioncheck.go:52-141 TxUpdateWorker.updateTx and
collector/tx_processor.go:259-276).

Design for a 1000-executor cluster:

- The RPC client is created ONCE PER PARTITION from a picklable zero-arg
  factory (a connection cannot be serialized from the driver); the reference
  likewise dials one ethclient per worker goroutine
  (inclusioncheck.go:75-82).
- A per-partition block cache mirrors the reference's BlockCache
  (inclusioncheck.go:16-50): one receipt lookup per *block* rather than per
  tx, because fetching the including block caches every tx hash in it. The
  cache is LRU-bounded so a long partition cannot grow without limit.
- Rows flow through Arrow batches; nothing is collected to the driver.

The client is duck-typed so tests inject a dict-backed mock and production
wires a thin JSON-RPC adapter (not shipped — no network in this sandbox):

    client.transaction_receipt(tx_hash) -> {"block_number": int} | None
    client.block_by_number(n) -> {"number": int, "timestamp_ms": int,
                                  "tx_hashes": list[str]}
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


class PartitionBlockCache:
    """tx hash → (height, block timestamp ms), filled a whole block at a
    time; LRU-bounded by number of blocks (reference BlockCache, unbounded
    there because a merge run is one day)."""

    def __init__(self, max_blocks: int = 4096) -> None:
        self._blocks: OrderedDict[int, list[str]] = OrderedDict()
        self._txs: dict[str, tuple[int, int]] = {}
        self._max_blocks = max_blocks
        self.hits = 0
        self.misses = 0

    def get(self, tx_hash: str) -> tuple[int, int] | None:
        entry = self._txs.get(tx_hash)
        if entry is not None:
            self.hits += 1
        else:
            self.misses += 1
        return entry

    def add_block(self, number: int, timestamp_ms: int, tx_hashes: list[str]) -> None:
        if number in self._blocks:
            return
        self._blocks[number] = tx_hashes
        for h in tx_hashes:
            self._txs[h] = (number, timestamp_ms)
        while len(self._blocks) > self._max_blocks:
            _, evicted = self._blocks.popitem(last=False)
            for h in evicted:
                self._txs.pop(h, None)


class MockRPCClient:
    """Dict-backed RPC stand-in (tests / offline runs). With strict=True it
    raises if the caller re-fetches anything the PartitionBlockCache should
    have cached — a raised AssertionError fails the Spark task, making cache
    discipline an executable assertion. Lives in the library (not tests/) so
    executor processes can unpickle it."""

    def __init__(self, blocks: list[dict], strict: bool = True):
        self._blocks = {b["number"]: b for b in blocks}
        self._tx_to_block = {h: b["number"] for b in blocks for h in b["tx_hashes"]}
        self._fetched_blocks: set[int] = set()
        self._strict = strict

    def transaction_receipt(self, tx_hash):
        n = self._tx_to_block.get(tx_hash)
        if n is None:
            return None
        if self._strict and n in self._fetched_blocks:
            raise AssertionError(
                f"receipt re-fetched for {tx_hash}: block {n} was cached"
            )
        return {"block_number": n}

    def block_by_number(self, n):
        if self._strict and n in self._fetched_blocks:
            raise AssertionError(f"block {n} fetched twice")
        self._fetched_blocks.add(n)
        return self._blocks[n]


def _to_ms(ts) -> int:
    """Millisecond epoch from either a long-ms column or a timestamp column."""
    if isinstance(ts, pd.Timestamp):
        return ts.value // 1_000_000
    return int(ts)


_INCLUSION_FIELDS = [
    T.StructField("includedAtBlockHeight", T.LongType()),
    T.StructField("includedBlockTimestamp", T.LongType()),
    T.StructField("inclusionDelayMs", T.LongType()),
]


def rpc_inclusion_enrich(
    df: DataFrame,
    client_factory: Callable[[], object],
    hash_col: str = "hash",
    ts_col: str = "timestamp",
    max_cached_blocks: int = 4096,
) -> DataFrame:
    """Attach includedAtBlockHeight / includedBlockTimestamp / inclusionDelayMs
    by querying an RPC per partition (0/0/0 when not included — reference
    inclusioncheck.go:100-105). inclusionDelayMs can be negative
    (README.md:84-88)."""
    out_schema = T.StructType(list(df.schema.fields) + _INCLUSION_FIELDS)
    in_cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        cache = PartitionBlockCache(max_blocks=max_cached_blocks)
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            heights, block_ts, delays = [], [], []
            for tx_hash, ts in zip(pdf[hash_col], pdf[ts_col]):
                entry = cache.get(tx_hash)
                if entry is None:
                    receipt = client.transaction_receipt(tx_hash)
                    if receipt is not None:
                        blk = client.block_by_number(receipt["block_number"])
                        cache.add_block(
                            blk["number"], blk["timestamp_ms"], blk["tx_hashes"]
                        )
                        entry = (blk["number"], blk["timestamp_ms"])
                if entry is None:
                    heights.append(0)
                    block_ts.append(0)
                    delays.append(0)
                else:
                    heights.append(entry[0])
                    block_ts.append(entry[1])
                    delays.append(entry[1] - _to_ms(ts))
            yield pdf[in_cols].assign(
                includedAtBlockHeight=pd.Series(heights, dtype="int64"),
                includedBlockTimestamp=pd.Series(block_ts, dtype="int64"),
                inclusionDelayMs=pd.Series(delays, dtype="int64"),
            )

    return df.mapInPandas(run, out_schema)
