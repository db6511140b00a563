"""All fixed schemas, declared once (SURVEY.md §1).

The reference defines its schemas as compile-time Go struct tags
(reference common/txsummary.go:40-70, common/sourcelog.go:11-12,
common/trashfile.go:11-17); we define them once here as StructTypes and use
them on every read — never ``inferSchema`` (a schema inference pass is a
full extra scan at 100 TB).

Type decisions (SURVEY.md §1.2-1.3):
- uint256 columns (value/gasPrice/...) stay ``StringType`` — values reach
  2^256-1 which overflows Decimal(38,0). Helpers cast on demand.
- timestamps are Unix-epoch milliseconds as ``LongType`` with derived
  TimestampType views, matching parquet TIMESTAMP_MILLIS.
- ``sources`` is the only nested type: ArrayType(String), ordered by
  first-seen timestamp.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Raw collector inputs
# ---------------------------------------------------------------------------

#: Collector transactions CSV: timestamp_ms,hash,raw_tx  (headerless)
#: reference collector/tx_processor.go:302, common/txsfile.go:84-148
TX_RAW = T.StructType(
    [
        T.StructField("timestamp_ms", T.LongType(), True),
        T.StructField("hash", T.StringType(), True),
        T.StructField("raw_tx", T.StringType(), True),  # 0x-prefixed RLP hex
    ]
)

#: Sourcelog CSV: timestamp_ms,hash,source (reference common/sourcelog.go:11-12)
SOURCELOG = T.StructType(
    [
        T.StructField("timestamp_ms", T.LongType(), True),
        T.StructField("hash", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

#: Trash CSV: timestamp_ms,hash,source,reason,notes
#: reference common/trashfile.go:11-17; 4-field rows legal (notes empty)
TRASH = T.StructType(
    [
        T.StructField("timestamp_ms", T.LongType(), True),
        T.StructField("hash", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("reason", T.StringType(), True),
        T.StructField("notes", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# The core output schema — TxSummaryEntry
# reference common/txsummary.go:40-70; README.md:48-67
# ---------------------------------------------------------------------------

TXSUMMARY = T.StructType(
    [
        T.StructField("timestamp", T.LongType(), True),  # ms, earliest receive
        T.StructField("hash", T.StringType(), True),
        T.StructField("chainId", T.StringType(), True),
        T.StructField("txType", T.LongType(), True),
        T.StructField("from", T.StringType(), True),
        T.StructField("to", T.StringType(), True),  # empty = contract creation
        T.StructField("value", T.StringType(), True),  # uint256 decimal string
        T.StructField("nonce", T.StringType(), True),
        T.StructField("gas", T.StringType(), True),
        T.StructField("gasPrice", T.StringType(), True),
        T.StructField("gasTipCap", T.StringType(), True),
        T.StructField("gasFeeCap", T.StringType(), True),
        T.StructField("dataSize", T.LongType(), True),
        T.StructField("data4Bytes", T.StringType(), True),
        T.StructField("sources", T.ArrayType(T.StringType()), True),
        T.StructField("includedAtBlockHeight", T.LongType(), True),
        T.StructField("includedBlockTimestamp", T.LongType(), True),
        T.StructField("inclusionDelayMs", T.LongType(), True),
        T.StructField("rawTx", T.BinaryType(), True),  # parquet only, not CSV
    ]
)

#: CSV column order differs from parquet: tx_type LAST, rawTx omitted
#: (reference common/txsummary.go:17-36)
TXSUMMARY_CSV_COLUMNS = [
    "timestamp_ms",
    "hash",
    "chain_id",
    "from",
    "to",
    "value",
    "nonce",
    "gas",
    "gas_price",
    "gas_tip_cap",
    "gas_fee_cap",
    "data_size",
    "data_4bytes",
    "sources",
    "included_at_block_height",
    "included_block_timestamp_ms",
    "inclusion_delay_ms",
    "tx_type",
]

#: parquet field → metadata-CSV header name (same data, snake_case names)
TXSUMMARY_PARQUET_TO_CSV = {
    "timestamp": "timestamp_ms",
    "hash": "hash",
    "chainId": "chain_id",
    "from": "from",
    "to": "to",
    "value": "value",
    "nonce": "nonce",
    "gas": "gas",
    "gasPrice": "gas_price",
    "gasTipCap": "gas_tip_cap",
    "gasFeeCap": "gas_fee_cap",
    "dataSize": "data_size",
    "data4Bytes": "data_4bytes",
    "sources": "sources",
    "includedAtBlockHeight": "included_at_block_height",
    "includedBlockTimestamp": "included_block_timestamp_ms",
    "inclusionDelayMs": "inclusion_delay_ms",
    "txType": "tx_type",
}

#: Blocks enrichment table for the inclusion join (SURVEY.md J3)
BLOCKS = T.StructType(
    [
        T.StructField("hash", T.StringType(), True),
        T.StructField("block_number", T.LongType(), True),
        T.StructField("block_timestamp_ms", T.LongType(), True),
    ]
)

#: Streaming in-flight record (reference common/types.go:10-14)
TX_IN = T.StructType(
    [
        T.StructField("received_at", T.TimestampType(), True),
        T.StructField("raw_tx", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

# Known source tags + aliases (reference common/consts.go:8-42)
KNOWN_SOURCES = ["local", "bloxroute", "chainbound", "eden", "alchemy", "infura"]
SOURCE_ALIASES = {
    "alchemy.com/": "alchemy",
    "infura.io/": "infura",
}

#: Late-data rule: included >= 12s before first receipt → drop/trash
#: (reference common/consts.go:24, common/txsummary.go:84-87)
ALREADY_INCLUDED_THRESHOLD_MS = -12_000

#: Streaming dedup TTL (reference collector/consts.go:11)
STREAM_DEDUP_TTL_MINUTES = 30

#: Streaming file bucket (reference collector/consts.go:20)
STREAM_BUCKET_MINUTES = 60
