from mempool_dumpster_spark.functions.scalars import (
    alias_source,
    floor_percent,
    hex_encode,
    human_bytes,
    is_valid_hash,
    parse_date_multi,
    selector_4bytes,
    ts_ms_to_timestamp,
)

__all__ = [
    "alias_source",
    "floor_percent",
    "hex_encode",
    "human_bytes",
    "is_valid_hash",
    "parse_date_multi",
    "selector_4bytes",
    "ts_ms_to_timestamp",
]
