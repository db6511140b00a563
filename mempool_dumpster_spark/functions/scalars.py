"""Scalar projection functions P3-P14 (SURVEY.md §2.2) — all JVM-side
Column expressions (whole-stage codegen), no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hex_encode(col: Column | str) -> Column:
    """P3: binary → '0x'-prefixed lowercase hex (reference common/txsummary.go:76-78)."""
    return F.concat(F.lit("0x"), F.lower(F.hex(F.col(col) if isinstance(col, str) else col)))


def is_valid_hash(col: Column | str) -> Column:
    """P4: tx-hash validity — 66 chars, 0x + 64 lowercase hex
    (reference common/sourcelog.go:41-48)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) == 66) & c.rlike("^0x[0-9a-f]{64}$")


def selector_4bytes(data_col: Column | str) -> Column:
    """P6: first 4 bytes of binary calldata as 0x-hex, NULL→'' when <4 bytes
    (reference common/txsfile.go:177-180)."""
    c = F.col(data_col) if isinstance(data_col, str) else data_col
    return F.when(
        F.length(c) >= 4,
        F.concat(F.lit("0x"), F.lower(F.hex(F.substring(c, 1, 4)))),
    ).otherwise(F.lit(""))


def alias_source(col: Column | str, aliases: dict[str, str] | None = None) -> Column:
    """P7: source-name aliasing — URI fragments to canonical tags
    (reference common/consts.go:27-42, common/utils.go:124-138).

    Implemented as a folded when-chain (codegen'd); for a large alias map
    prefer a broadcast join instead.
    """
    from mempool_dumpster_spark.schemas import SOURCE_ALIASES

    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for frag, tag in (aliases or SOURCE_ALIASES).items():
        cond = c.contains(frag)
        expr = F.when(cond, tag) if expr is None else expr.when(cond, tag)
    return expr.otherwise(c) if expr is not None else c


def auth_token_and_url(auth: str) -> tuple[str, str]:
    """P13: split 'token' or 'token@url' into (token, url)
    (reference common/utils.go:191-198 GetAuthTokenAndURL)."""
    parts = auth.split("@")
    if len(parts) < 2:
        return auth, ""
    return parts[0], parts[1]


def title_source(col: Column | str) -> Column:
    """P14: English title-casing of source names for report labels
    (reference common/utils.go:30-31,183-189 — x/text cases.Title ≈ initcap)."""
    return F.initcap(F.col(col) if isinstance(col, str) else col)


def source_aliases_from_env() -> dict[str, str]:
    """P7 env hookup: parse SRC_ALIASES='alias=url,alias=url' into the
    {url_fragment: alias} map `alias_source` consumes (reference
    common/utils.go:124-138 SourceAliasesFromEnv — note the reference keys
    by the URL side, parts[1] → parts[0], reproduced here)."""
    import os

    aliases: dict[str, str] = {}
    raw = os.environ.get("SRC_ALIASES", "")
    if raw:
        for entry in raw.split(","):
            parts = entry.split("=")
            if len(parts) != 2:
                continue
            aliases[parts[1]] = parts[0]
    return aliases


def ts_ms_to_timestamp(col: Column | str) -> Column:
    """P8: Unix-ms long → TimestampType (reference common/utils.go:161-176)."""
    return F.timestamp_millis(F.col(col) if isinstance(col, str) else col)


def epoch_us(col: Column | str) -> Column:
    """Epoch microseconds of a timestamp column, robust to TIMESTAMP_NTZ.

    `unix_micros` only accepts TIMESTAMP; externally-produced parquet
    (pandas/pyarrow `timestamp[us]` with no timezone — the most common
    encoding in the wild) reads as TIMESTAMP_NTZ and makes it throw
    DATATYPE_MISMATCH. The cast is a no-op on TIMESTAMP and interprets NTZ
    wall-clock in the session timezone, which this engine pins to UTC
    (session.py) — so the epoch value matches what DuckDB/pandas compute
    for the same naive timestamp."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def epoch_ms(col: Column | str) -> Column:
    """Epoch milliseconds, TIMESTAMP_NTZ-robust — see `epoch_us`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))


def parse_date_multi(col: Column | str) -> Column:
    """P9: parse a date string in the reference's three accepted formats —
    date-only, datetime, RFC3339 (reference common/utils.go:200-209)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
    )


def floor_percent(num: Column, den: Column, decimals: int = 1) -> Column:
    """P10: a/b*100 FLOOR-rounded (never up — 99.97 → 99.9) to N decimals
    (reference common/utils.go:97-122)."""
    scale = 10**decimals
    return F.floor(num / den * 100 * scale) / scale


def human_bytes(n: float) -> str:
    """P11: IEC sizes relabeled KB/MB/GB (reference common/utils.go:141-147).
    Driver-side report helper, not a Column."""
    value = float(n)
    for unit in ("B", "KB", "MB", "GB", "TB", "PB"):
        if value < 1024 or unit == "PB":
            return f"{value:.1f} {unit}" if unit != "B" else f"{int(value)} B"
        value /= 1024
    return f"{value:.1f} PB"
