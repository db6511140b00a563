"""Sinks S13-S17 (SURVEY.md §2.1): parquet + the three CSV formats, with the
reference's serialization quirks.

Output format contract (reference cmd/merge/transactions.go:187-300,
common/txsummary.go:89-110):
- parquet: GZIP (ClickHouse/S3-Select compat), 128 MB row groups, 1 MB pages;
- metadata CSV: snake_case header, `tx_type` LAST, `sources` joined with a
  SPACE, no rawTx;
- raw CSV: `timestamp_ms,hash,raw_tx` with 0x-prefixed lowercase hex;
- sourcelog/trash CSVs: timestamp-sorted.

The merge pipeline persists the final DataFrame once and runs all sinks off
the cache — the Spark version of the reference's single-pass 3-way write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mempool_dumpster_spark.schemas import (
    TXSUMMARY_CSV_COLUMNS,
    TXSUMMARY_PARQUET_TO_CSV,
)


def write_transactions_parquet(df: DataFrame, path: str) -> None:
    """S13. Row-group size maps to parquet.block.size; dictionary encoding of
    to/data4Bytes/txType is automatic in Spark's writer."""
    (
        df.write.mode("overwrite")
        .option("compression", "gzip")
        .option("parquet.block.size", str(128 * 1024 * 1024))
        .option("parquet.page.size", str(1024 * 1024))
        .parquet(path)
    )


def write_metadata_csv(df: DataFrame, path: str) -> None:
    """S14: header CSV, reference column order (tx_type last), space-joined
    sources, rawTx omitted."""
    renamed = df.select(
        *[
            (
                F.array_join(F.col(pq), " ")
                if pq == "sources"
                else F.col(f"`{pq}`").cast("string")
            ).alias(csv)
            for pq, csv in TXSUMMARY_PARQUET_TO_CSV.items()
        ]
    )
    (
        renamed.select(*TXSUMMARY_CSV_COLUMNS)
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )


def write_raw_csv(df: DataFrame, path: str) -> None:
    """S15: `timestamp_ms,hash,raw_tx` with canonical 0x-hex payload and the
    header line the reference writes (cmd/merge/transactions.go:208)."""
    (
        df.select(
            F.col("timestamp").alias("timestamp_ms"),
            "hash",
            F.concat(F.lit("0x"), F.lower(F.hex("rawTx"))).alias("raw_tx"),
        )
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )


def write_sorted_csv(
    df: DataFrame, path: str, ts_col: str = "timestamp_ms", header: bool = True
) -> None:
    """S16/S17: timestamp-sorted CSV (range-partitioned global sort)."""
    (
        df.orderBy(ts_col)
        .write.mode("overwrite")
        .option("header", header)
        .csv(path)
    )
