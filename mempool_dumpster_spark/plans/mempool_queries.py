"""The documented analytical query surface over merged transactions parquet —
the 12 ClickHouse-local queries from reference README.md:104-137, each as a
named Spark function over a TXSUMMARY DataFrame (F7 + §2.9 scalar surface).

A user of the reference runs these with `clickhouse local` on the daily
parquet; here they run as Catalyst plans with predicate pushdown and column
pruning (none of them touch rawTx except q3/q4, so the heavy column is never
scanned for the rest).

ClickHouse → Spark translations: `has(sources, s)` → array_contains;
`hasAll(sources, [..])` → forall/chained array_contains; `sources[1]` →
element_at(sources, 1) (both 1-based); `quantiles(..)(x)` → percentile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNISWAP_V2 = "0x7a250d5630b4cf539739df2c5dacb4c659f2488d"


def q1_count_rows(txs: DataFrame) -> DataFrame:
    """README.md:104 — SELECT count(*)"""
    return txs.agg(F.count("*").alias("n"))


def q2_count_by_txtype(txs: DataFrame) -> DataFrame:
    """README.md:107 — count by transaction type. Deliberately
    `COUNT(txType)` (null-skipping), byte-faithful to the reference's
    documented query — equivalent to COUNT(*) here since txType is a
    required column."""
    return txs.groupBy("txType").agg(F.count("txType").alias("n")).orderBy("txType")


def q3_first_raw(txs: DataFrame) -> DataFrame:
    """README.md:110 — hash + hex(rawTx) of the first entry"""
    return txs.orderBy("timestamp").select(
        "hash", F.lower(F.hex("rawTx")).alias("rawTx_hex")
    ).limit(1)


def q4_details_of_hash(txs: DataFrame, tx_hash: str) -> DataFrame:
    """README.md:113 — point lookup by hash (pushed-down parquet filter)"""
    return txs.filter(F.col("hash") == tx_hash.lower()).select(
        "timestamp", "hash", "from", "to", F.lower(F.hex("rawTx")).alias("rawTx_hex")
    )


def q5_seen_by_source(txs: DataFrame, source: str) -> DataFrame:
    """README.md:116 — count where has(sources, s)"""
    return txs.filter(F.array_contains("sources", source)).agg(
        F.count("*").alias("n")
    )


def q6_seen_by_all_sources(txs: DataFrame, sources: list[str]) -> DataFrame:
    """README.md:119 — count where hasAll(sources, [...])"""
    cond = F.lit(True)
    for s in sources:
        cond = cond & F.array_contains("sources", s)
    return txs.filter(cond).agg(F.count("*").alias("n"))


def q7_exclusive_from(txs: DataFrame, source: str) -> DataFrame:
    """README.md:122 — exclusive txs: length(sources)==1 AND sources[1]==s"""
    return txs.filter(
        (F.size("sources") == 1) & (F.element_at("sources", 1) == source)
    ).agg(F.count("*").alias("n"))


def q8_exclusive_landed_by_source(txs: DataFrame) -> DataFrame:
    """README.md:125 — exclusive landed/not-landed per source"""
    included = (F.col("includedBlockTimestamp") != 0).alias("included")
    return (
        txs.filter(F.size("sources") == 1)
        .groupBy(F.element_at("sources", 1).alias("source"), included)
        .agg(F.count("*").alias("n"))
        .orderBy("source", "included")
    )


def q9_to_address(txs: DataFrame, to: str = UNISWAP_V2) -> DataFrame:
    """README.md:128 — count txs to a contract (skewed-key point filter)"""
    return txs.filter(F.col("to") == to.lower()).agg(F.count("*").alias("n"))


def q10_to_address_included_split(txs: DataFrame, to: str = UNISWAP_V2) -> DataFrame:
    """README.md:131 — per-contract included/not-included split"""
    included = (F.col("includedBlockTimestamp") != 0).alias("included")
    return (
        txs.filter(F.col("to") == to.lower())
        .groupBy(included)
        .agg(F.count("*").alias("n"))
        .orderBy("included")
    )


def q11_inclusion_delay_quantiles(txs: DataFrame, to: str = UNISWAP_V2) -> DataFrame:
    """README.md:134 — quantiles(0.5,0.9,0.99) + avg of inclusionDelay in s"""
    delay_s = (F.col("inclusionDelayMs") / 1000.0).alias("incdelay")
    return (
        txs.filter((F.col("to") == to.lower()) & (F.col("includedBlockTimestamp") != 0))
        .select(delay_s)
        .agg(
            F.percentile("incdelay", F.lit([0.5, 0.9, 0.99])).alias("quantiles"),
            F.avg("incdelay").alias("avg"),
        )
    )


def q12_contract_methods(txs: DataFrame, to: str = UNISWAP_V2) -> DataFrame:
    """README.md:137 — 4-byte selector histogram for a contract"""
    return (
        txs.filter(F.col("to") == to.lower())
        .groupBy("data4Bytes")
        .agg(F.count("data4Bytes").alias("n"))
        .orderBy(F.col("n").desc(), "data4Bytes")
    )


ALL_QUERIES = {
    "q1_count_rows": q1_count_rows,
    "q2_count_by_txtype": q2_count_by_txtype,
    "q3_first_raw": q3_first_raw,
    "q4_details_of_hash": q4_details_of_hash,
    "q5_seen_by_source": q5_seen_by_source,
    "q6_seen_by_all_sources": q6_seen_by_all_sources,
    "q7_exclusive_from": q7_exclusive_from,
    "q8_exclusive_landed_by_source": q8_exclusive_landed_by_source,
    "q9_to_address": q9_to_address,
    "q10_to_address_included_split": q10_to_address_included_split,
    "q11_inclusion_delay_quantiles": q11_inclusion_delay_quantiles,
    "q12_contract_methods": q12_contract_methods,
}
