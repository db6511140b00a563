"""Analyzer aggregations A6-A17 (SURVEY.md §2.5; reference common/analyzer.go).

Each helper returns a small DataFrame; `analyze()` runs them all over one
cached input (the reference's single-pass analyzer becomes ~6 independent
hash aggregates over a cached DataFrame — Catalyst gives each one
partial+final aggregation, and the cache avoids rescanning the parquet).

Scale notes: every aggregate here groups on low-cardinality keys (source,
txType, boolean flags), so the shuffles are tiny regardless of input size;
the cost is the scan, paid once via `.persist()`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _included():
    return F.col("includedAtBlockHeight") > 0


def count_unique(txs: DataFrame) -> DataFrame:
    """A6: unique tx count (reference common/analyzer.go:83)."""
    return txs.agg(F.count("*").alias("n_unique"))


def included_split(txs: DataFrame) -> DataFrame:
    """A7: included / not-included counts (reference common/analyzer.go:87-91)."""
    return (
        txs.groupBy(_included().alias("included"))
        .agg(F.count("*").alias("n"))
        .orderBy("included")
    )


def count_by_txtype(txs: DataFrame) -> DataFrame:
    """A8+A9: per-type counts and raw bytes (reference common/analyzer.go:94-95)."""
    return (
        txs.groupBy("txType")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce(F.length("rawTx"), F.lit(0))).alias("bytes"),
        )
        .orderBy("txType")
    )


def count_by_source(txs: DataFrame) -> DataFrame:
    """A10: explode sources, count per source (reference common/analyzer.go:98-100)."""
    return (
        txs.select(F.explode("sources").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .orderBy("source")
    )


def source_inclusion_split(txs: DataFrame) -> DataFrame:
    """A11: per-source landed / not-landed (reference common/analyzer.go:102-107)."""
    return (
        txs.select(F.explode("sources").alias("source"), _included().alias("included"))
        .groupBy("source", "included")
        .agg(F.count("*").alias("n"))
        .orderBy("source", "included")
    )


def exclusive_orderflow(txs: DataFrame) -> DataFrame:
    """A12: exclusive txs (seen by exactly one source) per source × included
    (reference common/analyzer.go:109-122; README.md:125's query)."""
    return (
        txs.filter(F.size("sources") == 1)
        .select(
            F.element_at("sources", 1).alias("source"), _included().alias("included")
        )
        .groupBy("source", "included")
        .agg(F.count("*").alias("n"))
        .orderBy("source", "included")
    )


def time_span(txs: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """A13: first/last seen + duration (reference common/analyzer.go:125-137)."""
    return txs.agg(
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration_ms"),
    )


def distinct_sorted(txs: DataFrame) -> DataFrame:
    """A14: sorted distinct sources and txTypes (reference common/analyzer.go:139-149)."""
    return txs.agg(
        F.sort_array(
            F.array_distinct(F.flatten(F.collect_set("sources")))
        ).alias("sources"),
        F.sort_array(F.collect_set("txType")).alias("tx_types"),
    )


def inclusion_delay_quantiles(
    txs: DataFrame, probs: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """A16: inclusion-delay quantiles in seconds (README.md:134).

    Exact `percentile` (interpolated, ClickHouse `quantiles` semantics) —
    switch to percentile_approx at the 100 TB tier where an exact global
    sort-based percentile is not worth it.
    """
    secs = (F.col("inclusionDelayMs") / 1000.0).alias("s")
    return txs.filter(_included()).select(secs).agg(
        F.percentile("s", F.lit(list(probs))).alias("quantiles_s"),
        F.avg("s").alias("avg_s"),
    )
