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
  watermark like the reference's TTL eviction, with one deliberate edge
  difference: the reference expires on WALL-CLOCK time, Spark on EVENT-TIME
  watermark — when event time advances slowly, Spark holds dedup state
  longer and may suppress a re-arrival the reference would re-admit. That
  direction (fewer duplicate emissions) is safe for every downstream
  consumer, and the daily merge re-dedups regardless. The dedup key is
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

from mempool_dumpster_spark.functions.rlp_udf import parse_raw_tx_udf, tx_hash_udf
from mempool_dumpster_spark.functions.scalars import epoch_ms
from mempool_dumpster_spark.schemas import (
    STREAM_DEDUP_TTL_MINUTES,
    TX_IN,
)

#: reference common/consts.go:16
REASON_ALREADY_ONCHAIN = "tx-already-onchain"


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


def dedup_first_arrival(stream: DataFrame) -> DataFrame:
    """ST1+ST4: watermarked streaming dedup on the canonical tx hash
    (cheap hash-only UDF, no ECDSA); the surviving row per hash is the FIRST
    arrival, which is exactly the reference's first-source-wins semantics.
    Undecodable payloads fall back to the raw payload as dedup key so each
    distinct garbage payload still trashes exactly once."""
    return (
        stream.withColumn("hash", tx_hash_udf(F.col("raw_tx")))
        .withColumn(
            "dedup_key",
            F.coalesce(F.col("hash"), F.concat(F.lit("raw:"), F.col("raw_tx"))),
        )
        .withWatermark("received_at", f"{STREAM_DEDUP_TTL_MINUTES} minutes")
        .dropDuplicatesWithinWatermark(["dedup_key"])
        .drop("dedup_key")
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
    transactions: object  # one query writing BOTH transactions and trash

    def await_all(self) -> None:
        for q in (self.sourcelog, self.transactions):
            q.awaitTermination()

    def stop_all(self) -> None:
        for q in (self.sourcelog, self.transactions):
            q.stop()


def start_collector(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = False,
    rpc_client_factory=None,
    sse_publish=None,
    sse_batch_cap: int = 10_000,
) -> CollectorQueries:
    """Wire the full topology and start the two queries (see module
    docstring for why two): the pre-dedup sourcelog sink, and the
    dedup→parse→foreachBatch query that writes transactions + trash from one
    persisted micro-batch.

    `rpc_client_factory` (optional, picklable zero-arg factory — see
    operators/inclusion_rpc) enables ST5/F5: valid first arrivals already
    on-chain route to trash with reason 'tx-already-onchain' and the block
    number in notes (reference collector/tx_processor.go:259-276).

    The foreachBatch also appends per-(minute, source) counter increments to
    `{out_dir}/metrics` — families `first`, `tx-trash`, `tx-onchain`
    (A15/ST3, reference collector/sourcemetrics.go:10-16; `all`/`unique`
    come from the pre-dedup `source_metrics` aggregate). Increments from
    different micro-batches sum per window, like the reference's
    reset-every-minute counters accumulate within a minute.

    `sse_publish` (optional, driver-side callable taking a list of row
    dicts with hash/raw_tx) receives each micro-batch's valid first
    arrivals — the reference pushes exactly these to its SSE API
    (collector/tx_processor.go SendTx into api/server.go); pass
    `SSEBroadcaster(...).publish_rows` to serve them live. foreachBatch
    runs on the driver, so the broadcaster needs no serialization. The
    driver-side collect is bounded by `sse_batch_cap`; frames beyond the
    cap are dropped (best-effort, like the reference) but COUNTED — the
    metrics stream records `sse-drop-cap` (pre-publish cap overflow) and
    `sse-drop-queue` (per-subscriber full-queue drops, when the callable
    returns a count as `SSEBroadcaster.publish_rows` does) rows under
    source `_sse`, mirroring the reference's per-source metrics
    discipline (collector/sourcemetrics.go:29-55).

    `trigger_available_now=True` drains the currently-available input and
    stops — the batch-testing mode; continuous mode otherwise.
    """
    from mempool_dumpster_spark.operators.inclusion_rpc import rpc_inclusion_enrich

    def _trigger(writer):
        return writer.trigger(availableNow=True) if trigger_available_now else writer

    # Query A — sourcelog: every receipt, pre-dedup (tx_processor.go:229);
    # hash-only UDF, no sender recovery.
    sourcelog = _bucketed(
        stream.select(
            epoch_ms("received_at").alias("timestamp_ms"),
            tx_hash_udf(F.col("raw_tx")).alias("hash"),
            "source",
            "received_at",
        ).filter(F.col("hash").isNotNull())
    ).drop("received_at")
    q_sourcelog = _trigger(
        sourcelog.writeStream.format("csv")
        .option("path", f"{out_dir}/sourcelog")
        .option("checkpointLocation", f"{checkpoint_dir}/sourcelog")
        .partitionBy("date", "hour")
        .outputMode("append")
    ).start()

    # Query B — first arrivals only reach the expensive parse UDF; one
    # foreachBatch writes valid + trash from a single persisted batch, so the
    # ECDSA recovery runs exactly once per unique tx per micro-batch.
    first = with_parsed(dedup_first_arrival(stream))

    def _write_first_arrivals(batch: DataFrame, _batch_id: int) -> None:
        # ST5/F5: flag valid rows already on-chain (0 height = mempool tx)
        if rpc_client_factory is not None:
            batch = rpc_inclusion_enrich(
                batch, rpc_client_factory, hash_col="hash", ts_col="received_at"
            ).withColumn("onchain", F.col("includedAtBlockHeight") > 0)
        else:
            batch = batch.withColumn("onchain", F.lit(False)).withColumn(
                "includedAtBlockHeight", F.lit(0).cast("long")
            )
        batch = batch.persist()
        try:
            is_first = F.col("parsed.is_valid") & ~F.col("onchain")
            # 3-column reference format (collector/tx_processor.go:302):
            # timestamp_ms,hash,raw_tx — source is in the sourcelog.
            valid = _bucketed(
                batch.filter(is_first).select(
                    epoch_ms("received_at").alias("timestamp_ms"),
                    "hash",
                    F.concat(
                        F.lit("0x"), F.lower(F.hex("parsed.rawTx"))
                    ).alias("raw_tx"),
                    "received_at",
                )
            ).drop("received_at")
            valid.write.mode("append").partitionBy("date", "hour").csv(
                f"{out_dir}/transactions"
            )
            sse_drop_cap = sse_drop_queue = 0
            if sse_publish is not None:
                # best-effort, like the reference's SSE send (silent drop on
                # full channels): a subscriber-side failure must never fail
                # the micro-batch — the transactions CSV append above is not
                # idempotent, so a retry would duplicate rows. Drops are
                # best-effort too, but never SILENT: both the cap overflow
                # and the subscriber-queue drops land in the metrics stream.
                try:
                    frames = [
                        r.asDict()
                        for r in valid.select("hash", "raw_tx")
                        .limit(sse_batch_cap)
                        .collect()
                    ]
                    if len(frames) == sse_batch_cap:
                        # only pay the count job when the cap actually bit
                        sse_drop_cap = max(0, valid.count() - sse_batch_cap)
                    sse_drop_queue = int(sse_publish(frames) or 0)
                except Exception:
                    import warnings

                    warnings.warn(
                        "sse_publish raised; batch continues (SSE is "
                        "best-effort)",
                        RuntimeWarning,
                        stacklevel=2,
                    )
            trash = _bucketed(
                batch.filter(~is_first).select(
                    epoch_ms("received_at").alias("timestamp_ms"),
                    F.coalesce("hash", F.lit("")).alias("hash"),
                    "source",
                    F.when(F.col("onchain"), F.lit(REASON_ALREADY_ONCHAIN))
                    .otherwise(F.col("parsed.reason"))
                    .alias("reason"),
                    F.when(
                        F.col("onchain"),
                        F.col("includedAtBlockHeight").cast("string"),
                    )
                    .otherwise(F.coalesce(F.col("parsed.decode_error"), F.lit("")))
                    .alias("notes"),
                    "received_at",
                )
            ).drop("received_at")
            trash.write.mode("append").partitionBy("date", "hour").csv(
                f"{out_dir}/trash"
            )
            # A15 counter increments (reference tx_processor.go:252,269-270,290)
            fam = lambda cond, name: F.sum(cond.cast("long")).alias(name)
            metrics = (
                batch.groupBy(
                    F.date_trunc("minute", "received_at").alias("minute"), "source"
                )
                .agg(
                    fam(is_first, "first"),
                    fam(~is_first, "tx-trash"),
                    fam(F.col("onchain"), "tx-onchain"),
                )
                .select(
                    "minute",
                    "source",
                    F.explode(
                        F.array(
                            *[
                                F.struct(
                                    F.lit(n).alias("family"),
                                    F.col(f"`{n}`").alias("n"),
                                )
                                for n in ("first", "tx-trash", "tx-onchain")
                            ]
                        )
                    ).alias("fn"),
                )
                .select("minute", "source", "fn.family", "fn.n")
                .filter(F.col("n") > 0)
            )
            metrics.write.mode("append").csv(f"{out_dir}/metrics")
            if sse_drop_cap or sse_drop_queue:
                # same (minute, source, family, n) shape as the counter
                # families above, under the synthetic source `_sse`
                minute = batch.agg(
                    F.max(F.date_trunc("minute", "received_at"))
                ).collect()[0][0]
                drops = [
                    (minute, "_sse", fam, n)
                    for fam, n in (
                        ("sse-drop-cap", sse_drop_cap),
                        ("sse-drop-queue", sse_drop_queue),
                    )
                    if n > 0
                ]
                batch.sparkSession.createDataFrame(
                    drops,
                    schema="minute timestamp, source string, family string, n long",
                ).write.mode("append").csv(f"{out_dir}/metrics")
        finally:
            batch.unpersist()

    q_first = _trigger(
        first.writeStream.foreachBatch(_write_first_arrivals)
        .option("checkpointLocation", f"{checkpoint_dir}/first_arrivals")
        .outputMode("append")
    ).start()

    return CollectorQueries(sourcelog=q_sourcelog, transactions=q_first)


def source_metrics(stream: DataFrame) -> DataFrame:
    """ST3/A15, pre-dedup families: per-minute `all` (receipt count) and
    `unique` (distinct-hash estimate) per source, tumbling 1-minute windows
    (reference collector/sourcemetrics.go:10-16,29-55, reset-every-minute
    loop). The post-dedup families — `first`, `tx-trash`, `tx-onchain` —
    are emitted by start_collector's foreachBatch to `{out_dir}/metrics`,
    because they require the dedup/validate/onchain pipeline state and the
    reference likewise increments them inside the processor
    (tx_processor.go:252,269-270,290).

    Run with outputMode('update') to a console/memory/metrics sink.

    Cost note: this is a PRE-dedup per-receipt path, so it uses the
    hash-only UDF (keccak over the raw bytes) — never the full parse UDF,
    whose ECDSA sender recovery is ~85% of parse cost and is pure waste
    for a counter that only needs the hash.
    """
    return (
        stream.withColumn("hash", tx_hash_udf(F.col("raw_tx")))
        .withWatermark("received_at", "2 minutes")
        .groupBy(F.window("received_at", "1 minute").alias("minute"), "source")
        .agg(
            F.count("*").alias("n_all"),
            F.approx_count_distinct("hash").alias("n_unique"),
        )
    )
