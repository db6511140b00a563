"""Streaming corpus growth: the incremental-prep append gate
(ml.prep.append_batch — within-batch quality/dedup/decontam gates PLUS
cross-corpus exact + near-dup gates against the committed signature
artifact) driven from a LIVE document stream instead of a CLI batch.

    landing dir (JSONL docs) ─▶ readStream ─▶ foreachBatch:
        append_batch(out_dir, micro-batch)
            · self-heal artifact (crash window between the two commits)
            · prep_incremental gates (quality → exact → near-dup →
              decontam → splits, then cross-corpus anti-joins)
            · UPSERT corpus version, UPSERT signature version

Why foreachBatch and not a streaming-native plan: the gate JOINS each
micro-batch against the committed corpus's signature artifact — a
dataset that GROWS as batches commit. A stream-static join binds the
static side's snapshot per-batch already, but the upsert must also be
transactional with the gate (manifest read-modify-commit), and the
manifest's single-writer versioned-commit protocol is a batch-side
construct. foreachBatch gives each micro-batch exactly the CLI
`prep --append` semantics, so batch and streaming growth are the SAME
code path (tested for parity). At-least-once replay is safe:
`append_batch` is idempotent — a replayed batch's kept rows are exact
text-hash matches in the artifact and drop out.

Scale: each micro-batch costs (batch × artifact-bands) joins, never
corpus text — the same bound as `prep --append`; corpus growth from a
firehose is a sequence of bounded transactions, not a re-prep.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from mempool_dumpster_spark.ml.prep import PrepConfig, append_batch

#: the documents-stream projection every transport must yield
DOC_STREAM_SCHEMA = "doc_id string, text string"


def doc_file_stream(
    spark: SparkSession,
    landing_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """JSONL document stream for tests/local runs: one {"doc_id": ...,
    "text": ...} object per line (the same line protocol as
    sources/readers.py:read_documents_jsonl). A Kafka/queue transport
    plugs in with the same two-column projection. maxFilesPerTrigger
    defaults to 1 so each landed file is its own gated append
    transaction."""
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_dir)
    )


def start_corpus_append(
    spark: SparkSession,
    stream: DataFrame,
    out_dir: str,
    config: PrepConfig | None = None,
    benchmark: DataFrame | None = None,
    checkpoint: str | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Run the append gate over a document stream: every micro-batch goes
    through `ml.prep.append_batch` against the committed corpus at
    `out_dir` (which must already exist with its `_signatures` artifact —
    the `prep --atomic --signatures` base commit). Appended per-split
    counts are journaled as JSONL to `{out_dir}_append_log/` (one line
    per non-empty batch) so operators can watch growth without querying
    the manifest.

    `available_now=True` drains the currently-available input and stops
    (the test/backfill trigger); the default is a continuous
    micro-batch query."""
    cfg = config or PrepConfig()
    # fail fast (and BEFORE the query starts) when the base corpus is
    # missing — a stream that errors on its first batch after minutes of
    # setup is a worse failure mode than an immediate exception
    from mempool_dumpster_spark.sources.manifest import read_committed

    read_committed(spark, out_dir)
    read_committed(spark, f"{out_dir}_signatures")

    log_dir = f"{out_dir}_append_log"
    os.makedirs(log_dir, exist_ok=True)

    def _gate(batch: DataFrame, batch_id: int) -> None:
        counts = append_batch(
            batch.sparkSession,
            out_dir,
            batch,
            benchmark=benchmark,
            config=cfg,
        )
        if counts:
            # tmp + os.replace, same as the manifest commit protocol: a
            # crash mid-write must never leave a truncated JSON file for
            # log-tailing tooling to choke on
            path = os.path.join(log_dir, f"batch-{batch_id:06d}.json")
            tmp = f"{path}.tmp"
            with open(tmp, "w") as f:
                json.dump({"batch_id": batch_id, "appended": counts}, f)
            os.replace(tmp, path)

    writer = stream.writeStream.foreachBatch(_gate).option(
        "checkpointLocation", checkpoint or f"{out_dir}_append_checkpoint"
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
