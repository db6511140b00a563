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


#: the vector-stream projection every transport must yield
VEC_STREAM_SCHEMA = "vec_id long, embedding array<double>"


def vector_file_stream(
    spark: SparkSession,
    landing_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """JSONL embedding stream for tests/local runs: one {"vec_id": ...,
    "embedding": [...]} object per line. A Kafka/queue transport plugs in
    with the same two-column projection."""
    return (
        spark.readStream.schema(VEC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_dir)
    )


def start_index_append(
    spark: SparkSession,
    stream: DataFrame,
    table: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    n_assign: int = 1,
    log_dir: str | None = None,
    checkpoint: str | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming ANN-index maintenance: grow a `write_ivfpq_index` table
    from a LIVE embedding stream — the vector twin of
    `start_corpus_append`. Each micro-batch is

        · GATED for idempotence: batch ids anti-join the index's
          existing ids, so an at-least-once replay (or an upstream
          duplicate) never double-inserts a vector — the same replay
          contract as the corpus gate, enforced on the id column of the
          code artifact (a skinny scan, never the vectors);
        · ENCODED with the PERSISTED train artifacts (no retrain inside
          the stream — codes are only comparable within one codebook
          generation; retraining is an offline rebuild, as in FAISS);
        · APPENDED partition-wise (`ml.similarity.append_ivfpq_index`):
          untouched cells' files are never rewritten, and
          `ivfpq_topk_pretrained` serves the union immediately.

    Why foreachBatch: the idempotence gate joins each micro-batch
    against the index table AS OF the previous commits — a growing
    static side — and the append itself is a batch-side catalog write.
    Appended counts journal to `log_dir` (tmp + os.replace, crash-safe)
    so operators can watch index growth without scanning the table.

    Visibility: the micro-batch writes run in the stream's CLONED
    session, which refreshes its own relation cache but not other
    sessions' — a session that cached the table's file listing before
    the stream ran keeps serving the stale listing (standard Spark
    semantics for any external writer to a catalog table). Serving
    through `ivfpq_topk_pretrained` is safe — it refreshes the table
    relation on entry; raw `spark.table(...)` readers must
    `spark.catalog.refreshTable(table)` themselves."""
    from mempool_dumpster_spark.ml.similarity import (
        _pq_shape,
        append_ivfpq_index,
    )

    _pq_shape(codebooks, dim)  # fail fast, before the query starts
    spark.table(table)  # and the base index must exist

    if log_dir:
        os.makedirs(log_dir, exist_ok=True)

    def _gate(batch: DataFrame, batch_id: int) -> None:
        sess = batch.sparkSession
        from pyspark.sql import functions as F

        # the clone inherits the parent session's relation cache — after
        # a stream restart that cache may predate earlier appends, and a
        # stale id listing would let replayed vectors back in
        sess.catalog.refreshTable(table)
        fresh = batch.dropDuplicates([id_col]).join(
            sess.table(table).select(
                F.col("neighbor_id").alias(id_col)
            ).distinct(),
            id_col,
            "left_anti",
        )
        n = fresh.count()
        if not n:
            return
        append_ivfpq_index(
            fresh,
            table,
            centroids,
            codebooks,
            id_col=id_col,
            emb_col=emb_col,
            dim=dim,
            n_assign=n_assign,
        )
        if log_dir:
            path = os.path.join(log_dir, f"batch-{batch_id:06d}.json")
            tmp = f"{path}.tmp"
            with open(tmp, "w") as f:
                json.dump({"batch_id": batch_id, "appended_vectors": n}, f)
            os.replace(tmp, path)

    writer = stream.writeStream.foreachBatch(_gate).option(
        "checkpointLocation", checkpoint or f"/tmp/{table}_append_checkpoint"
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
