"""Schema-enforced readers S1-S7 with the F1 validity filters and reject
accounting (SURVEY.md §2.1, §2.3).

The reference reads CSVs line-by-line and silently skips malformed rows
(common/txsfile.go:96-111, common/sourcelog.go:22-48). Spark restatement:
read every field as string (so no row is lost to a cast error), then split
into a valid stream (typed) and a rejects stream via explicit predicates —
rejects stay countable, matching the reference's stat logs, without a second
scan (both branches come off one cached read when the caller asks for both).

All readers take multi-path lists (U1 multi-file union is built into
``spark.read.csv([paths])``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mempool_dumpster_spark.functions.scalars import is_valid_hash


@dataclass
class ReadResult:
    valid: DataFrame
    rejects: DataFrame
    #: a reader-owned cached frame backing both sides (the JSONL source's
    #: corrupt-record split), surfaced so callers can release executor
    #: memory once valid/rejects are materialized; None for readers that
    #: don't cache
    cached: DataFrame | None = None

    def reject_count(self) -> int:
        return self.rejects.count()

    def unpersist(self) -> None:
        """Release the reader-owned cache (no-op when there isn't one).
        Call after materializing/persisting valid and rejects — their
        plans re-read the source afterwards."""
        if self.cached is not None:
            self.cached.unpersist()


def _string_schema(names: list[str]) -> T.StructType:
    return T.StructType([T.StructField(n, T.StringType(), True) for n in names])


_INT_RE = r"^[0-9]+$"

#: the F1 validity predicate as ONE parsed expression (r17, guide §5:
#: construction is per-submission driver cost — the Column-call form was
#: ~10 py4j round trips per reader; the parsed tree is identical to
#: `rlike & is_valid_hash(lower(hash)) & <col> IS NOT NULL`)
_OK_SQL = (
    "timestamp_ms RLIKE '^[0-9]+$' AND length(lower(hash)) = 66 "
    "AND lower(hash) RLIKE '^0x[0-9a-f]{{64}}$' AND {extra} IS NOT NULL"
)


def _split_valid(raw: DataFrame, extra_col: str, valid_exprs: list[str]) -> ReadResult:
    ok_sql = _OK_SQL.format(extra=extra_col)
    valid = raw.filter(F.expr(ok_sql)).selectExpr(*valid_exprs)
    rejects = raw.filter(F.expr(f"NOT ({ok_sql}) OR ({ok_sql}) IS NULL"))
    return ReadResult(valid=valid, rejects=rejects)


def read_tx_csv(spark: SparkSession, paths: list[str] | str) -> ReadResult:
    """S1: collector transactions CSV `timestamp_ms,hash,raw_tx` (headerless).

    Validity (reference common/txsfile.go:96-111): 3 fields, integer
    timestamp, well-formed 66-char hash; raw_tx present. The reference's
    "line shorter than 66 chars" guard is subsumed by the hash check.
    """
    raw = spark.read.schema(_string_schema(["timestamp_ms", "hash", "raw_tx"])).csv(
        paths if isinstance(paths, list) else [paths]
    )
    return _split_valid(
        raw,
        "raw_tx",
        [
            "CAST(timestamp_ms AS LONG) AS timestamp_ms",
            "lower(hash) AS hash",
            "raw_tx",
        ],
    )


def read_sourcelog_csv(spark: SparkSession, paths: list[str] | str) -> ReadResult:
    """S4: sourcelog CSV `timestamp_ms,hash,source` with hash lowercasing and
    validity rules (reference common/sourcelog.go:12-48)."""
    raw = spark.read.schema(_string_schema(["timestamp_ms", "hash", "source"])).csv(
        paths if isinstance(paths, list) else [paths]
    )
    return _split_valid(
        raw,
        "source",
        [
            "CAST(timestamp_ms AS LONG) AS timestamp_ms",
            "lower(hash) AS hash",
            "source",
        ],
    )


def read_trash_csv(spark: SparkSession, paths: list[str] | str) -> ReadResult:
    """S5: trash CSV `timestamp_ms,hash,source,reason,notes`; 4-field rows are
    legal (notes empty — reference common/trashfile.go:44-46)."""
    raw = spark.read.schema(
        _string_schema(["timestamp_ms", "hash", "source", "reason", "notes"])
    ).csv(paths if isinstance(paths, list) else [paths])
    ok = F.col("timestamp_ms").rlike(_INT_RE) & is_valid_hash(F.lower("hash"))
    valid = raw.filter(ok).select(
        F.col("timestamp_ms").cast("long").alias("timestamp_ms"),
        F.lower("hash").alias("hash"),
        "source",
        "reason",
        F.coalesce("notes", F.lit("")).alias("notes"),
    )
    return ReadResult(valid=valid, rejects=raw.filter(~ok | ok.isNull()))


def read_blacklist_csv(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """S6: known-hash blacklist — any CSV whose SECOND column is a tx hash;
    rows with <2 fields or short hashes are skipped (reference
    common/txsfile.go:212-239). Returns a single-column `hash` DataFrame.
    """
    raw = spark.read.schema(_string_schema(["c0", "hash"])).csv(
        paths if isinstance(paths, list) else [paths]
    )
    return (
        raw.select(F.lower("hash").alias("hash"))
        .filter(is_valid_hash(F.col("hash")))
        .distinct()
    )


def read_transactions_parquet(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """S7: merged-output parquet scan (reference cmd/analyze/main.go:81-107).
    Schema comes from the parquet footer — column pruning means analyzer
    queries never touch the heavy rawTx column."""
    return spark.read.parquet(
        *(paths if isinstance(paths, list) else [paths])
    )


def read_documents_jsonl(
    spark: SparkSession,
    paths: list[str] | str,
    id_field: str = "doc_id",
    text_field: str = "text",
) -> ReadResult:
    """Documents-corpus JSONL source: one JSON object per line with at
    least an id and a text field (the interchange format LLM corpus
    pipelines exchange — Dolma/RedPajama/FineWeb all ship JSONL), plus a
    free-form `meta` map for everything else. Same validity contract as
    the CSV readers: `valid` carries well-formed rows, `rejects` the
    malformed lines (broken JSON, missing/null id or text) so reject
    counts are reportable, never silently dropped.

    Scale notes: Spark splits uncompressed JSONL by line ranges, so the
    scan parallelizes like CSV; PERMISSIVE mode routes corrupt lines to
    `_corrupt_record` without failing the job; columnNameOfCorruptRecord
    rows must be materialized from the raw schema (a Spark constraint:
    a query selecting ONLY the corrupt column over json is disallowed —
    hence the cached two-sided split here). The cache is CALLER-OWNED:
    it backs both returned frames for the session unless released —
    call `result.unpersist()` once valid/rejects are materialized."""
    schema = T.StructType(
        [
            T.StructField(id_field, T.StringType(), True),
            T.StructField(text_field, T.StringType(), True),
            T.StructField(
                "meta", T.MapType(T.StringType(), T.StringType()), True
            ),
            T.StructField("_corrupt_record", T.StringType(), True),
        ]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(paths if isinstance(paths, list) else [paths])
    ).cache()
    ok = (
        F.col("_corrupt_record").isNull()
        & F.col(id_field).isNotNull()
        & F.col(text_field).isNotNull()
    )
    valid = raw.filter(ok).select(
        F.col(id_field).alias("doc_id"),
        F.col(text_field).alias("text"),
        F.col("meta"),
    )
    return ReadResult(
        valid=valid, rejects=raw.filter(~ok | ok.isNull()), cached=raw
    )
