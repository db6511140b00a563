"""Benchmark decontamination — flag training documents that overlap an
evaluation/benchmark set (no reference twin; part of the LLM-pipeline
extension surface alongside ml/dedup, ml/text, ml/splits).

Standard practice before training: any document sharing word n-grams with
a held-out benchmark is contaminated and must be dropped or cleaned,
otherwise eval scores measure memorization. The classic recipe is exact
n-gram collision (n ≈ 8-13 words for real corpora) — which is a join, not
a model: shingle both sides, intersect, count per document.

Scale shape (the part that matters at 100 TB): the benchmark side is
always tiny relative to the corpus (benchmark suites are MBs), so its
distinct shingle set BROADCASTS and the corpus is never shuffled by the
join — hits are marked map-side during the same pass that explodes the
corpus shingles, and the only shuffle is the per-doc aggregate on doc_id.
Corpus scan cost: one explode + one hash aggregate, independent of
benchmark count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mempool_dumpster_spark.ml.dedup import shingles


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per corpus document: distinct word n-gram count, how many of those
    n-grams appear anywhere in `benchmark`, and a 0/1 `contaminated` flag
    (any collision). Documents shorter than n words have 0 shingles and
    are never contaminated."""
    b_sh = (
        benchmark.select(F.explode(shingles(text_col, n)).alias("shingle"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # array_distinct dedups shingles WITHIN the row before the explode, so
    # (doc, shingle) pairs are already distinct and the per-doc aggregate
    # is a plain map-side-combined count — not countDistinct, whose
    # expand doubles the exploded rows and forces a second distinct
    # shuffle for the same answer
    marked = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("shingle"),
    ).join(F.broadcast(b_sh), "shingle", "left")
    per_doc = marked.groupBy(id_col).agg(
        F.count("*").alias("n_shingles"),
        F.count(F.when(F.col("__hit") == 1, 1)).alias("n_hits"),
    )
    # left join back so even shingle-less (< n words) docs get a row
    base = corpus.select(id_col).distinct()
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).cast("bigint").alias("contaminated"),
        )
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The benchmark-side inversion of `contamination`: per benchmark item,
    how much of it leaked into the corpus. One row per benchmark doc with
    its distinct n-gram count, how many of those n-grams appear anywhere
    in the corpus (`n_leaked`, with `leak_frac` = n_leaked/n_grams), and
    the total number of (corpus doc, n-gram) incidences touching it —
    the report an eval owner reads to decide whether a benchmark is
    burned, vs `contamination`'s per-corpus-doc drop list.

    Scale shape: the benchmark gram set broadcasts TWICE — first as a
    map-side semi-filter on the exploded corpus grams (so the per-gram
    corpus aggregate shuffles only grams the benchmark contains, a
    benchmark-bounded volume, never the corpus vocabulary), then to pin
    per-gram hit counts back onto benchmark docs. The corpus is read once
    and never shuffled on its own keys.
    """
    b_grams = benchmark.select(
        F.col(id_col).alias("bench_id"),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("shingle"),
    )
    b_gram_set = b_grams.select("shingle").distinct()
    per_gram = (
        corpus.select(
            F.col(id_col),
            F.explode(F.array_distinct(shingles(text_col, n))).alias("shingle"),
        )
        .join(F.broadcast(b_gram_set), "shingle")
        .groupBy("shingle")
        .agg(F.count("*").alias("n_corpus_docs"))
    )
    per_item = (
        b_grams.join(F.broadcast(per_gram), "shingle", "left")
        .groupBy("bench_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("n_corpus_docs").alias("n_leaked"),
            F.sum(F.coalesce("n_corpus_docs", F.lit(0))).alias("n_corpus_hits"),
        )
    )
    base = benchmark.select(F.col(id_col).alias("bench_id")).distinct()
    return base.join(per_item, "bench_id", "left").select(
        "bench_id",
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("n_leaked", F.lit(0)).alias("n_leaked"),
        F.when(
            F.coalesce("n_grams", F.lit(0)) > 0,
            F.coalesce("n_leaked", F.lit(0)).cast("double") / F.col("n_grams"),
        )
        .otherwise(F.lit(0.0))
        .alias("leak_frac"),
        F.coalesce("n_corpus_hits", F.lit(0)).alias("n_corpus_hits"),
    )
