"""Text-analysis operators for corpus curation: token counting, quality
scoring, language identification, document fingerprinting. All JVM-side
Column algebra (no UDFs) so they ride whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mempool_dumpster_spark.ml.dedup import shingles, words

#: Minimal stopword profiles for the language-ID heuristic; extend per
#: deployment. Scores are tf ratios of profile hits.
DEFAULT_LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "la", "los", "y", "es", "una"],
}


def token_count(text: Column | str = "text") -> Column:
    """Whitespace tokenizer count. For a BPE-ish estimate use
    `subword_estimate` (≈ chars/4 heuristic used by LLM data pipelines)."""
    return F.size(words(text)).cast("bigint")


def subword_estimate(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.ceil(F.length(c) / 4).cast("bigint")


def stopword_hits(text_words: Column, profile: list[str]) -> Column:
    """Count of tokens that appear in `profile` (array_contains chain over a
    literal array — broadcastable, codegen'd)."""
    lit = F.array(*[F.lit(w) for w in profile])
    return F.size(F.filter(text_words, lambda w: F.array_contains(lit, w)))


def quality_features(
    df: DataFrame, text_col: str = "text", stopwords: list[str] | None = None
) -> DataFrame:
    """Length / word-shape / stopword-ratio features — the standard cheap
    quality filters of LLM corpus pipelines (drop too-short, too-repetitive,
    stopword-free docs)."""
    w = words(text_col)
    ntok = F.size(w).cast("bigint")
    text = F.col(text_col)
    profile = stopwords or DEFAULT_LANG_PROFILES["en"]
    return df.withColumns(
        {
            "n_chars": F.length(text).cast("bigint"),
            "n_tokens": ntok,
            "n_distinct_tokens": F.size(F.array_distinct(w)).cast("bigint"),
            "avg_word_len": (F.length(text) - ntok + 1).cast("double") / ntok,
            "stopword_ratio": stopword_hits(w, profile).cast("double") / ntok,
            "distinct_ratio": F.size(F.array_distinct(w)).cast("double") / ntok,
        }
    )


def quality_score(df: DataFrame) -> DataFrame:
    """Composite [0,1] score from `quality_features` columns: penalize
    ultra-short docs, low lexical diversity, and stopword-free text."""
    length_ok = F.least(F.col("n_tokens") / 20.0, F.lit(1.0))
    diversity = F.least(F.col("distinct_ratio") * 2, F.lit(1.0))
    stopword_ok = F.least(F.col("stopword_ratio") * 10, F.lit(1.0))
    return df.withColumn(
        "quality_score", (length_ok + diversity + stopword_ok) / 3.0
    )


def language_id(
    df: DataFrame,
    text_col: str = "text",
    profiles: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Stopword-profile language ID: score = profile-hit ratio per language,
    predicted = argmax (ties broken by language code for determinism).

    N-gram-free by design — profile hits are exact token matches, which a
    follow-up char-n-gram model can refine; at 100 TB this stays a single
    projection with no shuffle."""
    w = words(text_col)
    profs = profiles or DEFAULT_LANG_PROFILES
    ntok = F.size(w)
    scored = F.array(
        *[
            F.struct(
                (stopword_hits(w, p).cast("double") / ntok).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, p in sorted(profs.items())
        ]
    )
    best = F.array_max(scored)
    return df.withColumn("lang_scores", scored).withColumn(
        "predicted_lang",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def fingerprint_mink(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k_min: int = 5
) -> DataFrame:
    """Winnowing-style fingerprint: the k smallest shingle hashes per doc,
    joined to one string. Rolling-hash equivalent with md5 as the hash;
    map-side aggregable (array_sort + slice over collected mins)."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(text_col)).alias("shingle"),
    ).distinct()
    return (
        sh.select("doc_id", F.md5("shingle").alias("h"))
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "|", F.slice(F.array_sort(F.collect_set("h")), 1, k_min)
            ).alias("fingerprint")
        )
    )
