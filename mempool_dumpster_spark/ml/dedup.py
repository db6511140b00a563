"""Corpus deduplication operators for 100 TB training-data pipelines.

All pure DataFrame algebra — hashes are md5-derived (JVM-side, codegen'd),
no Python UDFs anywhere. The intended composition at scale:

    minhash_signatures ─▶ lsh_candidate_pairs ─▶ ngram_jaccard_pairs(candidates)
        (map-side agg)      (band-key equi-join)    (exact verify, candidates only)
        ─▶ duplicate_components ─▶ keep one doc per component

The LSH band join keeps shuffle ∝ docs × bands; the exact Jaccard verify
then touches only candidate pairs instead of docs². `ngram_jaccard_pairs`
without candidates is the small-data / oracle-checkable path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def words(text: Column | str = "text") -> Column:
    return F.split(F.col(text) if isinstance(text, str) else text, " ")


def shingles(text: Column | str = "text", k: int = 3) -> Column:
    """Word k-gram shingles (space-joined strings); empty when < k words."""
    w = words(text)
    n = F.size(w)
    idx = F.sequence(F.lit(1), n - (k - 1))
    mk = lambda i: F.concat_ws(
        " ", *[F.element_at(w, (i + off).cast("int")) for off in range(k)]
    )
    return F.when(n >= k, F.transform(idx, mk)).otherwise(
        F.array().cast("array<string>")
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash, keeping the smallest id per group.
    Hash computed map-side; one shuffle on the 128-bit digest."""
    return (
        df.withColumn("__h", F.md5(text_col))
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("__h").orderBy(id_col)),
        )
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


def shingle_sets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(id, shingle) distinct — the set representation used by minhash and
    exact Jaccard."""
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(shingles(text_col, k)).alias("shingle")
    ).distinct()


def minhash_signatures(
    sh: DataFrame, n_hashes: int = 16
) -> DataFrame:
    """MinHash signature per document from a (doc_id, shingle) set:
    h_i(s) = md5(i ':' s), min per i. One map-side-combined aggregate."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"m{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, bands: int = 4, rows_per_band: int = 4, min_shared_bands: int = 1
) -> DataFrame:
    """LSH banding: concat `rows_per_band` signature slots into a band key,
    self-join per band. Returns (doc_a, doc_b, n_shared_bands).

    Tuning: P(candidate) = 1-(1-j^r)^b for Jaccard j; r=4,b=4 targets
    j ≳ 0.7. The join groups by band key, so a degenerate corpus (all docs
    identical) is the worst case — cap band-bucket size upstream if needed.
    """
    band_cols = []
    for b in range(bands):
        slots = [f"m{b * rows_per_band + r}" for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("|", *slots).alias("key"))
        )
    # cache: the self-join would otherwise evaluate the signature lineage
    # twice (aliased sides don't share exchanges); band rows are tiny
    # (docs × bands), so this is always worth it.
    bands_df = (
        sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bk"))
        .select("doc_id", "bk.band", "bk.key")
        .cache()
    )
    a, b_ = bands_df.alias("a"), bands_df.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared_bands"))
        .filter(F.col("n_shared_bands") >= min_shared_bands)
    )


def ngram_jaccard_pairs(
    sh: DataFrame,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over shingle sets → (doc_a, doc_b, jaccard ≥ threshold).

    With `candidates` (doc_a, doc_b), intersections are computed ONLY for
    those pairs (semi-join pushdown) — the verify stage after LSH. Without,
    the all-pairs shingle self-join (quadratic in per-shingle doc frequency).
    """
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    if candidates is not None:
        inter = inter.join(
            candidates.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_semi"
        )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("n_inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_inter")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """SimHash fingerprint (tf-weighted word hashes, `bits` ≤ 64).

    Bit j comes from hex digit j//4 of md5(word); words vote ±1 per bit.
    Generated as `bits` integer aggregates — wide but fully codegen'd.
    """
    assert bits <= 64 and bits % 4 == 0
    w = df.select(F.col(id_col).alias("doc_id"), F.explode(words(text_col)).alias("word"))
    digest = F.md5("word")
    total = F.lit(0).cast("long")
    for j in range(bits):
        nib = F.conv(F.substring(digest, j // 4 + 1, 1), 16, 10).cast("int")
        bit = F.shiftright(nib, 3 - (j % 4)).bitwiseAND(F.lit(1))
        vote = F.sum(F.when(bit == 1, 1).otherwise(-1))
        # shiftleft so bit 63 lands in the sign bit instead of overflowing
        total = total + F.shiftleft((vote > 0).cast("long"), j)
    return w.groupBy("doc_id").agg(total.alias("simhash"))


def simhash_near_pairs(sig: DataFrame, max_hamming: int = 3, chunks: int = 4) -> DataFrame:
    """Near-dup pairs by SimHash within `max_hamming` bits.

    Pigeonhole banding: split the fingerprint into `chunks` bit-ranges; any
    pair within max_hamming ≤ chunks-1 shares at least one exact chunk, so
    candidates come from equality joins on chunk values (shuffle ∝ docs ×
    chunks, never docs²), then exact Hamming verify via bit_count(xor).
    """
    width = 64 // chunks
    chunk_cols = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftrightunsigned("simhash", c * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("key"),
        )
        for c in range(chunks)
    ]
    parts = sig.select(
        "doc_id", F.col("simhash"), F.explode(F.array(*chunk_cols)).alias("ck")
    ).select("doc_id", "simhash", "ck.chunk", "ck.key")
    a, b = parts.alias("a"), parts.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "doc_a", "doc_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def duplicate_components(pairs: DataFrame, iterations: int = 10) -> DataFrame:
    """Connected components over duplicate pairs → (doc_id, component_id),
    component_id = min doc id reachable. Iterative label propagation (small-
    star style): each round joins labels across edges and takes the min;
    O(log n) rounds for typical near-dup clusters (chains are rare).
    """
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .distinct()
    )
    labels = edges.select(F.col("u").alias("doc_id")).distinct().withColumn(
        "component_id", F.col("doc_id")
    )
    for _ in range(iterations):
        neighbor_min = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy(F.col("u").alias("doc_id"))
            .agg(F.min("component_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    "component_id", F.coalesce("nbr_min", "component_id")
                ).alias("component_id"),
            )
        )
        if (
            new_labels.join(
                labels.withColumnRenamed("component_id", "old"), "doc_id"
            )
            .filter(F.col("component_id") != F.col("old"))
            .isEmpty()
        ):
            labels = new_labels
            break
        labels = new_labels
    return labels
