"""Training-data SELECTION operators — deciding *which* documents and
vectors feed the model once dedup/quality filters have run (no reference
twin; part of the LLM-pipeline extension surface alongside ml/dedup,
ml/decontam, ml/splits).

Four selection modalities, each with a deterministic, oracle-checkable
formulation (plus the DSIR artifact lifecycle:
`dsir_bucket_stats` → `dsir_stats_to/from_json` → `dsir_apply` for
train-once/serve-many, and `temperature_weights` for the
temperature-scaled multi-source mixing quota):

- `dsir_importance` — Data Selection via Importance Resampling (Xie et
  al. 2023, "Data Selection for Language Models via Importance
  Resampling"): score every raw document by how much its hashed n-gram
  feature mass looks like a small high-quality TARGET distribution, then
  keep the top of the ranking. The published recipe scores docs by a
  bigram log-likelihood ratio between two hashed-feature LMs; logs over
  doubles drift in the last ulps across engines, so this implementation
  keeps the same ordering signal as exact integer mass ratios (see
  `dsir_importance` docstring) — one IEEE division per document.

- `semantic_contamination` — embedding-space benchmark decontamination:
  the cosine twin of ml/decontam's n-gram contamination. N-gram overlap
  misses paraphrased benchmark leakage; max-cosine against the benchmark
  set catches it (the recipe used for GSM8K/MATH paraphrase sweeps).

- `cluster_coreset` — cluster-balanced coreset sampling: per cluster,
  keep the m vectors closest to the cluster centroid. Balanced sampling
  across clusters is the standard guard against majority-cluster
  domination when subsampling an embedded corpus for curation.

- `temperature_weights` — per-group sampling weights ∝ n^α (temperature
  sampling as in mT5; UniMax refines it with per-group caps), turning
  raw group counts into mixing quotas without drowning small sources.

Scale shapes (the part that matters at 100 TB):

- DSIR's bucket-count table is bounded by `n_buckets` (default 4096)
  regardless of corpus size — it BROADCASTS, the corpus is never
  shuffled by the stats join, and the only corpus-keyed shuffle is the
  per-doc aggregate. Train-once/apply-many: the bucket table is the
  persistable artifact.
- Semantic decontamination broadcasts the benchmark side (benchmark
  suites are MBs); the corpus side is one map-side scan + per-id max.
- The coreset's centroid table is n_clusters × dim values — broadcast;
  distances are computed in the same pass that scans the vectors, and
  the per-cluster top-m is one window over a cluster-keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mempool_dumpster_spark.ml.dedup import shingles


def _bucket(col: Column, n_buckets: int) -> Column:
    """Deterministic engine-portable feature bucket in [0, n_buckets):
    first 6 hex chars of md5 as an integer, mod n_buckets — the same
    md5-prefix trick as ml.splits.split_bucket, sized so any practical
    bucket count (DSIR's paper uses 10^4) divides evenly."""
    h = F.conv(F.substring(F.md5(col), 1, 6), 16, 10)
    return (h.cast("bigint") % n_buckets).alias("bucket")


def dsir_importance(
    corpus: DataFrame,
    target_pred: Column,
    n: int = 2,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document DSIR importance score against a target distribution.

    `target_pred` is a boolean Column selecting the target (high-quality
    proxy) subset of `corpus` — DSIR fits the target feature distribution
    from it and the raw distribution from the whole corpus.

    Features are hashed word n-gram INSTANCES (n=2 per the paper),
    bucketed by md5 prefix mod `n_buckets`. The importance score is

        importance = t_mass / r_mass

    where t_mass = Σ over the doc's gram instances of the TARGET count of
    that gram's bucket, and r_mass = the same sum over RAW counts. Both
    masses are exact BIGINTs (r_mass ≥ n_grams ≥ 1 since the doc's own
    instances are in the raw counts), so the one IEEE division yields
    bit-identical doubles in every engine — same ranking signal as the
    paper's log-ratio (monotone in the per-bucket target/raw rate), none
    of the cross-engine log drift.

    Plan: the bucket-stats aggregate scans the gram stream once
    (map-side-combined down to ≤ n_buckets rows, BROADCAST back); the
    scoring side re-derives the gram stream in a second corpus scan —
    the canonical train/apply split. At corpus scale, train once with
    `dsir_bucket_stats`, persist the artifact, and `dsir_apply` is a
    single scan per serving corpus. The per-doc fold is the only
    corpus-keyed shuffle either way. Docs with < n words have no grams
    and are omitted (they carry no feature evidence — rank them by a
    length filter instead).
    """
    grams = corpus.select(
        F.col(id_col),
        target_pred.alias("__is_t"),
        F.explode(shingles(text_col, n)).alias("gram"),
    ).select(id_col, "__is_t", _bucket(F.col("gram"), n_buckets))
    stats = grams.groupBy("bucket").agg(
        F.count("*").alias("__c_r"),
        F.count(F.when(F.col("__is_t"), 1)).alias("__c_t"),
    )
    return _score_against_stats(grams, stats, id_col)


def _score_against_stats(
    grams: DataFrame, stats: DataFrame, id_col: str
) -> DataFrame:
    """Shared apply step: fold broadcast (bucket, __c_r, __c_t) stats over
    a (id, bucket) gram-instance frame into per-doc masses + importance.
    Buckets absent from the stats table (possible only in pretrained
    apply, never in-corpus training where every instance counts itself)
    contribute zero mass; importance is 0.0 when no known raw mass."""
    per_doc = (
        grams.join(F.broadcast(stats), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce("__c_t", F.lit(0))).alias("t_mass"),
            F.sum(F.coalesce("__c_r", F.lit(0))).alias("r_mass"),
        )
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "t_mass",
        "r_mass",
        F.when(
            F.col("r_mass") > 0,
            F.col("t_mass").cast("double") / F.col("r_mass").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("importance"),
    )


def dsir_bucket_stats(
    corpus: DataFrame,
    target_pred: Column,
    n: int = 2,
    n_buckets: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """Train the DSIR artifact alone: (bucket, __c_r, __c_t) — raw and
    target gram-instance counts per hashed bucket, ≤ n_buckets rows.
    This is the persistable train-once half (`dsir_stats_to_json`);
    `dsir_apply` scores any later corpus against it without re-reading
    the training corpus — the same artifact contract as the PQ/IVF
    codebook lifecycle (ml.similarity)."""
    return (
        corpus.select(
            target_pred.alias("__is_t"),
            F.explode(shingles(text_col, n)).alias("gram"),
        )
        .select("__is_t", _bucket(F.col("gram"), n_buckets))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("__c_r"),
            F.count(F.when(F.col("__is_t"), 1)).alias("__c_t"),
        )
    )


def dsir_stats_to_json(stats: DataFrame, n: int, n_buckets: int) -> str:
    """Serialize a `dsir_bucket_stats` frame. Counts are exact integers,
    so the round-trip is trivially bit-for-bit; n and n_buckets ride
    along because scores are meaningless against a differently-hashed
    or differently-shingled gram stream."""
    import json

    rows = {int(r["bucket"]): [int(r["__c_r"]), int(r["__c_t"])] for r in stats.collect()}
    return json.dumps(
        {
            "format": "dsir-stats-v1",
            "n": n,
            "n_buckets": n_buckets,
            "buckets": {str(k): v for k, v in sorted(rows.items())},
        }
    )


def dsir_stats_from_json(spark, payload: str) -> tuple[DataFrame, int, int]:
    """Deserialize back to (stats frame, n, n_buckets)."""
    import json

    obj = json.loads(payload)
    if obj.get("format") != "dsir-stats-v1":
        raise ValueError(f"not a DSIR stats payload: {obj.get('format')!r}")
    rows = [
        (int(b), int(cr), int(ct)) for b, (cr, ct) in obj["buckets"].items()
    ]
    df = spark.createDataFrame(rows, "bucket bigint, __c_r bigint, __c_t bigint")
    return df, int(obj["n"]), int(obj["n_buckets"])


def dsir_apply(
    corpus: DataFrame,
    stats: DataFrame | tuple,
    n: int = 2,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score a NEW corpus against a pretrained DSIR stats artifact —
    the serve-many half. Same output schema as `dsir_importance`; grams
    hashing into buckets the artifact never saw contribute zero mass
    (importance 0.0 when nothing matches). One corpus scan + the ≤
    n_buckets-row broadcast; the training corpus is never re-read.

    Pass `stats` as the (frame, n, n_buckets) triple that
    `dsir_stats_from_json` returns and the artifact's OWN shingle width
    and bucket count are used — a caller-supplied n/n_buckets that
    contradicts the triple is a hard ValueError. A mismatch is never a
    soft error: every gram still hashes into some bucket the artifact
    populated, so the scores come back confidently WRONG, not zero."""
    if isinstance(stats, tuple):
        stats, art_n, art_buckets = stats
        for label, given, stored, default in (
            ("n", n, art_n, 2),
            ("n_buckets", n_buckets, art_buckets, 4096),
        ):
            if given != stored and given != default:
                raise ValueError(
                    f"{label}={given} contradicts the stats artifact "
                    f"({label}={stored}); drop the argument"
                )
        n, n_buckets = art_n, art_buckets
    grams = corpus.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("gram")
    ).select(id_col, _bucket(F.col("gram"), n_buckets))
    return _score_against_stats(grams, stats, id_col)


def dsir_top_k(
    corpus: DataFrame,
    target_pred: Column,
    k: int,
    n: int = 2,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k selection by DSIR importance (importance desc, id asc —
    fully deterministic). The global top-k is a rank over an unpartitioned
    window; at corpus scale swap in a per-partition top-k + merge
    (`F.row_number` after `repartitionByRange` on the score) — the score
    artifact itself is what `dsir_importance` hands to the pipeline."""
    scored = dsir_importance(
        corpus, target_pred, n=n, n_buckets=n_buckets, id_col=id_col, text_col=text_col
    )
    w = Window.orderBy(F.col("importance").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def _dot(u, v) -> Column:
    # emb_knn's exact left-fold — index-order summation, identical in any
    # engine that folds lists sequentially
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per corpus vector: max cosine similarity (rounded to 4 decimals
    for cross-engine determinism, as everywhere in this package) against
    any benchmark vector, plus a 0/1 `contaminated` flag at `threshold`.

    The benchmark side is broadcast — the corpus is scanned once, scored
    map-side against every benchmark vector, and reduced by a per-id max
    (identical doubles → order-independent). This is the embedding twin
    of ml.decontam.contamination and shares its scale contract: cost is
    one corpus scan × |benchmark|, no corpus shuffle before the max."""
    prep = lambda df, idc, ec, nc: df.select(
        F.col(id_col).alias(idc),
        F.transform(vec_col, lambda x: x.cast("double")).alias(ec),
    ).withColumn(nc, F.sqrt(_dot(F.col(ec), F.col(ec))))
    c = prep(corpus, "vec_id", "c_emb", "c_nrm")
    b = prep(benchmark, "bench_id", "b_emb", "b_nrm")
    # zero-norm guard: a zero vector has no direction — define its cosine
    # as 0 (never contaminated / never contaminating) instead of letting
    # the division produce NULL, which would poison F.max into NULL and
    # make the row invisible to BOTH `contaminated == 1` and `== 0`
    # filters (and diverge from engines that apply IEEE inf/nan division)
    denom = F.col("c_nrm") * F.col("b_nrm")
    sims = c.crossJoin(F.broadcast(b)).select(
        "vec_id",
        F.when(
            denom > 0,
            F.round(_dot(F.col("c_emb"), F.col("b_emb")) / denom, 4),
        )
        .otherwise(F.lit(0.0))
        .alias("sim_r"),
    )
    # An EMPTY benchmark must yield every corpus row with contaminated=0,
    # not an empty frame — a caller keeping clean rows via
    # contaminated == 0 would otherwise drop the whole corpus the day a
    # benchmark filter matches nothing. The benchmark side is tiny by
    # contract (it broadcasts), so the driver-side emptiness probe is
    # O(1) and the corpus-scale plan stays untouched on the normal path.
    if b.isEmpty():
        return corpus.select(
            F.col(id_col).alias("vec_id"),
            F.lit(0.0).alias("max_sim_r"),
            F.lit(0).cast("bigint").alias("contaminated"),
        )
    return sims.groupBy("vec_id").agg(
        F.max("sim_r").alias("max_sim_r"),
        (F.max("sim_r") >= threshold).cast("bigint").alias("contaminated"),
    )


def cluster_coreset(
    vectors: DataFrame,
    m: int,
    dim: int,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-balanced coreset: per cluster, the m vectors closest to
    the cluster centroid (euclidean, rounded to 4 decimals, tiebreak id).

    Centroids are the per-cluster componentwise means, computed with the
    package's DECIMAL-exact summation idiom (cast each component to
    DECIMAL(20,10), sum exactly — order-independent — then one double
    division per component), so Spark's parallel partial aggregation and
    any oracle engine agree bit-for-bit. The squared deviations are cast
    to DECIMAL(24,10) before the per-vector sum for the same reason: the
    64-term distance fold must not depend on join row order.

    Plan: the dim-explode (posexplode) feeds one map-side-combined
    centroid aggregate bounded by n_clusters × dim rows — BROADCAST back
    onto the same exploded frame; the per-vector distance sum is the one
    corpus-keyed shuffle, and the per-cluster top-m is a window over the
    (tiny) cluster key. Any clustering can feed `cluster_col` — the
    registered query uses the corpus labels; ml.similarity's k-means
    assignment plugs in unchanged."""
    # dim is a validation contract, not a hint: a ragged or wrong-width
    # row would silently smear the posexplode index space (and desync any
    # fixed-width oracle), so it fails the job loudly instead
    checked = F.when(
        F.size(vec_col) == dim,
        F.transform(vec_col, lambda x: x.cast("double")),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"cluster_coreset: expected {dim}-wide embeddings, got "),
                F.size(vec_col).cast("string"),
            )
        )
    )
    dims = vectors.select(
        F.col(cluster_col).alias("cluster"),
        F.col(id_col).alias("vec_id"),
        F.posexplode(checked).alias("i", "x"),
    )
    cent = dims.groupBy("cluster", "i").agg(
        (
            F.sum(F.col("x").cast("decimal(20,10)")).cast("double") / F.count("*")
        ).alias("c")
    )
    sq = (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
    dist = (
        dims.join(F.broadcast(cent), ["cluster", "i"])
        .groupBy("cluster", "vec_id")
        .agg(
            F.round(
                F.sqrt(F.sum(sq.cast("decimal(24,10)")).cast("double")), 4
            ).alias("dist_r")
        )
    )
    w = Window.partitionBy("cluster").orderBy(F.col("dist_r"), F.col("vec_id"))
    return (
        dist.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= m)
        .select("cluster", "vec_id", "dist_r", "rank")
    )


def temperature_weights(
    docs: DataFrame,
    alpha: float = 0.5,
    budget: int = 1_000_000,
    group_col: str = "source",
) -> DataFrame:
    """Temperature-scaled sampling weights per group — the multilingual /
    multi-source mixing primitive (temperature sampling as in mT5;
    UniMax is the budget-capped refinement): weight_i ∝ n_i^alpha, so
    alpha=1 reproduces natural proportions, alpha→0 approaches uniform,
    and 0<alpha<1 up-samples small groups without letting giants drown
    them. Emits per group: n_docs, the normalized weight, and the
    floor-rounded document quota out of `budget`.

    Cross-engine determinism: n^alpha is one libm double per group
    (identical everywhere for identical n), but a FLOAT normalizer
    Σ w_i would be summation-order-dependent — so each weight is
    rounded to 6 decimals and cast to DECIMAL(24,6) first, making the
    total an exact, order-independent sum; the final division and
    floor then see bit-identical inputs in every engine. One
    |groups|-row aggregate + a broadcast of the 1-row total — group
    cardinality, not corpus size, bounds everything after the first
    map-side-combined count."""
    counts = docs.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    w = F.round(F.pow(F.col("n_docs").cast("double"), F.lit(alpha)), 6).cast(
        "decimal(24,6)"
    )
    weighted = counts.withColumn("__w", w)
    total = weighted.agg(F.sum("__w").alias("__t"))
    ratio = F.col("__w").cast("double") / F.col("__t").cast("double")
    return (
        weighted.crossJoin(F.broadcast(total))
        .select(
            group_col,
            "n_docs",
            F.round(ratio, 6).alias("weight_r"),
            F.floor(F.lit(budget) * ratio).cast("bigint").alias("quota"),
        )
    )


# ---------------------------------------------------------------------------
# Supervised token-vote classifier (NB-style model-based filtering)
# ---------------------------------------------------------------------------


def nb_train(
    train_docs: DataFrame,
    label: Column,
    text_col: str = "text",
) -> tuple[DataFrame, dict[str, int]]:
    """Train the token statistics of a naive-Bayes-style text classifier —
    the model-based filtering stage of a curation pipeline (fastText-style
    quality/language classifiers in CCNet and FineWeb-Edu play this role;
    the heuristic signals in ml/text are its unsupervised cousins).

    Returns (stats, totals): `stats` is the persistable model artifact —
    one row per training token, (token, c_pos BIGINT, c_neg BIGINT)
    instance counts per class — and `totals` carries the three scalars the
    decision rule needs: n_pos / n_neg (total token instances per class)
    and vocab (distinct training tokens). The artifact is vocabulary-
    bounded, not corpus-bounded: persist it as a table and score any
    future corpus without re-reading the training set (same train-once/
    serve-many shape as the DSIR bucket stats and the PQ codebooks).

    All counts are exact BIGINTs — no probabilities are materialized at
    train time, so there is nothing here that can drift across engines.

    Null policy: rows whose `label` casts to NULL are EXCLUDED from
    training (they are unlabeled, not negative — silently routing them
    to c_neg was an API trap). Callers wanting a different policy cast
    explicitly, e.g. coalesce(label, false)."""
    toks = train_docs.select(
        label.cast("boolean").alias("__pos"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).filter(F.col("__pos").isNotNull())
    stats = toks.groupBy("token").agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0))
        .cast("bigint")
        .alias("c_pos"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1))
        .cast("bigint")
        .alias("c_neg"),
    )
    row = stats.agg(
        F.sum("c_pos").cast("bigint").alias("n_pos"),
        F.sum("c_neg").cast("bigint").alias("n_neg"),
        F.count("*").cast("bigint").alias("vocab"),
    ).collect()[0]
    totals = {
        "n_pos": int(row["n_pos"] or 0),
        "n_neg": int(row["n_neg"] or 0),
        "vocab": int(row["vocab"] or 0),
    }
    return stats, totals


def nb_predict(
    docs: DataFrame,
    stats: DataFrame,
    totals: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents against a trained token-stats artifact →
    (doc_id, n_tok, pos_votes, predicted).

    Decision rule — token-level likelihood votes pooled by count: token t
    votes POSITIVE iff its add-1-smoothed class-conditional probability is
    higher under the positive class,

        (c_pos(t)+1) / (n_pos+V)  >  (c_neg(t)+1) / (n_neg+V),

    evaluated as the exact BIGINT cross-multiplication
    (c_pos+1)·(n_neg+V) > (c_neg+1)·(n_pos+V) — each side is bounded by
    corpus_tokens², far inside int64 for any corpus whose token count
    fits in int32, and DuckDB evaluates the same products exactly. The
    document is predicted positive iff a strict majority of its token
    INSTANCES vote positive (2·pos_votes > n_tok; ties go negative).

    This pools the same per-token decision boundary as multinomial NB by
    COUNT rather than by probability product — the package's standing
    log-free discipline (see docs_ngram_lm_score, dsir_importance): a
    log-prob sum would drift in the last ulps across engines and break
    hash equality, while votes are integers and the artifact row for an
    unseen token is simply absent (both classes smooth to 1, so the vote
    falls to the class with fewer training tokens — deterministic).

    Plan shape: the stats artifact is vocabulary-bounded → broadcast
    left-join onto one token explode of the scoring corpus, then one
    per-doc aggregate. The corpus is scanned once and shuffled once."""
    n_pos, n_neg, vocab = (
        totals["n_pos"],
        totals["n_neg"],
        totals["vocab"],
    )
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    joined = toks.join(F.broadcast(stats), "token", "left").select(
        id_col,
        F.coalesce(F.col("c_pos"), F.lit(0)).alias("c_pos"),
        F.coalesce(F.col("c_neg"), F.lit(0)).alias("c_neg"),
    )
    vote = (
        (F.col("c_pos") + 1) * F.lit(n_neg + vocab)
        > (F.col("c_neg") + 1) * F.lit(n_pos + vocab)
    ).cast("bigint")
    per_doc = joined.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_tok"),
        F.sum(vote).cast("bigint").alias("pos_votes"),
    )
    return per_doc.withColumn(
        "predicted",
        (F.col("pos_votes") * 2 > F.col("n_tok")).cast("bigint"),
    )
