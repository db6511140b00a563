"""Driver-contract queries backed by the `ml` operator library (language ID,
quality scoring, exact-dedup keep-list, LSH ANN). Where DuckDB can express
the same semantics the oracle is exact; the LSH ANN entry is rows-only (its
result is approximate by construction, there is no SQL ground truth)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mempool_dumpster_spark.functions.views import drop_views, register_temp_view
from mempool_dumpster_spark.ml.dedup import duplicate_components, exact_dedup
from mempool_dumpster_spark.ml.similarity import ivf_topk, lsh_bucketed_topk
from mempool_dumpster_spark.ml.text import DEFAULT_LANG_PROFILES, language_id
from mempool_dumpster_spark.plans.registry import register
from mempool_dumpster_spark.plans.tables import load_tables

_PROFILE_SQL = {
    lang: "[" + ", ".join(f"'{w}'" for w in ws) + "]"
    for lang, ws in sorted(DEFAULT_LANG_PROFILES.items())
}

_SCORES = ", ".join(
    f"(CAST(len(list_filter(string_split(text, ' '), w -> list_contains({lst}, w))) AS DOUBLE)"
    f" / len(string_split(text, ' '))) AS s_{lang}"
    for lang, lst in _PROFILE_SQL.items()
)

_LANG_ROWS = " UNION ALL ".join(
    f"SELECT doc_id, s_{lang} AS score, '{lang}' AS lang FROM scored"
    for lang in _PROFILE_SQL
)


@register(
    "docs_langid",
    oracle=f"""
    WITH scored AS (SELECT doc_id, {_SCORES} FROM documents),
    ranked AS (
      SELECT doc_id, score, lang,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang DESC) AS rn
      FROM ({_LANG_ROWS})
    )
    SELECT doc_id,
           CASE WHEN score > 0 THEN lang ELSE 'und' END AS predicted_lang
    FROM ranked WHERE rn = 1
    """,
    doc="Language ID via stopword-profile scoring (ml.text.language_id): "
    "argmax of per-language hit ratios, ties broken by language code, 'und' "
    "when no profile hits. Pure projection — no shuffle at any scale.",
)
def docs_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return language_id(docs).select("doc_id", "predicted_lang")


# doc_id buckets for the deterministic PII augmentation below — the synthetic
# corpus is digit-free word salad, so the redaction oracle would otherwise be
# an all-zeros no-op. Both engines append the SAME derived strings (emails,
# phones, hex ids, IPv4s, plus numeric DECOYS that must NOT match), turning
# the cross-engine hash into a char-for-char regex-parity check with true
# positives and near-miss negatives.
_PII_AUG_SPARK = (
    "concat(text,"
    " CASE WHEN doc_id % 5 = 0 THEN concat(' contact user', doc_id,"
    "   '@example.com') ELSE '' END,"
    " CASE WHEN doc_id % 7 = 0 THEN concat(' call 555-123-', 1000 + doc_id % 9000)"
    "   ELSE '' END,"
    " CASE WHEN doc_id % 11 = 0 THEN concat(' from 10.0.', doc_id % 256,"
    "   '.1 tx 0x', md5(text)) ELSE '' END,"
    " ' in ', 2000 + doc_id % 30,"
    " CASE WHEN doc_id % 3 = 0 THEN ' paid 1 000 000.00' ELSE '' END)"
)
_PII_AUG_DUCK = """
      text
      || CASE WHEN doc_id % 5 = 0
              THEN ' contact user' || doc_id || '@example.com' ELSE '' END
      || CASE WHEN doc_id % 7 = 0
              THEN ' call 555-123-' || (1000 + doc_id % 9000) ELSE '' END
      || CASE WHEN doc_id % 11 = 0
              THEN ' from 10.0.' || (doc_id % 256) || '.1 tx 0x' || md5(text)
              ELSE '' END
      || ' in ' || (2000 + doc_id % 30)
      || CASE WHEN doc_id % 3 = 0 THEN ' paid 1 000 000.00' ELSE '' END
"""


def _pii_oracle() -> str:
    """Build the staged DuckDB twin of ml.text.redact_pii from the live
    PII_PATTERNS dict, so pattern text and application ORDER can never
    drift between the Spark path and the oracle (the patterns are written
    RE2-compatible for exactly this reason — ml/text.py)."""
    from mempool_dumpster_spark.ml.text import PII_PATTERNS

    inner = f"SELECT doc_id, {_PII_AUG_DUCK} AS t FROM documents"
    count_cols: list[str] = []
    for kind, pat in PII_PATTERNS.items():
        lit = pat.replace("'", "''")
        carried = ", ".join(count_cols)
        carried = carried + ", " if carried else ""
        inner = (
            f"SELECT doc_id, {carried}"
            f"CAST(len(regexp_extract_all(t, '{lit}')) AS BIGINT) AS n_{kind}, "
            f"regexp_replace(t, '{lit}', '[{kind.upper()}]', 'g') AS t "
            f"FROM ({inner})"
        )
        count_cols.append(f"n_{kind}")
    return (
        f"SELECT doc_id, {', '.join(count_cols)}, t AS text_redacted "
        f"FROM ({inner})"
    )


@register(
    "docs_redact_pii",
    oracle=_pii_oracle(),
    doc="Structural PII redaction (ml.text.redact_pii): emails, 0x-hex ids, "
    "IPv4s, and structural phone shapes replaced by [KIND] placeholders with "
    "per-kind counts, patterns applied sequentially so a hex id's digit run "
    "is never double-reported as a phone. The corpus is augmented with "
    "deterministic doc_id-derived PII strings AND numeric decoys (years, "
    "grouped amounts) in both engines, so the value hash proves regex "
    "semantic parity on matches and non-matches alike. One projection, "
    "zero shuffles, codegen'd JVM regex — scalar-map cost at 100 TB.",
)
def docs_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.text import redact_pii

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    aug = docs.select("doc_id", F.expr(_PII_AUG_SPARK).alias("text"))
    return redact_pii(aug).select(
        "doc_id", "n_email", "n_hex_id", "n_ipv4", "n_phone", "text_redacted"
    )


@register(
    "docs_pack_sequences",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                  % 8 AS BIGINT) AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    ordered AS (
      SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM toks
    ),
    pack(shard, rn, doc_id, n_tokens, seq_id, fill) AS (
      SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
             CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > 256
                  THEN p.seq_id + 1 ELSE p.seq_id END,
             CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > 256
                  THEN o.n_tokens ELSE p.fill + o.n_tokens END
      FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT doc_id, shard, n_tokens, seq_id,
           CAST(n_tokens > 256 AS BIGINT) AS oversize
    FROM pack
    """,
    doc="Exact greedy sequence packing (ml.packing.pack_sequences) through "
    "the scale-safe AUTO-SHARD default: documents bucket by md5(doc_id) mod "
    "8 (content-addressed, engine-portable), then first-fit-in-order pack "
    "to a 256-token budget per shard via one Arrow-batched applyInPandas "
    "pass per shard — parallelism = shard count, no single-group funnel. "
    "The greedy fold is genuinely stateful (a straddling doc resets the "
    "budget origin, which floor(cumsum/budget) gets wrong), so the DuckDB "
    "twin is a recursive CTE stepping row-by-row per shard — exact, not "
    "approximate, parity on every (shard, seq_id) assignment.",
)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.packing import pack_sequences
    from mempool_dumpster_spark.ml.text import token_count

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    toks = docs.select("doc_id", token_count("text").alias("n_tokens"))
    return pack_sequences(toks, 256, n_shards=8).select(
        "doc_id", "shard", "n_tokens", "seq_id", "oversize"
    )


@register(
    "docs_mix_corpus",
    oracle="""
    SELECT doc_id, source FROM documents
    WHERE ('0x' || substr(md5(coalesce(source, '') || ':'
                          || coalesce(CAST(doc_id AS VARCHAR), '')), 1, 8)
          )::UBIGINT % 10000
          < 10000 * CASE source WHEN 'src0' THEN 0.25
                                WHEN 'src1' THEN 0.5
                                ELSE 0.75 END
    """,
    doc="Deterministic corpus mixing (ml.packing.mix_corpus): keep a stable "
    "per-source fraction via a source-salted content-addressed md5 bucket — "
    "the kept subset is identical across runs, partition layouts, and "
    "engines (the oracle reproduces it bit-for-bit), unlike sample(). One "
    "codegen'd filter, zero shuffles.",
)
def docs_mix_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.packing import mix_corpus

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return mix_corpus(
        docs, rates={"src0": 0.25, "src1": 0.5}, default_rate=0.75
    ).select("doc_id", "source")


@register(
    "docs_dedup_keep",
    oracle="""
    SELECT source, CAST(count(*) AS BIGINT) AS n_kept
    FROM (
      SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    GROUP BY source
    """,
    doc="Exact dedup keep-list (ml.dedup.exact_dedup): smallest doc_id per "
    "content hash survives; counted per source.",
)
def docs_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return exact_dedup(docs).groupBy("source").agg(F.count("*").alias("n_kept"))


def _dup_components_cte() -> str:
    """WITH RECURSIVE prefix shared by the clustering oracles: LSH pairs →
    bidirectional edges → min-label transitive closure (`reach`)."""
    from mempool_dumpster_spark.plans.text_queries import DUCK_SHINGLES, _duck_minhash

    bands = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS band, m{i} AS key FROM sig" for i in range(8)
    )
    return f"""
    WITH RECURSIVE sh AS ({DUCK_SHINGLES}),
    sig AS ({_duck_minhash(8)}),
    bands AS ({bands}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    edges AS MATERIALIZED (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(doc_id, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.doc_id
    )"""


def _dup_components_oracle() -> str:
    return (
        _dup_components_cte()
        + "\n    SELECT doc_id, min(label) AS component_id FROM reach GROUP BY doc_id"
    )


@register(
    "docs_dup_components",
    oracle=_dup_components_oracle(),
    doc="Duplicate clustering: connected components over MinHash-LSH near-dup "
    "pairs (ml.dedup.duplicate_components) — component_id = min reachable "
    "doc_id. Iterative min-label propagation with per-round persist + "
    "materialized convergence counts (bounded lineage); the oracle is the "
    "transitive-closure fixpoint as a recursive CTE.",
)
def docs_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.plans.text_queries import docs_minhash_lsh_pairs

    pairs = docs_minhash_lsh_pairs(spark, sf_dir)
    return duplicate_components(pairs).select("doc_id", "component_id")


def _dedup_keeplist_oracle() -> str:
    return (
        _dup_components_cte()
        + """,
    comp AS (
      SELECT doc_id, min(label) AS component_id FROM reach GROUP BY doc_id
    )
    SELECT doc_id FROM comp WHERE doc_id = component_id
    UNION ALL
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM comp)
    """
    )


@register(
    "docs_dedup_keeplist",
    oracle=_dedup_keeplist_oracle(),
    doc="The full near-dup pipeline as one keep-list: MinHash-LSH candidate "
    "pairs → connected components → keep the min doc per cluster plus every "
    "untouched singleton. This is the composition a 100 TB corpus dedup "
    "actually runs (shingle → band join → cluster → anti-join), end-to-end "
    "oracle-checked.",
    # r16 slot rotation (r15 verdict #8): ceded its driver slot to
    # emb_bucket_sig_digest — every stage of this composition already
    # holds its own slot (docs_minhash_lsh_pairs, docs_dup_components,
    # docs_dedup_keep), so its artifact row carried the least marginal
    # signal; still oracle-checked every round via selfcheck.
    overflow=True,
)
def docs_dedup_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    from mempool_dumpster_spark.plans.text_queries import docs_minhash_lsh_pairs

    comp = duplicate_components(docs_minhash_lsh_pairs(spark, sf_dir))
    keep_cluster_heads = comp.filter(
        F.col("doc_id") == F.col("component_id")
    ).select("doc_id")
    singletons = docs.join(comp, "doc_id", "left_anti").select("doc_id")
    return keep_cluster_heads.unionByName(singletons)


#: Single source of truth for the PRODUCTION parameters of every ANN
#: rung — inline AND pretrained. Two recall bugs in two rounds (r13 PQ
#: refine collapse, r14 SQ8 refine=8 shortlist miss) both came from
#: shortlist-parameter drift between a registry entry and the params
#: the recall harness measured; the r14 dispatcher killed that for the
#: inline rungs, and r15 extends it to the serving path: each
#: `*_pretrained` key ALIASES its inline rung's dict (the same object,
#: not a copy), so the serve-side parameters cannot diverge from the
#: recall-gated ones even by a one-key edit. Parameter rationale lives
#: on each registry entry's docstring.
ANN_RUNG_PARAMS: dict[str, dict] = {
    "emb_knn_lsh": {"k": 3, "dim": 64, "n_planes": 3, "n_tables": 12},
    "emb_knn_pq": {
        "k": 3, "dim": 64, "m": 16, "k_codes": 32, "refine": 32,
        "n_iters": 5,
    },
    "emb_knn_sq8": {"k": 3, "dim": 64, "refine": 32},
    "emb_knn_bq": {"k": 3, "dim": 64, "refine": 32},
    "emb_knn_ivfpq": {
        "k": 3, "dim": 64, "n_cells": 16, "nprobe": 6, "n_assign": 4,
        "m": 16, "k_codes": 32, "refine": 32, "n_iters": 5,
    },
    "emb_knn_ivf": {
        "k": 3, "dim": 64, "n_cells": 16, "n_iters": 3, "nprobe": 8,
        "n_assign": 3,
    },
}
for _base in ("emb_knn_ivf", "emb_knn_ivfpq", "emb_knn_sq8", "emb_knn_bq"):
    ANN_RUNG_PARAMS[_base + "_pretrained"] = ANN_RUNG_PARAMS[_base]


def ann_rung_topk(name: str, emb: DataFrame, queries: DataFrame) -> DataFrame:
    """Dispatcher for the INLINE approximate ANN rungs, reading
    ANN_RUNG_PARAMS. The registry entries below and the 100×-scale
    recall harness (tools/ann_recall_100x.py) both dispatch through
    here, so the recall artifact measures exactly the parameters users
    run — a rung whose registry entry drifts from the recall
    measurement can't exist (r13 verdict finding #1 made the recall
    artifact the ladder's real guardrail; this keeps it honest)."""
    from mempool_dumpster_spark.ml.similarity import (
        bq_topk,
        ivfpq_topk,
        pq_topk,
        sq8_topk,
    )

    P = ANN_RUNG_PARAMS[name]
    calls = {
        "emb_knn_lsh": lambda: lsh_bucketed_topk(emb, queries, **P),
        "emb_knn_pq": lambda: pq_topk(emb, queries, **P),
        "emb_knn_sq8": lambda: sq8_topk(emb, queries, **P),
        "emb_knn_bq": lambda: bq_topk(emb, queries, **P),
        "emb_knn_ivfpq": lambda: ivfpq_topk(emb, queries, **P),
        "emb_knn_ivf": lambda: ivf_topk(emb, queries, **P),
    }
    return calls[name]().select(
        "query_id", "neighbor_id", F.round("sim", 4).alias("sim_r"), "rank"
    )


def ann_rung_topk_pretrained(
    name: str,
    spark: SparkSession,
    emb: DataFrame,
    queries: DataFrame,
    tbl_suffix: str,
) -> DataFrame:
    """Dispatcher for the PRETRAINED (train-once/serve-many) rungs:
    builds the persisted index artifact, round-trips the trained state
    through its JSON index format (what a deployment actually reloads
    on the serving cluster), and serves `queries` from it — all with
    parameters read from ANN_RUNG_PARAMS, which aliases each pretrained
    key to its inline rung's dict. The r14 SQ8 refine fix had to be
    HAND-COPIED into sq8_pretrained (exactly the drift class the inline
    dispatcher exists to kill); routing the registry entries and the
    recall harness's pretrained legs through here closes that last gap
    (r14 verdict finding #3). Build time is recorded under the registry
    name for the build/serve split (plans/timing.py)."""
    import re
    import time as _time

    from mempool_dumpster_spark.ml.similarity import (
        bq_topk_pretrained,
        centroids_from_json,
        centroids_to_json,
        ivfpq_topk_pretrained,
        pq_codebooks_from_json,
        pq_codebooks_to_json,
        sq8_bounds_from_json,
        sq8_bounds_to_json,
        sq8_topk_pretrained,
        train_ivf_centroids,
        write_bq_index,
        write_ivfpq_index,
        write_sq8_index,
    )
    from mempool_dumpster_spark.plans.timing import record_build

    P = ANN_RUNG_PARAMS[name]
    suffix = re.sub(r"[^0-9A-Za-z]", "_", tbl_suffix)
    _t0 = _time.time()

    if name == "emb_knn_ivf_pretrained":
        # train-small/index-big: centroids from a deterministic
        # crc32-parity half-sample, served over the FULL corpus
        sample = emb.filter(
            F.crc32(F.col("vec_id").cast("string")) % 2 == 0
        )
        stored = centroids_to_json(
            train_ivf_centroids(
                sample, n_cells=P["n_cells"], n_iters=P["n_iters"],
                dim=P["dim"],
            )
        )
        record_build(name, _time.time() - _t0)
        return ivf_topk(
            emb, queries, k=P["k"], dim=P["dim"], nprobe=P["nprobe"],
            n_assign=P["n_assign"], centroids=centroids_from_json(stored),
        ).select(
            "query_id", "neighbor_id", F.round("sim", 4).alias("sim_r"),
            "rank",
        )

    if name == "emb_knn_ivfpq_pretrained":
        tbl = "ivfpq_idx_" + suffix
        centroids, codebooks = write_ivfpq_index(
            emb, tbl, dim=P["dim"], n_cells=P["n_cells"],
            n_assign=P["n_assign"], m=P["m"], k_codes=P["k_codes"],
            n_iters=P["n_iters"],
        )
        record_build(name, _time.time() - _t0)
        centroids = centroids_from_json(centroids_to_json(centroids))
        codebooks = pq_codebooks_from_json(pq_codebooks_to_json(codebooks))
        return ivfpq_topk_pretrained(
            spark, tbl, emb, queries, centroids, codebooks,
            k=P["k"], dim=P["dim"], nprobe=P["nprobe"], refine=P["refine"],
        ).select(
            "query_id", "neighbor_id", F.round("sim", 4).alias("sim_r"),
            "rank",
        )

    if name == "emb_knn_sq8_pretrained":
        tbl = "sq8_idx_" + suffix
        bounds = write_sq8_index(emb, tbl, dim=P["dim"])
        record_build(name, _time.time() - _t0)
        bounds = sq8_bounds_from_json(sq8_bounds_to_json(bounds))
        return sq8_topk_pretrained(
            spark, tbl, emb, queries, bounds, k=P["k"], dim=P["dim"],
            refine=P["refine"],
        ).select(
            "query_id", "neighbor_id", F.round("sim", 4).alias("sim_r"),
            "rank",
        )

    if name == "emb_knn_bq_pretrained":
        tbl = "bq_idx_" + suffix
        write_bq_index(emb, tbl, dim=P["dim"])
        record_build(name, _time.time() - _t0)
        return bq_topk_pretrained(
            spark, tbl, emb, queries, k=P["k"], dim=P["dim"],
            refine=P["refine"],
        ).select(
            "query_id", "neighbor_id", F.round("sim", 4).alias("sim_r"),
            "rank",
        )

    raise KeyError(name)


@register(
    "emb_knn_lsh",
    oracle=None,  # approximate by construction — rows-only check
    doc="LSH-bucketed approximate top-3 ANN (ml.similarity.lsh_bucketed_topk): "
    "random-hyperplane sign signatures, bucket equi-join, exact cosine "
    "re-rank on candidates; deterministic for the fixed seed. Parameters are "
    "tuned to measured recall@3 ≥ 0.9 vs emb_knn on the driver's sf0.01 "
    "embeddings (0.97 at n_planes=3/n_tables=12; asserted in "
    "tests/test_ml.py::test_lsh_ann_recall_on_testdata). NOTE the testdata "
    "embeddings are isotropic (top-3 cosine ≈ 0.3-0.4), the regime where "
    "ANY sublinear index degrades toward a scan — few signature bits, many "
    "tables is the only recall-preserving choice. On real corpora with "
    "high-similarity neighbors (near-dup regime, cos ≥ 0.8), raise n_planes "
    "to 10-12 for genuinely sublinear buckets (the planted-cluster pytest "
    "demonstrates that regime).",
)
def emb_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return ann_rung_topk("emb_knn_lsh", emb, emb.filter(F.col("vec_id") < 10))


@register(
    "emb_knn_pq",
    oracle=None,  # approximate by construction — rows-only check
    overflow=True,  # rows-only; recall-gated in tests + bench
    doc="Product-quantization ADC approximate top-3 ANN "
    "(ml.similarity.pq_topk — the compression half of IVF-PQ, Jégou et "
    "al. 2011): unit vectors encode to 16 sub-codes from 32-codeword "
    "codebooks (16 bytes/vector vs 256 — the artifact a 100 TB scan "
    "actually touches), approx sim is one Arrow table-lookup pass over "
    "the codes, then the refine·k shortlist re-ranks by exact cosine. "
    "Codebook training is DECIMAL-exact Lloyd (bit-identical for any "
    "partitioning, md5 init at the data's 1/√dim scale — no RNG). "
    "refine=32 (r13, was 8): on a near-dup-heavy corpus — the 100 TB "
    "norm, and exactly what the 200k-vector stress embeddings model — "
    "clusters of near-identical vectors quantize to IDENTICAL codes, "
    "the ADC prescore ties ~100-way at the top, and a refine·k=24 "
    "shortlist cannot contain the tie (measured recall@3 collapsed "
    "0.967→0.6 at 200k vectors, ANN_RECALL_100X_r13). Oversampling is "
    "the production answer (it is why BQ always ran refine=32): "
    "refine=32 restores 1.0 at 200k, and the re-rank still touches "
    "only refine·k·|Q| vectors. "
    "Measured recall@3 = 0.967 vs emb_knn on the driver's sf0.01 "
    "embeddings (the isotropic worst case; asserted in "
    "tests/test_ml.py::test_pq_ann_recall_on_testdata and republished "
    "by bench.py) and 1.0 at the 200k-vector tier.",
)
def emb_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return ann_rung_topk("emb_knn_pq", emb, emb.filter(F.col("vec_id") < 10))


@register(
    "emb_knn_sq8",
    oracle=None,  # approximate by construction — rows-only check
    overflow=True,  # rows-only; recall-gated in tests + bench
    doc="8-bit scalar-quantization approximate top-3 ANN "
    "(ml.similarity.sq8_topk — the uniform-quantizer rung of the ladder, "
    "FAISS IndexScalarQuantizer QT_8bit): unit vectors encode to dim "
    "uint8 codes against per-dimension [lo, hi] bounds trained in ONE "
    "exact min/max aggregation pass (no Lloyd iterations, bit-identical "
    "for any partitioning by construction), the scan scores "
    "asymmetrically — bias_q + Σ w_q[d]·code_d with the query kept full "
    "precision — and the refine·k shortlist re-ranks by exact cosine. "
    "Unlike the PQ rungs, encode AND scoring are pure Catalyst "
    "expressions (transform/zip_with/aggregate): the hot path never "
    "leaves whole-stage codegen. refine=32 (r14, was 8): the randomized "
    "690-pair 200k-vector recall artifact read 0.9971 at refine=8 — two "
    "true neighbors outside the shortlist, the same near-dup tie "
    "pressure that collapsed PQ at r13, just milder because 64 uint8 "
    "codes tie far less often than 16 PQ sub-codes. Same production "
    "remedy, oversampling; the re-rank still touches only refine·k·|Q| "
    "rows. Measured recall@3 = 1.000 vs emb_knn on the driver's sf0.01 "
    "embeddings (asserted in "
    "tests/test_ml.py::test_sq8_ann_recall_on_testdata) and 1.0 at the "
    "200k-vector tier (ANN_RECALL_100X_r14).",
)
def emb_knn_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return ann_rung_topk("emb_knn_sq8", emb, emb.filter(F.col("vec_id") < 10))


@register(
    "emb_knn_bq",
    oracle=None,  # approximate by construction — rows-only check
    overflow=True,  # rows-only; recall-gated in tests + bench
    doc="Binary (sign-bit) quantization approximate top-3 ANN "
    "(ml.similarity.bq_topk — the 1-bit floor of the ladder, the "
    "'binary quantization' tier of modern vector stores): dim=64 unit "
    "vectors compress to ONE BIGINT of sign bits (64x over float64), "
    "the prescore is Hamming distance — one XOR + popcount per row, "
    "the cheapest scan Spark can run — and the refine*k shortlist "
    "re-ranks by exact cosine. NO trained state exists: the code is a "
    "pure function of the vector, so appends/streams never retrain. "
    "1-bit resolution is paid back with oversampling (refine=32 vs "
    "PQ/SQ8's 8): measured recall@3 = 0.933 on the driver's isotropic "
    "sf0.01 embeddings (0.667/0.833 at refine 8/16 — documented "
    "tradeoff), gated >= 0.9 in "
    "tests/test_ml.py::test_bq_ann_recall_on_testdata. Whole-stage "
    "codegen end-to-end like SQ8 (zip_with/bitwiseOR encode, "
    "bit_count prescore).",
)
def emb_knn_bq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return ann_rung_topk("emb_knn_bq", emb, emb.filter(F.col("vec_id") < 10))


@register(
    "emb_knn_ivfpq",
    oracle=None,  # approximate by construction — rows-only check
    overflow=True,  # rows-only; recall-gated in tests + bench
    doc="IVF-PQ approximate top-3 ANN (ml.similarity.ivfpq_topk — the "
    "canonical 100 TB composition, FAISS IVFPQ): the coarse quantizer "
    "prunes WHICH vectors each query touches (nprobe=6 of 16 cells, "
    "multi-assignment 4 for the isotropic boundary regime), PQ codes "
    "order the pruned set cheaply (ADC lookups over the 16-byte code "
    "artifact — no float vectors in the pruned scan), and the refine·k "
    "shortlist re-ranks by exact cosine. Both trainings are "
    "DECIMAL-exact/md5-seeded (bit-stable across partitionings). "
    "refine=32 (r13, was 8): near-dup clusters quantize to identical "
    "PQ codes and tie the ADC prescore ~100-way — see emb_knn_pq; "
    "recall@3 at 200k vectors was 0.6 at refine=8, 1.0 at 32. "
    "Measured recall@3 = 0.967 vs emb_knn on the driver's sf0.01 "
    "embeddings; gated in tests/test_ml.py::"
    "test_ivfpq_ann_recall_on_testdata and republished by bench.py.",
)
def emb_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return ann_rung_topk("emb_knn_ivfpq", emb, emb.filter(F.col("vec_id") < 10))


@register(
    "emb_knn_ivf",
    oracle=None,  # approximate by construction — rows-only check
    doc="IVF approximate top-3 ANN (ml.similarity.ivf_topk): spherical "
    "k-means coarse quantizer (DECIMAL-exact Lloyd updates → deterministic "
    "centroids), candidates indexed in their n_assign nearest cells, queries "
    "probe their nprobe nearest cells, cell-key equi-join, exact cosine "
    "re-rank — the FAISS IVF-Flat shape as a Catalyst plan. Parameters are "
    "tuned to measured recall@3 ≥ 0.9 vs emb_knn on the driver's sf0.01 "
    "embeddings (0.967 at n_cells=16/n_assign=3/nprobe=8; asserted in "
    "tests/test_ml.py::test_ivf_ann_recall_on_testdata). As with emb_knn_lsh "
    "the testdata embeddings are isotropic — neighbors sit near cell "
    "boundaries, so recall needs heavy multi-assignment; on real clustered "
    "corpora n_assign=1-2 / nprobe=1-4 gives genuinely sublinear probes.",
)
def emb_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return ann_rung_topk("emb_knn_ivf", emb, emb.filter(F.col("vec_id") < 10))


@register(
    "emb_knn_ivf_pretrained",
    oracle=None,  # approximate by construction — rows-only check
    doc="The train-small/index-big IVF lifecycle: centroids are trained on a "
    "deterministic half-sample of the corpus (crc32(vec_id) parity — the "
    "100 TB form trains on exactly this kind of hash-sample), persisted "
    "through the JSON index format (ml.similarity.centroids_to_json / "
    "_from_json, exact float round-trip), and the FULL corpus is then "
    "served from the pre-trained index via ivf_topk(centroids=...) with no "
    "re-training — the index artifact is reusable across query sets and "
    "sessions. Recall@3 vs emb_knn asserted ≥ 0.9 in "
    "tests/test_ml.py::test_ivf_pretrained_index_reuse.",
)
def emb_knn_ivf_pretrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return ann_rung_topk_pretrained(
        "emb_knn_ivf_pretrained", spark, emb,
        emb.filter(F.col("vec_id") < 10),
        sf_dir.rstrip("/").rsplit("/", 1)[-1],
    )


@register(
    "emb_knn_ivfpq_pretrained",
    oracle=None,  # approximate by construction — rows-only check
    overflow=True,
    doc="The serve-side half of the IVF-PQ train-once/serve-many "
    "lifecycle (r9 verdict #4): write_ivfpq_index materializes the "
    "(neighbor_id, codes, cell) artifact as a CELL-PARTITIONED catalog "
    "table, the train artifacts round-trip through their JSON index "
    "formats, and ivfpq_topk_pretrained serves queries with an "
    "exchange-free candidate side — queries probe their cells "
    "DRIVER-side, the cells become a static partition filter on the "
    "index scan (nprobe/n_cells of the files), and the |Q|·nprobe "
    "(query_id, cell) pairs broadcast-join the pruned scan. Identical "
    "parameters to emb_knn_ivfpq → identical recall gate; exact "
    "inline-vs-pretrained parity pinned in tests/test_ml.py, the "
    "zero-Exchange probe join in tests/test_bucketed.py.",
)
def emb_knn_ivfpq_pretrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return ann_rung_topk_pretrained(
        "emb_knn_ivfpq_pretrained", spark, emb,
        emb.filter(F.col("vec_id") < 10),
        sf_dir.rstrip("/").rsplit("/", 1)[-1],
    )


@register(
    "emb_knn_sq8_pretrained",
    oracle=None,  # approximate by construction — rows-only check
    overflow=True,
    doc="The serve-side half of the SQ8 train-once/serve-many lifecycle "
    "(r11 verdict #8, completing the ladder symmetry: every persistable "
    "rung now has a pretrained twin): write_sq8_index materializes the "
    "(neighbor_id, codes) dim-byte grid-code table, the 2·dim-float "
    "bounds — the ENTIRE trained state — round-trip through the "
    "sq8-bounds-v1 JSON format (loud-failure loader incl. the "
    "inverted-bounds guard), and sq8_topk_pretrained serves queries by "
    "scanning ONLY the persisted codes (pure Catalyst, whole-stage "
    "codegen, no per-batch encode work) before the exact-cosine "
    "re-rank. Identical parameters to emb_knn_sq8 → bit-identical "
    "output by construction (shared encode/score expression builders); "
    "inline-vs-pretrained parity also pinned through the `ann "
    "--method sq8` CLI e2e in tests/test_cli.py.",
)
def emb_knn_sq8_pretrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return ann_rung_topk_pretrained(
        "emb_knn_sq8_pretrained", spark, emb,
        emb.filter(F.col("vec_id") < 10),
        sf_dir.rstrip("/").rsplit("/", 1)[-1],
    )


@register(
    "emb_knn_bq_pretrained",
    oracle=None,  # approximate by construction — rows-only check
    overflow=True,
    doc="The serve-side half of the BQ lifecycle (r11 verdict #8): "
    "write_bq_index materializes the (neighbor_id, w0..) sign-word "
    "table — ONE BIGINT per vector at dim 64, no trained state to "
    "round-trip at all (the dim contract alone is persisted by the "
    "CLI) — and bq_topk_pretrained serves queries with the "
    "bit_count(XOR) Hamming prescore over the persisted words plus the "
    "exact-cosine re-rank. Identical parameters to emb_knn_bq → "
    "bit-identical output by construction (shared word/Hamming "
    "expression builders); parity also pinned through the `ann "
    "--method bq` CLI e2e in tests/test_cli.py.",
)
def emb_knn_bq_pretrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return ann_rung_topk_pretrained(
        "emb_knn_bq_pretrained", spark, emb,
        emb.filter(F.col("vec_id") < 10),
        sf_dir.rstrip("/").rsplit("/", 1)[-1],
    )


@register(
    "docs_gopher_rules",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
    per_doc AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_words,
             CAST(max(c) AS BIGINT) AS top_word_count,
             CAST(sum(c * length(w)) AS BIGINT) AS total_chars
      FROM wc GROUP BY doc_id
    )
    SELECT doc_id, n_words,
           CAST(total_chars AS DOUBLE) / n_words AS mean_word_len,
           CAST(top_word_count AS DOUBLE) / n_words AS top_word_ratio,
           (n_words BETWEEN 30 AND 100000)
             AND (CAST(total_chars AS DOUBLE) / n_words >= 3.8)
             AND (CAST(total_chars AS DOUBLE) / n_words <= 5.0)
             AND (CAST(top_word_count AS DOUBLE) / n_words <= 0.12) AS keep
    FROM per_doc
    """,
    doc="Gopher-style structural corpus filters (ml.text.gopher_rules): "
    "word-count bounds, mean-word-length band, top-word repetition gate, "
    "conjunction as `keep`. Map-side-combined (doc,word) aggregation — the "
    "shuffle carries distinct pairs, not tokens; ratios are BIGINT÷BIGINT "
    "doubles so the oracle compares bit-identically.",
)
def docs_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.text import gopher_rules

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return gopher_rules(docs)


@register(
    "docs_tfidf_terms",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS c FROM w GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term,
             CAST(tf.c AS DOUBLE) / df.dfreq AS score
      FROM tf JOIN df USING (term)
    )
    SELECT doc_id, term, score, CAST(rank AS INT) AS rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term
      ) AS rank FROM scored
    ) WHERE rank <= 3
    """,
    doc="Per-doc top-3 salient terms by tf/df (ml.text.tfidf_top_terms) — "
    "keyword extraction with an ln-free, constant-factor-free score so the "
    "oracle hashes bit-identically and ranking is unchanged; term tiebreak "
    "makes top-k deterministic. One tf⋈df equi-join on term (∝ vocab).",
)
def docs_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.text import tfidf_top_terms

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return tfidf_top_terms(docs, k=3)


def _prep_pipeline_oracle() -> str:
    return (
        _dup_components_cte()
        + """,
    comp AS (
      SELECT doc_id, min(label) AS component_id FROM reach GROUP BY doc_id
    ),
    nearkeep AS (
      SELECT doc_id FROM comp WHERE doc_id = component_id
      UNION ALL
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM comp)
    ),
    exactkeep AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents
      ) WHERE rn = 1
    ),
    gw AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    gwc AS (SELECT doc_id, w, count(*) AS c FROM gw GROUP BY doc_id, w),
    gper AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_words,
             CAST(max(c) AS BIGINT) AS top_word_count,
             CAST(sum(c * length(w)) AS BIGINT) AS total_chars
      FROM gwc GROUP BY doc_id
    ),
    gophkeep AS (
      SELECT doc_id FROM gper
      WHERE (n_words BETWEEN 30 AND 100000)
        AND (CAST(total_chars AS DOUBLE) / n_words >= 3.8)
        AND (CAST(total_chars AS DOUBLE) / n_words <= 5.0)
        AND (CAST(top_word_count AS DOUBLE) / n_words <= 0.12)
    ),
    kept AS (
      SELECT d.* FROM documents d
      WHERE d.doc_id IN (SELECT doc_id FROM nearkeep)
        AND d.doc_id IN (SELECT doc_id FROM exactkeep)
        AND d.doc_id IN (SELECT doc_id FROM gophkeep)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
           CAST(sum(length(text)) AS BIGINT) AS sum_chars
    FROM kept GROUP BY source
    """
    )


@register(
    "docs_prep_pipeline",
    oracle=_prep_pipeline_oracle(),
    doc="The full training-data prep pipeline as ONE oracle-checked query — "
    "the composition a 100 TB corpus run actually executes: Gopher-style "
    "structural filters (ml.text.gopher_rules) ∧ exact content dedup "
    "(ml.dedup.exact_dedup, min doc per md5) ∧ MinHash-LSH near-dup "
    "keep-list (shingle → band join → connected components → cluster heads "
    "+ singletons), then a per-source corpus summary (docs / tokens / "
    "chars kept). Each gate is computed over the corpus once and applied "
    "as a doc_id semi-join: the gates are independent, so they parallelize "
    "as sibling stages rather than a serial filter chain, and every join "
    "is an equi-join on doc_id — no gate amplifies rows. All-BIGINT "
    "output so the cross-engine hash compares exactly.",
)
def docs_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.dedup import words
    from mempool_dumpster_spark.ml.text import gopher_rules

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    goph_keep = gopher_rules(docs).filter("keep").select("doc_id")
    exact_keep = exact_dedup(docs).select("doc_id")
    near_keep = docs_dedup_keeplist(spark, sf_dir)
    kept = (
        docs.join(goph_keep, "doc_id", "left_semi")
        .join(exact_keep, "doc_id", "left_semi")
        .join(near_keep, "doc_id", "left_semi")
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum(F.size(words("text")).cast("bigint")).alias("sum_tokens"),
        F.sum(F.length("text").cast("bigint")).alias("sum_chars"),
    )


@register(
    "docs_split_assign",
    oracle="""
    WITH s AS (
      SELECT CASE
               WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                    % 100 < 90 THEN 'train'
               WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                    % 100 < 95 THEN 'val'
               ELSE 'test'
             END AS split,
             text
      FROM documents
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS n_chars
    FROM s GROUP BY split
    """,
    doc="Deterministic content-addressed train/val/test split "
    "(ml.splits.assign_split, 90/5/5): bucket = first-8-hex of "
    "md5(doc_id) mod 100 — stateless, shuffle-free, stable across runs, "
    "partitionings, and engines (unlike randomSplit, whose assignment "
    "moves with seed and partition layout and can leak eval docs into "
    "training on reprocess). The oracle reproduces the assignment "
    "bit-for-bit in DuckDB; the summary per split is exact-integer so the "
    "cross-engine hash compares exactly.",
)
def docs_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.splits import assign_split

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return assign_split(docs, id_col="doc_id").groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text").cast("bigint")).alias("n_chars"),
    )


_DUCK_5G = """
      SELECT DISTINCT doc_id, unnest(
               CASE WHEN len(w) >= 5 THEN
                 list_transform(range(1, len(w) - 3),
                                i -> w[i] || ' ' ||
                                     w[i+1] || ' ' ||
                                     w[i+2] || ' ' ||
                                     w[i+3] || ' ' ||
                                     w[i+4])
               ELSE [] END) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
"""


@register(
    "docs_decontaminate",
    oracle=f"""
    WITH sh AS ({_DUCK_5G}),
    bench AS (
      SELECT DISTINCT s.shingle FROM sh s
      JOIN documents d ON d.doc_id = s.doc_id AND d.source = 'src0'
    ),
    corpus_sh AS (
      SELECT s.doc_id, s.shingle FROM sh s
      JOIN documents d ON d.doc_id = s.doc_id AND d.source <> 'src0'
    ),
    per_doc AS (
      SELECT c.doc_id,
             count(DISTINCT c.shingle) AS n_shingles,
             count(DISTINCT CASE WHEN b.shingle IS NOT NULL
                                 THEN c.shingle END) AS n_hits
      FROM corpus_sh c LEFT JOIN bench b ON c.shingle = b.shingle
      GROUP BY c.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_shingles, 0) AS BIGINT) AS n_shingles,
           CAST(coalesce(p.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(coalesce(p.n_hits, 0) > 0 AS BIGINT) AS contaminated
    FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    WHERE d.source <> 'src0'
    """,
    doc="Benchmark decontamination (ml.decontam.contamination): treat "
    "source 'src0' as the held-out benchmark and flag every other "
    "document sharing any word-5-gram with it — the standard "
    "memorization guard run before training. The benchmark shingle set "
    "broadcasts (benchmark suites are MBs vs a TB corpus), hits are "
    "marked map-side in the same pass that explodes corpus shingles, and "
    "the only shuffle is the per-doc aggregate — corpus cost is "
    "independent of benchmark count.",
)
def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.decontam import contamination

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return contamination(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=5,
    )


@register(
    "docs_contamination_report",
    overflow=True,
    oracle=f"""
    WITH sh AS ({_DUCK_5G}),
    bg AS (
      SELECT s.doc_id AS bench_id, s.shingle FROM sh s
      JOIN documents d ON d.doc_id = s.doc_id AND d.source = 'src0'
    ),
    per_gram AS (
      SELECT s.shingle, count(*) AS n_corpus_docs FROM sh s
      JOIN documents d ON d.doc_id = s.doc_id AND d.source <> 'src0'
      WHERE s.shingle IN (SELECT shingle FROM bg)
      GROUP BY s.shingle
    ),
    per_item AS (
      SELECT bg.bench_id,
             count(*) AS n_grams,
             count(p.n_corpus_docs) AS n_leaked,
             sum(coalesce(p.n_corpus_docs, 0)) AS n_corpus_hits
      FROM bg LEFT JOIN per_gram p ON p.shingle = bg.shingle
      GROUP BY bg.bench_id
    )
    SELECT d.doc_id AS bench_id,
           CAST(coalesce(i.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(i.n_leaked, 0) AS BIGINT) AS n_leaked,
           CASE WHEN coalesce(i.n_grams, 0) > 0
                THEN CAST(coalesce(i.n_leaked, 0) AS DOUBLE) / i.n_grams
                ELSE 0.0 END AS leak_frac,
           CAST(coalesce(i.n_corpus_hits, 0) AS BIGINT) AS n_corpus_hits
    FROM documents d LEFT JOIN per_item i ON i.bench_id = d.doc_id
    WHERE d.source = 'src0'
    """,
    doc="Contamination report, benchmark side (ml.decontam."
    "contamination_report): for every held-out item (source 'src0'), how "
    "many of its distinct word-5-grams leaked into the training corpus, "
    "the leaked fraction, and the total (corpus doc, gram) incidences — "
    "the report an eval owner reads to decide whether a benchmark is "
    "burned; docs_decontaminate is the corpus-side drop list of the same "
    "join. Scale shape: the benchmark gram set broadcasts as a map-side "
    "semi-filter on exploded corpus grams, so the only corpus-volume "
    "work is the scan — the per-gram aggregate shuffles a benchmark-"
    "bounded gram set, and the report join is broadcast again.",
)
def docs_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.decontam import contamination_report

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return contamination_report(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=5,
    )


@register(
    "emb_semantic_dedup",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    n AS (
      SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e
    ),
    pairs AS (
      SELECT a.vec_id AS u, b.vec_id AS v
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) >= 0.4
    ),
    edges AS MATERIALIZED (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
    reach(vec_id, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT g.u, r.label FROM edges g JOIN reach r ON g.v = r.vec_id
    ),
    comp AS (SELECT vec_id, min(label) AS component_id FROM reach GROUP BY vec_id)
    SELECT em.vec_id,
           coalesce(c.component_id, em.vec_id) AS component_id,
           CAST(coalesce(c.component_id, em.vec_id) = em.vec_id AS BIGINT) AS keep
    FROM embeddings em LEFT JOIN comp c ON c.vec_id = em.vec_id
    """,
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
    doc="SemDeDup-shaped semantic dedup: embedding-cosine near-dup pairs "
    "(the bucketed 48-table sign-LSH plan of emb_near_pairs — no cross "
    "join) → connected components (per-round checkpointed label "
    "propagation, ml.dedup.duplicate_components) → keep exactly one "
    "vector per semantic cluster (the min id), singletons kept. The "
    "oracle recomputes the exact all-pairs graph and its transitive "
    "closure in DuckDB, so every (component_id, keep) assignment is "
    "cross-engine checked. Cost at 100 TB: LSH candidate shuffle "
    "∝ rows × tables, components O(diameter) rounds over near-dup edges "
    "(shallow clusters), final left join broadcasts nothing bigger than "
    "the duplicate set.",
)
def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.similarity import cosine_near_pairs

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    pairs = cosine_near_pairs(
        emb, threshold=0.4, dim=64, n_planes=3, n_tables=48
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    comp = duplicate_components(pairs).select(
        F.col("doc_id").alias("vec_id"), "component_id"
    )
    return emb.select("vec_id").join(comp, "vec_id", "left").select(
        "vec_id",
        F.coalesce("component_id", "vec_id").alias("component_id"),
        (F.coalesce("component_id", "vec_id") == F.col("vec_id"))
        .cast("bigint")
        .alias("keep"),
    )


@register(
    "docs_pretoken_stats",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' don''t stop: 123 tokens, v2.0 (beta)!' AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t,
             '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
           )) AS BIGINT) AS n_pretokens,
           CAST(len(string_split(t, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(ceil(length(t) / 4.0) AS BIGINT) AS est_subwords
    FROM aug
    """,
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
    doc="Tokenizer-shaped counting (ml.text.pretoken_count): BPE "
    "pre-tokenizer segments (GPT-2-style pattern, RE2-compatible — no "
    "lookahead — so the exact same regex runs in the oracle) next to the "
    "whitespace count and the chars/4 subword estimate. Both engines "
    "append a punctuation/digit-bearing suffix so the digit, punctuation, "
    "and contraction branches of the pattern are actually exercised (the "
    "synthetic corpus is bare lowercase words). Pure projection, zero "
    "shuffles.",
)
def docs_pretoken_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.text import pretoken_count, subword_estimate

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    t = F.concat(F.col("text"), F.lit(" don't stop: 123 tokens, v2.0 (beta)!"))
    return docs.select(
        "doc_id",
        pretoken_count(t).alias("n_pretokens"),
        F.size(F.split(t, " ")).cast("bigint").alias("n_ws_tokens"),
        subword_estimate(t).alias("est_subwords"),
    )


@register(
    "docs_budget_fill",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             sum(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                        % 1000000, doc_id
             ) AS cum
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_used
    FROM t
    WHERE cum <= CASE source WHEN 'src0' THEN 4000 WHEN 'src1' THEN 1500
                 ELSE 800 END
    GROUP BY source
    """,
    doc="Token-budget corpus assembly (ml.packing.budget_fill): each source "
    "contributes documents — in content-addressed stable pseudo-random "
    "order — until its TOKEN budget fills; no partial documents (inclusive "
    "running sum <= budget). One window shuffle on source; the running "
    "sum is a streaming aggregate, not a self-join. The rate-based twin "
    "is docs_mix_corpus.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def docs_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.packing import budget_fill
    from mempool_dumpster_spark.ml.text import token_count

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    toks = docs.select(
        "doc_id", "source", token_count("text").alias("n_tokens")
    )
    kept = budget_fill(
        toks, {"src0": 4000, "src1": 1500}, default_budget=800
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("tokens_used"),
    )


@register(
    "docs_sample_per_source",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                        % 1000000, doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, source FROM r WHERE rk <= 25
    """,
    doc="Deterministic per-source sampling (ml.packing.sample_per_group): "
    "25 documents per source ranked by the content-addressed md5 bucket — "
    "stable across runs, partition layouts, and engines, unlike sampleBy's "
    "seed-and-partitioning-dependent Bernoulli draw. One window shuffle.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def docs_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.packing import sample_per_group

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return sample_per_group(docs, 25).select("doc_id", "source")


@register(
    "emb_pca_project",
    oracle=None,  # no SQL twin — pinned to a numpy reference in tests/test_ml.py
    doc="Distributed PCA (ml.pca): fit from ONE pass of per-partition "
    "sufficient statistics (count, sum, Gram matrix — d+d² floats per "
    "Arrow batch cross the wire, never rows), eigendecompose the d×d "
    "covariance on the driver, project via literal-vector dot products "
    "in pure JVM column algebra. Output: vec_id, the 4-dim projection, "
    "and the model's explained-variance spectrum (constant columns) — "
    "deterministic via sorted partial combination and a "
    "largest-coordinate sign convention; verified against numpy to 1e-8 "
    "in tests (the driver records a rows-only check).",
    overflow=True,
)
def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.pca import pca_fit, pca_transform

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    emb = emb.withColumn("embedding", F.col("embedding").cast("array<double>"))
    model = pca_fit(emb, k=4)
    out = pca_transform(emb, model)
    ev = model.explained_variance
    return out.select(
        "vec_id",
        F.round(F.element_at("pca", 1), 6).alias("pc1"),
        F.round(F.element_at("pca", 2), 6).alias("pc2"),
        F.lit(round(ev[0], 6)).alias("var1"),
        F.lit(round(ev[1], 6)).alias("var2"),
    )


@register(
    "docs_training_order",
    oracle="""
    SELECT doc_id,
           md5('1' || '|' || CAST(doc_id AS VARCHAR)) AS order_key
    FROM documents
    ORDER BY order_key, doc_id
    LIMIT 20
    """,
    doc="Deterministic training-epoch shuffle order (ml.packing."
    "training_order): order_key = md5(seed ‖ '|' ‖ doc_id) — a uniform "
    "pseudo-random permutation that is identical across engines, "
    "partitionings, and re-runs (rand() would reorder an epoch under "
    "task retry/speculation), with each seed/epoch an independent "
    "permutation. The oracle recomputes the keys bit-for-bit in DuckDB; "
    "the head of the epoch-1 permutation is compared exactly. At scale "
    "the full materialization is `shuffle_for_training`: "
    "repartitionByRange on the key + sortWithinPartitions — total order "
    "across files, no global sort bottleneck.",
)
def docs_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.packing import training_order

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return (
        training_order(docs, seed="1")
        .select("doc_id", "order_key")
        .orderBy("order_key", "doc_id")
        .limit(20)
    )


def _incremental_dedup_oracle(
    n_hashes: int = 64,
    n_bands: int = 16,
    rows_per_band: int = 4,
    digest: bool = False,
) -> str:
    """Cross-corpus incremental dedup in DuckDB: 64-slot minhash on both
    sides, 16 bands x 4 rows, exact text-hash anti + estimated-Jaccard
    (agreeing slots / 64) >= 0.7 near-drop — the same parameters
    ml.prep.cross_corpus_filter defaults to (raised from 16/4x4: at the
    0.7 threshold the 16-slot estimator's σ≈0.11 made false DROPS — data
    loss — ~10% likely for true-0.55 pairs; 64 slots halve σ twice, and
    16x4 banding keeps the prefilter's S-curve midpoint at ≈0.5 so true
    near-dups are near-certain candidates).

    `digest=True` wraps the admitted set in the bucketed md5-chain form
    (docs_incremental_dedup_digest): 16 buckets of doc_id % 16, each
    carrying its count and md5 over the comma-joined ascending ids. The
    digest twin runs this oracle at 8 slots / 2×4 banding — the width
    whose per-slot md5 cost keeps DuckDB LINEAR at the 500k-doc tier
    (the 64-slot form is 3.2B md5 calls there and spills past the
    disk; same reduced-width trade docs_minhash_sig_digest made)."""
    shingle = (
        "SELECT DISTINCT doc_id, unnest("
        "CASE WHEN len(w) >= 3 THEN "
        "list_transform(range(1, len(w) - 1), "
        "i -> w[i] || ' ' || "
        "w[i+1] || ' ' || "
        "w[i+2]) ELSE [] END) AS shingle "
        "FROM (SELECT doc_id, string_split(text, ' ') AS w FROM {src})"
    )
    mins = ", ".join(
        f"min(md5('{i}:' || shingle)) AS m{i}" for i in range(n_hashes)
    )
    def bands(sig):
        rows = []
        for b in range(n_bands):
            key = " || '|' || ".join(
                f"m{b * rows_per_band + r}" for r in range(rows_per_band)
            )
            rows.append(
                f"SELECT doc_id, {b} AS band, {key} AS key FROM {sig}"
            )
        return " UNION ALL ".join(rows)
    agree = " + ".join(
        f"(CASE WHEN n.m{i} = o.m{i} THEN 1 ELSE 0 END)"
        for i in range(n_hashes)
    )
    admitted = f"""
    WITH new_docs AS (SELECT doc_id, text FROM documents WHERE source = 'src0'),
    base AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
    sh_new AS ({shingle.format(src='new_docs')}),
    sh_base AS ({shingle.format(src='base')}),
    sig_new AS (SELECT doc_id, {mins} FROM sh_new GROUP BY doc_id),
    sig_base AS (SELECT doc_id, {mins} FROM sh_base GROUP BY doc_id),
    bands_new AS ({bands('sig_new')}),
    bands_base AS ({bands('sig_base')}),
    cand AS (
      SELECT DISTINCT bn.doc_id AS new_id, bb.doc_id AS old_id
      FROM bands_new bn
      JOIN bands_base bb ON bn.band = bb.band AND bn.key = bb.key
    ),
    near AS (
      SELECT DISTINCT c.new_id AS doc_id
      FROM cand c
      JOIN sig_new n ON n.doc_id = c.new_id
      JOIN sig_base o ON o.doc_id = c.old_id
      WHERE ({agree}) / {float(n_hashes)} >= 0.7
    )
    SELECT doc_id FROM new_docs
    WHERE md5(text) NOT IN (SELECT md5(text) FROM base)
      AND doc_id NOT IN (SELECT doc_id FROM near)
    """
    if not digest:
        return admitted + " ORDER BY doc_id"
    return f"""
    SELECT CAST(doc_id % 16 AS INT) AS bucket,
           COUNT(*) AS n_admitted,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS chain_md5
    FROM ({admitted})
    GROUP BY 1
    ORDER BY 1
    """


@register(
    "docs_incremental_dedup",
    oracle=_incremental_dedup_oracle(),
    doc="Incremental (append-batch) dedup against an EXISTING corpus "
    "(ml.prep.cross_corpus_filter, the cross-corpus half of "
    "prep_incremental): treat source=src0 as the new batch and the rest "
    "as the committed corpus, join the batch against the corpus's "
    "persisted signature artifact (text_hash + 64-slot MinHash — "
    "`corpus_signatures`, landed by `prep --signatures`; 64 slots, not "
    "16, because a false DROP at the 0.7 threshold is silent data "
    "loss and the 16-slot estimator's σ≈0.11 made that ~10% likely for "
    "true-0.55 pairs), drop exact text-hash matches and LSH candidates "
    "whose MinHash-estimated Jaccard (agreeing slots / 64) reaches 0.7. "
    "At 100 TB the corpus TEXT is never re-read and never shuffles: the "
    "exact gate shuffles 128-bit hashes, the near gate shuffles "
    "docs×16 band rows plus candidate pairs — the append path that "
    "makes a continuously-growing training corpus tractable.",
)
def docs_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.prep import (
        corpus_signatures,
        cross_corpus_filter,
    )

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    base = docs.filter(F.col("source") != "src0")
    new = docs.filter(F.col("source") == "src0")
    sigs = corpus_signatures(base)
    return (
        cross_corpus_filter(new, sigs)
        .select("doc_id")
        .orderBy("doc_id")
    )


@register(
    "docs_incremental_dedup_digest",
    oracle=_incremental_dedup_oracle(
        n_hashes=8, n_bands=2, rows_per_band=4, digest=True
    ),
    doc="100×-evidence digest twin of docs_incremental_dedup (r16, the "
    "docs_minhash_sig_digest pattern a third time): the SAME cross-"
    "corpus code path — corpus_signatures → exact text-hash anti → LSH "
    "band join → agreeing-slots/n ≥ 0.7 near-drop → anti-join "
    "(ml.prep.cross_corpus_filter, whose banding self-derives from the "
    "artifact width) — run at 8 signature slots / 2×4 banding, the "
    "width whose DuckDB oracle stays LINEAR at the 500k-doc tier (the "
    "production 64-slot oracle is 3.2B md5 calls there and spills past "
    "the disk — why docs_incremental_dedup rides rows-only at 100×). "
    "The admitted id set folds to 16 bucket rows of (count, md5 over "
    "the ascending comma-joined ids), so the hash compare is exact and "
    "any divergence localizes to a bucket. Production-width parameters "
    "stay exact-checked at sf1 via the docs_incremental_dedup entry.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def docs_incremental_dedup_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.prep import (
        corpus_signatures,
        cross_corpus_filter,
    )

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    base = docs.filter(F.col("source") != "src0")
    new = docs.filter(F.col("source") == "src0")
    sigs = corpus_signatures(base, n_hashes=8)
    admitted = cross_corpus_filter(new, sigs).select("doc_id")
    return (
        admitted.groupBy(
            (F.col("doc_id") % 16).cast("int").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_admitted"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list("doc_id")),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("chain_md5"),
        )
        .orderBy("bucket")
    )


_VERSION_DIFF_ORACLE = """
WITH v1 AS (SELECT doc_id, text, source FROM documents),
ups AS (
  SELECT doc_id, upper(text) AS text, source
  FROM documents WHERE source = 'src0'
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, 'vnew' AS source
  FROM documents WHERE doc_id % 97 = 0
),
v2 AS (
  SELECT * FROM v1 WHERE doc_id NOT IN (SELECT doc_id FROM ups)
  UNION ALL
  SELECT * FROM ups
),
added AS (
  SELECT doc_id, source, 'added' AS __change
  FROM (SELECT * FROM v2 EXCEPT ALL SELECT * FROM v1)
),
removed AS (
  SELECT doc_id, source, 'removed' AS __change
  FROM (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v2)
)
SELECT * FROM added
UNION ALL
SELECT * FROM removed
ORDER BY __change, doc_id, source
"""


@register(
    "manifest_version_diff",
    oracle=_VERSION_DIFF_ORACLE,
    doc="Change-data-capture between two committed manifest versions "
    "(sources.manifest.diff_versions): commit the documents table as v1, "
    "UPSERT a batch (src0 texts modified in place + fresh doc_ids "
    "appended) as v2, then diff — full-row exceptAll both ways, labeled "
    "'added'/'removed' in __change, multiset semantics so duplicate-row "
    "count changes surface. The DuckDB oracle reconstructs both versions "
    "relationally and takes the same EXCEPT ALL both ways. At scale the "
    "diff is two hash-partitioned set-differences over exactly the two "
    "version directories — no manifest history scan, no driver state.",
)
def manifest_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import shutil

    from mempool_dumpster_spark.sources.manifest import (
        commit_write,
        diff_versions,
        upsert,
    )

    docs = load_tables(spark, sf_dir, ["documents"])["documents"].select(
        "doc_id", "text", "source"
    )
    # scratch dataset keyed by sf_dir so the two selfcheck scales never
    # collide; rebuilt from scratch each call (idempotent, few hundred
    # rows) — sf_dir itself is read-only
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = f"/tmp/spark_graft_vdiff_{key}"
    shutil.rmtree(path, ignore_errors=True)
    commit_write(docs, path)  # v1
    updates = (
        docs.filter(F.col("source") == "src0")
        .withColumn("text", F.upper("text"))
        .unionByName(
            docs.filter(F.col("doc_id") % 97 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                "text",
                F.lit("vnew").alias("source"),
            )
        )
    )
    upsert(spark, path, updates, ["doc_id"])  # v2
    return (
        diff_versions(spark, path, 1, 2)
        .select("doc_id", "source", "__change")
        .orderBy("__change", "doc_id", "source")
    )


_FUNNEL_STAGES = [
    "total", "word_count", "mean_word_len", "top_word_ratio", "langid_en",
]


@register(
    "docs_filter_funnel",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
    per_doc AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_words,
             CAST(max(c) AS BIGINT) AS top_word_count,
             CAST(sum(c * length(w)) AS BIGINT) AS total_chars
      FROM wc GROUP BY doc_id
    ),
    scored AS (SELECT doc_id, {{scores}} FROM documents),
    ranked AS (
      SELECT doc_id, score, lang,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang DESC) AS rn
      FROM ({{lang_rows}})
    ),
    lang AS (
      SELECT doc_id,
             CASE WHEN score > 0 THEN lang ELSE 'und' END AS predicted_lang
      FROM ranked WHERE rn = 1
    ),
    lvl AS (
      SELECT p.doc_id, p.n_words,
        CASE
          WHEN NOT (p.n_words BETWEEN 30 AND 100000) THEN 0
          WHEN NOT (CAST(p.total_chars AS DOUBLE) / p.n_words >= 3.8
                    AND CAST(p.total_chars AS DOUBLE) / p.n_words <= 5.0)
            THEN 1
          WHEN NOT (CAST(p.top_word_count AS DOUBLE) / p.n_words <= 0.12)
            THEN 2
          WHEN NOT (l.predicted_lang = 'en') THEN 3
          ELSE 4
        END AS lvl
      FROM per_doc p JOIN lang l ON l.doc_id = p.doc_id
    )
    SELECT stage,
           ['total', 'word_count', 'mean_word_len', 'top_word_ratio',
            'langid_en'][stage + 1] AS stage_name,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_tokens
    FROM (SELECT n_words, unnest(range(0, lvl + 1)) AS stage FROM lvl)
    GROUP BY stage
    """.replace("{scores}", _SCORES).replace("{lang_rows}", _LANG_ROWS),
    doc="Quality-filter funnel — per-stage survivor counts for the "
    "curation cascade every corpus run reports (docs and tokens surviving "
    "total → word-count bounds → mean-word-length band → top-word "
    "repetition gate → stopword-profile langid = 'en'; the first three "
    "are ml.text.gopher_rules' exact sub-rules, applied in order). Each "
    "doc computes its deepest-consecutive-pass level once, then "
    "explode(sequence(0, lvl)) turns cumulative membership into one "
    "5-group aggregate — no per-stage passes, no driver loop; the funnel "
    "costs ONE corpus scan + the (doc,word) shuffle gopher_rules already "
    "pays, at any corpus size. Attribution reading: stage N's count minus "
    "stage N+1's is exactly the docs lost to rule N+1 alone (in cascade "
    "order).",
)
def docs_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.text import language_id, with_gopher_stats

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    # One projection computes BOTH rule families (r16): gopher_rules is
    # now a row-local projection (ml.text.with_gopher_stats), so the
    # former gopher⋈language_id join — a self-join of two projections
    # over the SAME scan, costing an exchange + a second scan — is just
    # two withColumns stages on one frame. Plan: scan → project →
    # explode(sequence) → one 5-group aggregate. Results identical.
    per_doc = with_gopher_stats(language_id(docs))
    mean_len = F.col("total_chars").cast("double") / F.col("n_words")
    top_ratio = F.col("top_word_count").cast("double") / F.col("n_words")
    wc_ok = F.col("n_words").between(30, 100000)
    mwl_ok = (mean_len >= 3.8) & (mean_len <= 5.0)
    twr_ok = top_ratio <= 0.12
    lang_ok = F.col("predicted_lang") == "en"
    lvl = (
        F.when(~wc_ok, 0)
        .when(~mwl_ok, 1)
        .when(~twr_ok, 2)
        .when(~lang_ok, 3)
        .otherwise(4)
    )
    per = per_doc.select("n_words", lvl.alias("lvl"))
    names = F.array(*[F.lit(s) for s in _FUNNEL_STAGES])
    return (
        per.select(
            F.explode(F.sequence(F.lit(0), F.col("lvl"))).alias("stage"),
            "n_words",
        )
        .groupBy("stage")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_tokens"),
        )
        .select(
            F.col("stage").cast("bigint").alias("stage"),
            F.element_at(names, F.col("stage").cast("int") + 1)
            .alias("stage_name"),
            "n_docs",
            "n_tokens",
        )
    )


@register(
    "emb_mmr_topk",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    n AS (
      SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e
    ),
    q AS (SELECT * FROM n WHERE vec_id < 5),
    sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 4)
               AS sim_r
      FROM q JOIN n c ON c.vec_id <> q.vec_id
    ),
    pool AS (
      SELECT query_id, neighbor_id,
             CAST(round(sim_r * 10000) AS BIGINT) AS s_bp, rk
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY sim_r DESC, neighbor_id
        ) AS rk FROM sims
      ) WHERE rk <= 10
    ),
    pair AS (
      SELECT p1.query_id, p1.neighbor_id AS a, p2.neighbor_id AS b,
             CAST(round(round(list_dot_product(na.emb, nb.emb)
                              / (na.nrm * nb.nrm), 4) * 10000) AS BIGINT)
               AS ps_bp
      FROM pool p1
      JOIN pool p2 ON p2.query_id = p1.query_id
                  AND p2.neighbor_id <> p1.neighbor_id
      JOIN n na ON na.vec_id = p1.neighbor_id
      JOIN n nb ON nb.vec_id = p2.neighbor_id
    ),
    s1 AS (
      SELECT query_id, neighbor_id, 7 * s_bp AS score_bp
      FROM pool WHERE rk = 1
    ),
    c2 AS (
      SELECT p.query_id, p.neighbor_id,
             7 * p.s_bp - 3 * pr.ps_bp AS score_bp
      FROM pool p
      JOIN s1 ON s1.query_id = p.query_id
             AND p.neighbor_id <> s1.neighbor_id
      JOIN pair pr ON pr.query_id = p.query_id
                  AND pr.a = p.neighbor_id AND pr.b = s1.neighbor_id
    ),
    s2 AS (
      SELECT query_id, neighbor_id, score_bp FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY score_bp DESC, neighbor_id
        ) AS rk2 FROM c2
      ) WHERE rk2 = 1
    ),
    c3 AS (
      SELECT p.query_id, p.neighbor_id,
             7 * p.s_bp - 3 * greatest(pa.ps_bp, pb.ps_bp) AS score_bp
      FROM pool p
      JOIN s1 ON s1.query_id = p.query_id
             AND p.neighbor_id <> s1.neighbor_id
      JOIN s2 ON s2.query_id = p.query_id
             AND p.neighbor_id <> s2.neighbor_id
      JOIN pair pa ON pa.query_id = p.query_id
                  AND pa.a = p.neighbor_id AND pa.b = s1.neighbor_id
      JOIN pair pb ON pb.query_id = p.query_id
                  AND pb.a = p.neighbor_id AND pb.b = s2.neighbor_id
    ),
    s3 AS (
      SELECT query_id, neighbor_id, score_bp FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY score_bp DESC, neighbor_id
        ) AS rk3 FROM c3
      ) WHERE rk3 = 1
    )
    SELECT query_id, CAST(1 AS BIGINT) AS pick, neighbor_id, score_bp FROM s1
    UNION ALL
    SELECT query_id, CAST(2 AS BIGINT), neighbor_id, score_bp FROM s2
    UNION ALL
    SELECT query_id, CAST(3 AS BIGINT), neighbor_id, score_bp FROM s3
    """,
    doc="Maximal-Marginal-Relevance diversified retrieval (Carbonell & "
    "Goldstein 1998), the rerank every retrieval-augmented data-curation "
    "loop runs on top of ANN: retrieve the exact top-10 pool per query, "
    "then greedily pick 3 results maximizing λ·sim(q,d) − (1−λ)·max "
    "sim(d, picked) with λ=0.7. The greedy recursion is UNROLLED into "
    "k declarative argmax stages generated programmatically from k "
    "(ml.similarity.mmr_rerank; k=3 here, parity-pinned against "
    "sequential greedy for k ≤ 8 in tests/test_properties.py) — windows "
    "+ equi-joins over the m=10 pool, m² pairwise sims per query, "
    "bounded by the pool not the corpus; no driver loop, one Catalyst "
    "DAG. Scores are EXACT BIGINTs: similarities round to 4 "
    "decimals then scale to basis points (the ×10000 double is ~0.5 from "
    "any rounding boundary, so the int cast is engine-safe), and the MMR "
    "combination is integer 7·s − 3·ps — no second float rounding, whose "
    "λ-scaled 5th-decimal ties Spark (shortest-repr HALF_UP) and DuckDB "
    "(raw-double) resolve differently. Ordering and every pick are "
    "therefore bit-for-bit reproducible in the oracle.",
)
def emb_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["embeddings"])
    # r16 construction form: units/pool/pair are three spark.sql calls
    # instead of ~150 py4j Column round-trips (~0.9 s of pure driver
    # plan-construction per invocation, measured — the HOF unit/dot
    # lambdas and the window/join chain each cost several round trips).
    # The expressions are verbatim ports of the previous Column forms:
    # unit = emb/nrm component-wise with the same sequential-fold dot, so
    # every sim_r/s_bp/ps_bp value is bit-identical. pool and pair stay
    # CACHED: the unrolled MMR stages reference pair i-1 times at pick i
    # and each reference would otherwise re-derive the pool self-join +
    # two unit joins + dot products (mmr_rerank docstring's "prefer
    # caching pool/pair" advice; both frames are |Q|·m²-bounded, never
    # corpus-sized — measured 2.04 → 1.35 s at sf0.1/local[32]).
    # Cache contract (r16 verdict #6): these within-query caches are not
    # unpersisted here — the returned frame references them. Long-running
    # sessions calling this repeatedly reuse the SAME CacheManager entry
    # (plan-identical), so entries do not accumulate; clearCache()
    # releases them (bench.py clears between timed runs).
    dot_sql = (
        "aggregate(zip_with({u}, {v}, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    units = spark.sql(f"""
      SELECT vec_id, transform(emb, x -> x / nrm) AS unit
      FROM (
        SELECT vec_id, emb, sqrt({dot_sql.format(u="emb", v="emb")}) AS nrm
        FROM (SELECT vec_id,
                     transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
              FROM embeddings)
      )
    """).cache()
    units_v = register_temp_view(units, "__mmr_units")
    pool = spark.sql(f"""
      SELECT query_id, neighbor_id,
             CAST(round(sim_r * 10000) AS BIGINT) AS s_bp, rk
      FROM (
        SELECT query_id, neighbor_id, sim_r,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY sim_r DESC, neighbor_id
               ) AS rk
        FROM (
          SELECT /*+ BROADCAST(q) */ q.vec_id AS query_id,
                 c.vec_id AS neighbor_id,
                 round({dot_sql.format(u="q.unit", v="c.unit")}, 4) AS sim_r
          FROM {units_v} c
          JOIN (SELECT * FROM {units_v} WHERE vec_id < 5) q
            ON c.vec_id <> q.vec_id
        )
      ) WHERE rk <= 10
    """).cache()
    pool_v = register_temp_view(pool, "__mmr_pool")
    pair = spark.sql(f"""
      SELECT p1.query_id, p1.neighbor_id AS a, p2.neighbor_id AS b,
             CAST(round(round({dot_sql.format(u="ua.unit", v="ub.unit")}, 4)
                        * 10000) AS BIGINT) AS ps_bp
      FROM {pool_v} p1
      JOIN {pool_v} p2 ON p2.query_id = p1.query_id
                      AND p2.neighbor_id <> p1.neighbor_id
      JOIN {units_v} ua ON ua.vec_id = p1.neighbor_id
      JOIN {units_v} ub ON ub.vec_id = p2.neighbor_id
    """).cache()
    from mempool_dumpster_spark.ml.similarity import mmr_rerank

    return drop_views(mmr_rerank(pool, pair, k=3), units_v, pool_v)


@register(
    "media_frame_knn",
    oracle="""
    WITH ids AS (
      SELECT CAST(doc_id AS BIGINT) AS media_id FROM documents
      WHERE doc_id < 24
    ),
    frames AS (
      SELECT media_id * 4 + j AS frame_id,
             list_transform(
               range(0, 16),
               d -> CAST(('0x' || substr(
                            md5(CAST(media_id AS VARCHAR) || ':'
                                || CAST(j AS VARCHAR)),
                            CAST(2 * d + 1 AS BIGINT), 2))::UBIGINT
                         AS DOUBLE)) AS emb
      FROM ids, (SELECT unnest(range(0, 3)) AS j)
    ),
    n AS (
      SELECT frame_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm
      FROM frames
    ),
    q AS (SELECT * FROM n WHERE frame_id < 12),
    sims AS (
      SELECT q.frame_id AS query_id, c.frame_id AS neighbor_id,
             round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 4)
               AS sim_r
      FROM q JOIN n c ON c.frame_id <> q.frame_id
    )
    SELECT query_id, neighbor_id, sim_r, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim_r DESC, neighbor_id) AS rank
      FROM sims
    ) WHERE rank <= 3
    """,
    # r10 slot rotation (r9 verdict #7): promoted into the driver's 50 —
    # the multimodal family previously had no driver-slot representation
    # beyond decode (docs_binary_stats); docs_quality ceded its slot.
    doc="Multimodal handoff END-TO-END (r8 verdict #6): synthetic MP4s "
    "(ml.multimodal.build_keyframe_mp4 — full stsd/stts/stsc/stsz/stco "
    "sample table, 3 keyframes per doc whose bytes are md5(doc_id:j)) "
    "flow through the REAL decode path — sample_frames' sample-table "
    "walk extracts the keyframe stills, resize_images passes the "
    "non-image payloads through byte-identically (honest no-codec "
    "contract) — then each frame's 16 bytes become a 16-dim feature "
    "vector (hex-parse projection; the byte-histogram stand-in for a "
    "codec-backed featurizer) feeding the exact cosine top-3 of emb_knn's "
    "shape. The ORACLE recomputes the expected frame bytes analytically "
    "from md5, so a wrong stco offset, stsz size, or a resize that "
    "mutates payloads surfaces as a cross-engine hash mismatch — the "
    "decode/resize/sample plumbing is what is under test. Scale: one "
    "mapInPandas pass per stage, frames (not payloads) cross stages, "
    "query side broadcast; swap the hex projection for a real codec "
    "featurizer and the plan is unchanged.",
)
def media_frame_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.multimodal import (
        build_keyframe_mp4,
        resize_images,
        sample_frames,
    )

    docs = (
        load_tables(spark, sf_dir, ["documents"])["documents"]
        .filter(F.col("doc_id") < 24)
        .select(F.col("doc_id").cast("long").alias("media_id"))
    )

    def build(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = []
            for mid in pdf["media_id"]:
                payloads = [
                    hashlib.md5(f"{mid}:{j}".encode()).digest()
                    for j in range(3)
                ]
                out.append(
                    {
                        "media_id": mid,
                        "payload": build_keyframe_mp4(payloads),
                        "mime": "video/mp4",
                        "meta": None,
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "payload", "mime", "meta"]
            )

    media = docs.mapInPandas(
        build,
        "media_id long, payload binary, mime string, meta map<string,string>",
    )
    frames = sample_frames(media, every_n_seconds=5)
    # resize keys rows by media_id alone, so frame identity rides along
    # encoded as frame_id = media_id*4 + sample_idx (sample_idx < 4)
    resized = resize_images(
        frames.select(
            (F.col("media_id") * 4 + F.col("sample_idx")).alias("media_id"),
            F.col("frame_bytes").alias("payload"),
            F.lit("application/octet-stream").alias("mime"),
        ),
        8,
        8,
    )
    hexcol = F.hex(F.col("payload"))
    emb = F.array(
        *[
            F.conv(F.substring(hexcol, 2 * d + 1, 2), 16, 10).cast("double")
            for d in range(16)
        ]
    )
    vecs = resized.select(
        F.col("media_id").alias("frame_id"), emb.alias("emb")
    )
    dot = lambda u, v: F.aggregate(  # noqa: E731 — emb_knn's exact fold
        F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    from pyspark.sql import Window

    vecs = vecs.withColumn("nrm", F.sqrt(dot(F.col("emb"), F.col("emb"))))
    q = vecs.filter(F.col("frame_id") < 12).select(
        F.col("frame_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    sims = (
        vecs.select(
            F.col("frame_id").alias("neighbor_id"),
            F.col("emb").alias("c_emb"),
            F.col("nrm").alias("c_nrm"),
        )
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_nrm") * F.col("c_nrm")),
                4,
            ).alias("sim_r"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_r").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "sim_r", "rank")
    )


@register(
    "audio_clip_knn",
    oracle="""
    WITH ids AS (
      SELECT CAST(doc_id AS BIGINT) AS clip_id FROM documents
      WHERE doc_id < 20
    ),
    samp AS (
      SELECT clip_id, i,
             CAST(('0x' || substr(
                      md5(CAST(clip_id AS VARCHAR) || ':'
                          || CAST(i // 8 AS VARCHAR)),
                      CAST((i % 8) * 4 + 1 AS BIGINT), 4))::UBIGINT
                  AS BIGINT) AS v
      FROM ids, (SELECT unnest(range(0, 256)) AS i)
    ),
    seg AS (
      SELECT clip_id, i * 8 // 256 AS seg,
             CAST(sum(CASE WHEN v >= 32768 THEN abs(v - 65536) ELSE v END)
                  AS DOUBLE) / 32768 AS f
      FROM samp GROUP BY clip_id, i * 8 // 256
    ),
    vec AS (
      SELECT clip_id, list(f ORDER BY seg) AS emb FROM seg GROUP BY clip_id
    ),
    n AS (
      SELECT clip_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM vec
    ),
    q AS (SELECT * FROM n WHERE clip_id < 8),
    sims AS (
      SELECT q.clip_id AS query_id, c.clip_id AS neighbor_id,
             round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 4)
               AS sim_r
      FROM q JOIN n c ON c.clip_id <> q.clip_id
    )
    SELECT query_id, neighbor_id, sim_r, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim_r DESC, neighbor_id) AS rank
      FROM sims
    ) WHERE rank <= 3
    """,
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
    doc="Second modality through the multimodal→similarity handoff (r9 "
    "verdict #8, generalizing media_frame_knn beyond video stills): "
    "synthetic 16-bit PCM WAVs (ml.multimodal.build_pcm_wav — full "
    "RIFF/fmt/data container; 256 samples per clip, sample i = signed "
    "int16 from md5(clip:i//8)) flow through the REAL decode path — "
    "_wav_pcm_samples' RIFF walk and PCM scaling — into "
    "pcm_segment_profile's fixed-width loudness envelope (8 segments, "
    "each Σ|x|, every partial sum an exact dyadic rational so the "
    "profile is bit-identical across engines and summation orders), "
    "then the exact cosine top-3 of emb_knn's shape. The oracle "
    "recomputes the samples analytically from md5, so a wrong fmt "
    "field, byte order, data offset, or segment boundary surfaces as a "
    "cross-engine hash mismatch. Scale: one mapInPandas pass per stage, "
    "profiles (not payloads) cross stages, query side broadcast.",
)
def audio_clip_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.multimodal import (
        build_pcm_wav,
        pcm_segment_profile,
    )

    docs = (
        load_tables(spark, sf_dir, ["documents"])["documents"]
        .filter(F.col("doc_id") < 20)
        .select(F.col("doc_id").cast("long").alias("media_id"))
    )

    def build(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = []
            for mid in pdf["media_id"]:
                samples = []
                for blk in range(32):
                    h = hashlib.md5(f"{mid}:{blk}".encode()).hexdigest()
                    for j in range(8):
                        v = int(h[4 * j : 4 * j + 4], 16)
                        samples.append(v - 65536 if v >= 32768 else v)
                out.append(
                    {
                        "media_id": mid,
                        "payload": build_pcm_wav(samples),
                        "mime": "audio/wav",
                        "meta": None,
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "payload", "mime", "meta"]
            )

    media = docs.mapInPandas(
        build,
        "media_id long, payload binary, mime string, meta map<string,string>",
    )
    vecs = pcm_segment_profile(media, n_segments=8).select(
        F.col("media_id").alias("clip_id"), F.col("profile").alias("emb")
    )
    dot = lambda u, v: F.aggregate(  # noqa: E731 — emb_knn's exact fold
        F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    from pyspark.sql import Window

    vecs = vecs.withColumn("nrm", F.sqrt(dot(F.col("emb"), F.col("emb"))))
    q = vecs.filter(F.col("clip_id") < 8).select(
        F.col("clip_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    sims = (
        vecs.select(
            F.col("clip_id").alias("neighbor_id"),
            F.col("emb").alias("c_emb"),
            F.col("nrm").alias("c_nrm"),
        )
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_nrm") * F.col("c_nrm")),
                4,
            ).alias("sim_r"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_r").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "sim_r", "rank")
    )


# ---------------------------------------------------------------------------
# Training-data selection (ml.selection): DSIR importance resampling,
# semantic decontamination, cluster-balanced coreset
# ---------------------------------------------------------------------------

# DuckDB twin of ml.selection._bucket: first 6 hex chars of md5(gram) as an
# integer (nibble-by-nibble strpos math, same trick as docs_simhash), mod
# the bucket count. Spark side is conv(substring(md5, 1, 6), 16, 10).
_DSIR_BUCKET_DUCK = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(gram), {c + 1}, 1)) - 1) * {16 ** (5 - c)}"
        for c in range(6)
    )
    + ") % 4096"
)


@register(
    "docs_dsir_sample",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, lang = 'en' AS is_t,
             unnest(CASE WHEN len(w) >= 2 THEN
                      list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
                    ELSE [] END) AS gram
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
    ),
    b AS (SELECT doc_id, is_t, {_DSIR_BUCKET_DUCK} AS bucket FROM g),
    stats AS (
      SELECT bucket, count(*) AS c_r,
             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS c_t
      FROM b GROUP BY bucket
    ),
    per AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(c_t) AS BIGINT) AS t_mass,
             CAST(sum(c_r) AS BIGINT) AS r_mass
      FROM b JOIN stats USING (bucket) GROUP BY doc_id
    )
    SELECT doc_id, n_grams, t_mass, r_mass,
           CAST(t_mass AS DOUBLE) / CAST(r_mass AS DOUBLE) AS importance,
           CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (
            ORDER BY CAST(t_mass AS DOUBLE) / CAST(r_mass AS DOUBLE) DESC,
                     doc_id) AS rank
          FROM per)
    WHERE rank <= 50
    """,
    # r10 slot promotion: took docs_simhash_pairs' driver slot — the
    # selection family's flagship entry, exact-oracle both scales + 10×.
    doc="DSIR importance resampling (ml.selection.dsir_top_k — Xie et al. "
    "2023): rank every document by how much its hashed-bigram feature mass "
    "resembles the target distribution (here lang='en' as the high-quality "
    "proxy) vs the raw corpus, keep the top 50. Importance = t_mass/r_mass "
    "over exact BIGINT bucket-count sums (md5-prefix buckets mod 4096, "
    "engine-portable) — the same ordering signal as the paper's hashed-LM "
    "log-ratio without cross-engine log drift. Plan: one gram explode, a "
    "≤4096-row broadcast stats artifact (the train-once/apply-many half), "
    "one per-doc shuffle. The oracle replays bucket hashing, both count "
    "tables, and the ranking gram-for-gram.",
)
def docs_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.selection import dsir_top_k

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return dsir_top_k(docs, F.col("lang") == "en", k=50, n_buckets=4096)


@register(
    "docs_nb_classify",
    oracle="""
    WITH tr AS (
      SELECT lang = 'en' AS pos, unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id % 2 = 0
    ),
    stats AS (
      SELECT token,
             CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
             CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
      FROM tr GROUP BY token
    ),
    tot AS (
      SELECT CAST(sum(c_pos) AS BIGINT) AS n_pos,
             CAST(sum(c_neg) AS BIGINT) AS n_neg,
             CAST(count(*) AS BIGINT) AS vocab
      FROM stats
    ),
    te AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id % 2 = 1
    ),
    votes AS (
      SELECT te.doc_id,
             CASE WHEN (COALESCE(s.c_pos, 0) + 1) * (t.n_neg + t.vocab)
                     > (COALESCE(s.c_neg, 0) + 1) * (t.n_pos + t.vocab)
                  THEN 1 ELSE 0 END AS v
      FROM te LEFT JOIN stats s USING (token) CROSS JOIN tot t
    ),
    per AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
             CAST(sum(v) AS BIGINT) AS pos_votes
      FROM votes GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_tok, p.pos_votes,
           CAST(p.pos_votes * 2 > p.n_tok AS BIGINT) AS predicted,
           CAST(d.lang = 'en' AS BIGINT) AS actual
    FROM per p JOIN documents d USING (doc_id)
    """,
    # r10 late rotation: took q6_forecast_revenue's driver slot — the
    # selection family's model-based-filtering flagship, exact-oracle at
    # sf0.01/sf0.1 and in the 10x stress set.
    doc="Supervised token-vote text classifier (ml.selection.nb_train / "
    "nb_predict) — the model-based filtering stage of a curation "
    "pipeline (the role fastText quality/language classifiers play in "
    "CCNet and FineWeb-Edu), here trained to predict lang='en' on the "
    "even-doc_id half and scored leakage-free on the odd half. Token t "
    "votes positive iff its add-1-smoothed class-conditional probability "
    "is higher under the positive class, evaluated as the exact BIGINT "
    "cross-multiplication (c_pos+1)·(n_neg+V) > (c_neg+1)·(n_pos+V) — "
    "the same per-token decision boundary as multinomial NB, pooled by "
    "instance-majority vote instead of a log-prob sum (the package's "
    "log-free cross-engine discipline). Plan: the vocabulary-bounded "
    "stats artifact broadcasts onto one token explode of the scoring "
    "corpus + one per-doc aggregate — train-once/serve-many, the corpus "
    "is scanned once. The oracle replays training counts, totals, every "
    "token vote, and the majority rule. Note the driver's synthetic "
    "corpus draws tokens independently of the lang label, so measured "
    "accuracy here sits at the majority baseline BY CONSTRUCTION — this "
    "entry pins the decision rule's cross-engine exactness; "
    "tests/test_ml.py::test_nb_classifier_learns_separable_signal "
    "verifies the classifier actually learns (100%% on a separable "
    "fixture) when token signal exists.",
)
def docs_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.selection import nb_predict, nb_train

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)
    stats, totals = nb_train(train, F.col("lang") == "en")
    pred = nb_predict(test, stats, totals)
    return pred.join(
        test.select(
            "doc_id", (F.col("lang") == "en").cast("bigint").alias("actual")
        ),
        "doc_id",
    ).select("doc_id", "n_tok", "pos_votes", "predicted", "actual")


@register(
    "emb_semantic_decontaminate",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
    b AS (SELECT * FROM n WHERE vec_id < 25),
    c AS (SELECT * FROM n WHERE vec_id >= 25),
    m AS (
      SELECT c.vec_id,
             max(CASE WHEN c.nrm * b.nrm > 0
                      THEN round(list_dot_product(c.emb, b.emb)
                                 / (c.nrm * b.nrm), 4)
                      ELSE 0.0 END) AS max_sim_r
      FROM c CROSS JOIN b GROUP BY c.vec_id
    )
    SELECT vec_id, max_sim_r,
           CAST(max_sim_r >= 0.35 AS BIGINT) AS contaminated
    FROM m
    """,
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
    doc="Embedding-space benchmark decontamination "
    "(ml.selection.semantic_contamination) — the cosine twin of the n-gram "
    "docs_decontaminate entry: per corpus vector, the max 4-decimal-rounded "
    "cosine against a 25-vector benchmark set and a 0/1 flag at 0.35. "
    "N-gram overlap misses paraphrased benchmark leakage; max-cosine "
    "catches it. The benchmark side broadcasts (suites are MBs at any "
    "corpus scale); the corpus is one map-side scan + per-id max — no "
    "corpus shuffle before the reduce.",
)
def emb_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.selection import semantic_contamination

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return semantic_contamination(
        emb.filter(F.col("vec_id") >= 25),
        emb.filter(F.col("vec_id") < 25),
        threshold=0.35,
    )


@register(
    "emb_cluster_coreset",
    oracle="""
    WITH dims AS (
      SELECT label AS cluster, vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
    ),
    cent AS (
      SELECT cluster, i,
             CAST(sum(CAST(x AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS c
      FROM dims GROUP BY cluster, i
    ),
    dist AS (
      SELECT d.cluster, d.vec_id,
             round(sqrt(CAST(sum(CAST((d.x - c.c) * (d.x - c.c)
                                       AS DECIMAL(24,10))) AS DOUBLE)), 4)
               AS dist_r
      FROM dims d JOIN cent c ON c.cluster = d.cluster AND c.i = d.i
      GROUP BY d.cluster, d.vec_id
    )
    SELECT cluster, vec_id, dist_r, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY cluster ORDER BY dist_r, vec_id) AS rank
          FROM dist)
    WHERE rank <= 10
    """,
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
    doc="Cluster-balanced coreset sampling (ml.selection.cluster_coreset): "
    "per cluster, the 10 vectors closest to the cluster centroid — the "
    "standard guard against majority-cluster domination when subsampling "
    "an embedded corpus for curation. Centroids use the package's "
    "DECIMAL-exact mean idiom and the 64-term distance fold sums "
    "DECIMAL(24,10) squared deviations, so Spark's parallel partials and "
    "the oracle agree bit-for-bit regardless of row order; distances are "
    "rounded to 4 decimals with vec_id tiebreak. Plan: posexplode → "
    "n_clusters×dim broadcast centroid artifact → one corpus-keyed "
    "distance shuffle → per-cluster window. Any clustering plugs into "
    "cluster_col — here the corpus labels; ml.similarity k-means "
    "assignment works unchanged.",
)
def emb_cluster_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.selection import cluster_coreset

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return cluster_coreset(emb, m=10, dim=64)


def _leakage_safe_split_oracle() -> str:
    bucket = (
        "('0x' || substr(md5(CAST(split_key AS VARCHAR)), 1, 8))::UBIGINT % 100"
    )
    return (
        _dup_components_cte()
        + f""",
    comp AS (
      SELECT doc_id, min(label) AS component_id FROM reach GROUP BY doc_id
    ),
    keyed AS (
      SELECT d.doc_id, coalesce(c.component_id, d.doc_id) AS split_key
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    )
    SELECT doc_id, split_key,
           CASE WHEN {bucket} < 90 THEN 'train'
                WHEN {bucket} < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM keyed
    """
    )


@register(
    "docs_leakage_safe_split",
    oracle=_leakage_safe_split_oracle(),
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
    doc="Leakage-safe train/val/test split (ml.splits.leakage_safe_split): "
    "the content-addressed 90/5/5 assignment of docs_split_assign, but "
    "hashed on the near-duplicate component head (MinHash-LSH pairs → "
    "connected components) so a near-duplicate of a test doc can never "
    "land in train — the classic silent eval-contamination path of "
    "per-doc splitting. Singletons keep exactly their assign_split "
    "assignment (coalesce to own id). The oracle replays the full chain: "
    "recursive-CTE components + the md5-prefix bucket, per doc. One "
    "corpus-keyed equi-join + a shuffle-free bucket projection on top of "
    "the dedup pipeline the corpus already runs.",
)
def docs_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.splits import leakage_safe_split
    from mempool_dumpster_spark.plans.text_queries import docs_minhash_lsh_pairs

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    comp = duplicate_components(docs_minhash_lsh_pairs(spark, sf_dir))
    return leakage_safe_split(docs, comp).select("doc_id", "split_key", "split")


@register(
    "docs_corpus_card",
    oracle="""
    WITH base AS (
      SELECT lang, source,
             len(string_split(text, ' ')) AS n_tok,
             length(text) AS n_chr,
             md5(text) AS h
      FROM documents
    ),
    tot AS (SELECT count(*) AS n FROM base),
    g AS (
      SELECT CASE WHEN grouping(lang) = 0 THEN 'lang'
                  WHEN grouping(source) = 0 THEN 'source'
                  ELSE 'total' END AS section,
             coalesce(lang, source, 'all') AS key,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             CAST(sum(n_chr) AS BIGINT) AS n_chars,
             CAST(count(DISTINCT h) AS BIGINT) AS n_unique_texts
      FROM base GROUP BY GROUPING SETS ((lang), (source), ())
    )
    SELECT section, key, n_docs, n_tokens, n_chars, n_unique_texts,
           CAST((n_docs * 10000) // tot.n AS BIGINT) AS share_bp
    FROM g, tot
    """,
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
    doc="Corpus card (data-statement summary): per-language, per-source, "
    "and total doc/token/char counts, distinct-text counts (exact dup "
    "rate), and floor-rounded basis-point doc shares — the documents-table "
    "analogue of the reference's summary report sink (common/analyzer.go "
    "renders the mempool equivalent). ONE corpus pass via GROUPING SETS "
    "((lang),(source),()) — Spark expands the sets map-side and "
    "aggregates once instead of three scans; all outputs are exact "
    "integers (share in basis points via integer division) so the "
    "cross-engine hash is exact with zero float discipline needed.",
)
def docs_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.dedup import words

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    base = docs.select(
        "lang",
        "source",
        F.size(words("text")).cast("bigint").alias("n_tok"),
        F.length("text").cast("bigint").alias("n_chr"),
        F.md5("text").alias("h"),
    )
    g = base.groupingSets(
        [["lang"], ["source"], []], "lang", "source"
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum("n_chr").alias("n_chars"),
        F.countDistinct("h").alias("n_unique_texts"),
        F.grouping("lang").alias("__gl"),
        F.grouping("source").alias("__gs"),
    )
    total = base.select(F.count("*").alias("__n"))
    return (
        g.crossJoin(F.broadcast(total))
        .select(
            F.when(F.col("__gl") == 0, "lang")
            .when(F.col("__gs") == 0, "source")
            .otherwise("total")
            .alias("section"),
            F.coalesce("lang", "source", F.lit("all")).alias("key"),
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_unique_texts",
            # `div` = exact BIGINT floor division, matching DuckDB's `//`
            # (a double `/` + cast could round x.999… up at scale)
            F.expr("(n_docs * 10000) div __n").alias("share_bp"),
        )
    )


@register(
    "docs_mix_temperature",
    oracle="""
    WITH c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_docs,
             CAST(round(sqrt(CAST(n_docs AS DOUBLE)), 6) AS DECIMAL(24,6)) AS wd
      FROM c
    ),
    t AS (SELECT sum(wd) AS td FROM w)
    SELECT source, n_docs,
           round(CAST(wd AS DOUBLE) / CAST(td AS DOUBLE), 6) AS weight_r,
           CAST(floor(100000 * (CAST(wd AS DOUBLE) / CAST(td AS DOUBLE)))
                AS BIGINT) AS quota
    FROM w, t
    """,
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
    doc="Temperature-scaled mixing weights (ml.selection.temperature_weights, "
    "alpha=0.5, budget=100k): per-source sampling weight ∝ n^0.5 and the "
    "floor-rounded doc quota — the multilingual/multi-source temperature-"
    "sampling primitive (mT5; UniMax refines it with per-group caps), "
    "complementing the rate-based docs_mix_corpus. The normalizer is an "
    "exact DECIMAL(24,6) sum of 6-decimal-rounded weights, so the one "
    "float division per group sees bit-identical inputs in both engines — "
    "no order-dependent double summation anywhere. |groups|-row state "
    "after one map-side-combined count; corpus size never crosses an "
    "exchange.",
)
def docs_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.ml.selection import temperature_weights

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return temperature_weights(docs, alpha=0.5, budget=100_000)
