"""End-to-end corpus preparation: the composition a training-data run
actually executes, as ONE DataFrame plan.

    raw docs ─▶ [structural filters] ─▶ [exact dedup] ─▶ [near-dup
    keep-list] ─▶ [decontamination] ─▶ [PII redaction] ─▶ [split
    assignment] ─▶ train/val/test parquet

Every gate is computed over the corpus once and applied as a doc_id
LEFT SEMI join (or anti-join for contamination), so the gates are
independent sibling stages, not a serial filter chain re-scanning text —
and no gate ever amplifies rows. The only quadratic-risk stage (near-dup
candidate pairs) goes through the bucketed MinHash-LSH band join with
connected components, never an all-pairs compare. Split assignment and
redaction are zero-shuffle projections.

The per-stage queries are individually registered and oracle-checked
(plans/ml_queries.py: docs_gopher_rules, docs_exact_dedup,
docs_dedup_keeplist, docs_decontaminate, docs_redact_pii,
docs_split_assign, docs_prep_pipeline); this module is the composition
surface the CLI `prep` subcommand and cluster jobs call.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mempool_dumpster_spark.ml.decontam import contamination
from mempool_dumpster_spark.ml.dedup import (
    duplicate_components,
    exact_dedup,
    lsh_band_rows,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_sets,
)
from mempool_dumpster_spark.ml.splits import assign_split
from mempool_dumpster_spark.ml.text import gopher_rules, redact_pii


@dataclass(frozen=True)
class PrepConfig:
    gopher: bool = True
    exact: bool = True
    near_dup: bool = True
    decontaminate: bool = True  # applied only when a benchmark df is given
    redact: bool = False
    shingle_k: int = 3
    decontam_n: int = 5
    boundaries: dict[str, int] | None = None  # assign_split default 90/5/5
    # DSIR selection stage (ml.selection): when both are set, keep only
    # the dsir_keep docs ranking highest by importance against the
    # target subset selected by the SQL boolean expression dsir_target
    # (e.g. "lang = 'en'"). Runs AFTER dedup/decontamination so the
    # importance ranking isn't spent on rows later gates would drop.
    dsir_target: str | None = None
    dsir_keep: int | None = None


def near_dup_keeplist(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """MinHash-LSH near-dup keep-list: candidate pairs via the bucketed
    band join, connected components (checkpointed label propagation),
    keep each cluster's min-id head plus every untouched singleton."""
    sh = shingle_sets(docs, text_col=text_col, id_col=id_col, k=k)
    pairs = lsh_candidate_pairs(minhash_signatures(sh))
    comp = duplicate_components(pairs)
    # duplicate_components has fully consumed `pairs` by return (driver
    # union-find collects the edges; the distributed path checkpoints its
    # labels), so the band-rows cache it pinned can be released NOW —
    # under the streaming append gate this function runs once per
    # micro-batch, and an unreleased cache accumulates per batch.
    cached = getattr(pairs, "_lsh_cached_bands", None)
    if cached is not None:
        cached.unpersist()
    heads = comp.filter(F.col("doc_id") == F.col("component_id")).select(
        F.col("doc_id").alias(id_col)
    )
    singletons = docs.join(
        comp.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    ).select(id_col)
    return heads.unionByName(singletons)


def prep_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    config: PrepConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Run the configured gates over `docs` and return the kept rows with
    a `split` column added (and `<text_col>_redacted` + per-kind counts
    when redaction is on). The returned plan is lazy — write it with
    `write_prep_outputs` or consume it directly."""
    cfg = config or PrepConfig()
    gates: list[DataFrame] = []
    if cfg.gopher:
        gates.append(
            gopher_rules(docs, id_col=id_col, text_col=text_col)
            .filter("keep")
            .select(id_col)
        )
    if cfg.exact:
        gates.append(exact_dedup(docs, text_col=text_col, id_col=id_col).select(id_col))
    if cfg.near_dup:
        gates.append(
            near_dup_keeplist(docs, id_col=id_col, text_col=text_col, k=cfg.shingle_k)
        )
    # Intersect the id-only keep-lists FIRST, then gate the text-carrying
    # docs through ONE semi-join (r16). Every gate emits a unique-id
    # frame, so inner-joining them is exact set intersection and the
    # combined semi-join keeps precisely the rows the old per-gate chain
    # kept — but the wide text rows now cross at most one join instead
    # of one per gate (at scale each non-broadcast semi re-shuffled the
    # text; the id∩id joins shuffle ~8 bytes/doc). Guide §8: decide on
    # the lightweight proxy, move the heavy bytes once.
    keep: DataFrame | None = None
    for g in gates:
        keep = g if keep is None else keep.join(g, id_col)
    dirty: DataFrame | None = None
    if cfg.decontaminate and benchmark is not None:
        dirty = (
            contamination(
                docs, benchmark, n=cfg.decontam_n, id_col=id_col, text_col=text_col
            )
            .filter(F.col("contaminated") == 1)
            .select(id_col)
        )
    if keep is not None:
        if dirty is not None:
            keep = keep.join(dirty, id_col, "left_anti")
        out = docs.join(keep, id_col, "left_semi")
    elif dirty is not None:
        out = docs.join(dirty, id_col, "left_anti")
    else:
        out = docs
    if cfg.dsir_target is not None and cfg.dsir_keep is not None:
        from mempool_dumpster_spark.ml.selection import dsir_top_k

        keep = dsir_top_k(
            out,
            F.expr(cfg.dsir_target),
            k=cfg.dsir_keep,
            id_col=id_col,
            text_col=text_col,
        ).select(id_col)
        out = out.join(keep, id_col, "left_semi")
    if cfg.redact:
        out = redact_pii(out, text_col=text_col)
    return assign_split(out, id_col=id_col, boundaries=cfg.boundaries)


def write_prep_outputs(
    prepped: DataFrame,
    out_dir: str,
    compression: str = "gzip",
    atomic: bool = False,
) -> dict[str, int]:
    """Write the prepped corpus partitioned by split and return per-split
    doc counts (the manifest a training run records). One pass: the
    counts come from a post-write read of the written files' footers, not
    a second scan of the input plan.

    atomic=True publishes through sources/manifest.py commit_write — a
    training run that re-preps while the previous corpus is being read
    never exposes a half-written dataset; readers use
    `manifest.read_committed` (or the returned version path)."""
    if atomic:
        from mempool_dumpster_spark.sources.manifest import (
            commit_write,
            read_committed,
        )

        commit_write(
            prepped, out_dir, compression=compression, partition_by=["split"]
        )
        back = read_committed(prepped.sparkSession, out_dir)
    else:
        (
            prepped.write.mode("overwrite")
            .option("compression", compression)
            .partitionBy("split")
            .parquet(out_dir)
        )
        back = prepped.sparkSession.read.parquet(out_dir)
    return {
        r["split"]: r["n"]
        for r in back.groupBy("split").agg(F.count("*").alias("n")).collect()
    }


def corpus_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    n_hashes: int = 64,
) -> DataFrame:
    """The compact dedup artifact a corpus persists beside its data:
    (doc_id, text_hash, m0..m{n-1}) — one row per document, ~100 bytes
    at the old 16-slot default, ~2 KB at the 64-slot default.
    `prep_incremental` joins NEW documents against this table instead of
    re-reading 100 TB of corpus text; docs too short to shingle carry
    NULL signature slots (they still participate in exact dedup via
    text_hash).

    n_hashes=64 is the correctness-first default: the drop gate
    estimates Jaccard as agreeing-slots/n, and at the 0.7 threshold a
    16-slot estimate has σ≈0.11 — a true-0.55 pair had a ~10% chance of
    being silently dropped (data loss). 64 slots halve σ twice (≈0.057);
    the measured false-drop rate at |J−0.7|>0.1 is pinned <1% in
    tests/test_ml.py::test_cross_corpus_filter_false_drop_rate."""
    sigs = minhash_signatures(
        shingle_sets(docs, text_col=text_col, id_col=id_col, k=shingle_k),
        n_hashes=n_hashes,
    )
    hashes = docs.select(
        F.col(id_col).alias("doc_id"), F.md5(text_col).alias("text_hash")
    )
    return hashes.join(sigs, "doc_id", "left")


def artifact_slot_count(signatures: DataFrame) -> int:
    """MinHash slot count of a committed `corpus_signatures` artifact,
    inferred from its m0..m{n-1} columns. The gate MUST compare at the
    width the artifact was built with — slots computed at a different
    hash count compare as noise, and an upsert at a different width is a
    schema mismatch — so `cross_corpus_filter`/`append_batch` adapt to
    this instead of trusting their n_hashes default (which changed 16→64
    in r8; corpora committed at 16 slots must keep appending)."""
    slots = sorted(
        int(c[1:]) for c in signatures.columns if re.fullmatch(r"m\d+", c)
    )
    if not slots or slots != list(range(len(slots))):
        raise ValueError(
            "signature artifact has no contiguous m0..m{n-1} slot "
            f"columns (saw {[c for c in signatures.columns if c.startswith('m')][:8]}...); "
            "rebuild it with corpus_signatures()"
        )
    return len(slots)


def prep_incremental(
    new_docs: DataFrame,
    signatures: DataFrame,
    benchmark: DataFrame | None = None,
    config: PrepConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int | None = None,
    est_jaccard_threshold: float = 0.7,
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Prep NEW documents for APPENDING to an existing prepped corpus:
    all of `prep_corpus`'s within-batch gates (quality, exact dedup,
    near-dup keep-list, decontamination, splits — content-addressed, so
    the new rows' split labels are consistent with the base corpus), plus
    two cross-corpus gates against the persisted `corpus_signatures`
    artifact:

    - exact: new docs whose md5(text) already exists in the corpus are
      dropped (anti-join on the 128-bit hash — one shuffle bounded by
      the new batch plus the artifact, never the corpus text);
    - near-dup: LSH band keys of the new batch join the artifact's band
      keys; each candidate (new, existing) pair's Jaccard is ESTIMATED
      as the fraction of agreeing minhash slots (the standard unbiased
      MinHash estimator), and new docs with any estimate ≥
      `est_jaccard_threshold` are dropped. Shuffle volume is band rows
      (docs × bands) + candidate pairs — never all-pairs, never corpus
      text.

    The new batch is always the keep-side: existing corpus rows are
    immutable (append-only semantics — re-prepping the union is the
    rewrite path)."""
    cfg = config or PrepConfig()
    out = prep_corpus(
        new_docs,
        benchmark=benchmark,
        config=cfg,
        id_col=id_col,
        text_col=text_col,
    )
    return cross_corpus_filter(
        out,
        signatures,
        id_col=id_col,
        text_col=text_col,
        shingle_k=cfg.shingle_k,
        n_hashes=n_hashes,
        near_dup=cfg.near_dup,
        est_jaccard_threshold=est_jaccard_threshold,
        bands=bands,
        rows_per_band=rows_per_band,
    )


def cross_corpus_filter(
    new_docs: DataFrame,
    signatures: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    n_hashes: int | None = None,
    near_dup: bool = True,
    est_jaccard_threshold: float = 0.7,
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """The cross-corpus half of `prep_incremental` (oracle-checked as
    `docs_incremental_dedup`): drop new docs that exactly match an
    existing text_hash, then — when `near_dup` — docs whose LSH-candidate
    MinHash-estimated Jaccard against any existing doc reaches the
    threshold.

    The gate compares at the WIDTH THE ARTIFACT WAS BUILT WITH:
    `n_hashes` is taken from the artifact's m* columns
    (`artifact_slot_count`), not the caller — slots computed at a
    different hash count compare as noise, and the pre-r8 16-slot
    default must keep appending after the default moved to 64. When the
    caller's `bands × rows_per_band` doesn't divide the artifact width,
    the banding is re-derived (preferring the requested rows_per_band);
    the default 16×4=64 mirrors `corpus_signatures`. `shingle_k` still
    must match the artifact's build parameter (not inferable from the
    schema).

    Why 16 bands × 4 rows and not 8×8: the banding is a RECALL
    prefilter, the 64-slot estimate is the precision decision. The
    S-curve midpoint (1/b)^(1/r) sits at ≈0.5 for 16×4, so a true
    J=0.75 near-dup is an LSH candidate with P≈0.998 (8×8 centers at
    0.77 and would let ~43% of J=0.75 dups straight through the gate).
    The extra low-J candidates 16×4 admits are then rejected by the
    estimate filter, whose 64-slot σ at the 0.7 threshold is ≈0.057
    (vs 0.11 at the old 16-slot default) — a true-0.55 pair's chance
    of a false DROP (silent data loss) falls from ~10% to <1%. Both
    directions are pinned by measurement in
    tests/test_ml.py::test_cross_corpus_filter_false_drop_rate."""
    # The artifact's committed width wins over the caller's n_hashes: a
    # corpus whose _signatures was built at the pre-r8 16-slot default
    # must keep appending after the default moved to 64 — without this,
    # the agree-sum references m16..m63 and fails with an opaque
    # missing-column AnalysisException (and the upsert would schema-
    # mismatch). On mismatch the banding is re-derived at the artifact's
    # width, preferring the requested rows_per_band when it divides.
    # `n_hashes` is therefore DEPRECATED (kept for call-site compat);
    # an explicit value that disagrees with the artifact gets a warning
    # instead of the pre-r8 ValueError — the artifact always wins.
    artifact_width = artifact_slot_count(signatures)
    if n_hashes is not None and n_hashes != artifact_width:
        import warnings

        warnings.warn(
            f"cross_corpus_filter: n_hashes={n_hashes} ignored — the "
            f"signature artifact was built with {artifact_width} slots "
            "and the gate always compares at the artifact's width. Drop "
            "the n_hashes argument (deprecated).",
            DeprecationWarning,
            stacklevel=2,
        )
    n_hashes = artifact_width
    if bands * rows_per_band != n_hashes:
        if n_hashes % rows_per_band != 0:
            rows_per_band = next(r for r in (4, 2, 1) if n_hashes % r == 0)
        bands = n_hashes // rows_per_band
    out = (
        new_docs.withColumn("__th", F.md5(text_col))
        .join(
            signatures.select(F.col("text_hash").alias("__th")).distinct(),
            "__th",
            "left_anti",
        )
        .drop("__th")
    )
    cached_base = None
    if near_dup:
        # `out` is referenced TWICE below (as the shingle source for the
        # new batch's signatures AND as the left side of the final
        # anti-join), and its lineage is the caller's full gate chain
        # (prep_incremental: gopher gates, exact-dedup window, the
        # within-batch LSH keep-list) — without a cache one action
        # computes all of that twice. The handle is exposed on the result
        # as `_ccf_cached_base`; append_batch unpersists it after its
        # upserts (same discipline as the LSH band cache).
        cached_base = out.cache()
        out = cached_base
        new_sigs = minhash_signatures(
            shingle_sets(out, text_col=text_col, id_col=id_col, k=shingle_k),
            n_hashes=n_hashes,
        )
        new_bands = lsh_band_rows(
            new_sigs, bands=bands, rows_per_band=rows_per_band
        ).withColumnRenamed("doc_id", "__new_id")
        old_bands = lsh_band_rows(
            signatures.filter(F.col("m0").isNotNull()),
            bands=bands,
            rows_per_band=rows_per_band,
        ).withColumnRenamed("doc_id", "__old_id")
        cand = (
            new_bands.join(old_bands, ["band", "key"])
            .select("__new_id", "__old_id")
            .distinct()
        )
        # ONE parsed F.expr for the agree-sum (r16): the per-slot
        # F.when(F.col==F.col) chain was ~5 py4j round trips per slot —
        # ~320 at the 64-slot artifact width, ~0.5 s of pure driver
        # plan-construction per invocation. Identical expression tree.
        agree = F.expr(
            " + ".join(
                f"(CASE WHEN n.m{i} = o.m{i} THEN 1 ELSE 0 END)"
                for i in range(n_hashes)
            )
        )
        near = (
            cand.join(
                new_sigs.alias("n"),
                F.col("__new_id") == F.col("n.doc_id"),
            )
            .join(
                signatures.alias("o"),
                F.col("__old_id") == F.col("o.doc_id"),
            )
            .withColumn("__est", agree / F.lit(float(n_hashes)))
            .filter(F.col("__est") >= est_jaccard_threshold)
            .select(F.col("__new_id").alias(id_col))
            .distinct()
        )
        out = out.join(near, id_col, "left_anti")
    if cached_base is not None:
        out._ccf_cached_base = cached_base
    return out


def append_batch(
    spark,
    out_dir: str,
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    config: PrepConfig | None = None,
) -> dict[str, int]:
    """The append-one-batch transaction shared by `prep --append` and the
    streaming corpus-append gate (streaming/append.py): gate `docs`
    within-batch AND against the committed corpus's signature artifact,
    then UPSERT the kept rows and their signatures as new manifest
    versions. Returns per-split counts of the appended rows.

    Crash-window self-heal: the corpus and artifact are TWO manifest
    commits (corpus first), so a crash between them can leave the
    artifact behind the corpus. Any committed doc_id missing from the
    artifact gets its signature recomputed and upserted BEFORE the gates
    run — the id anti-join is cheap (two id columns) and the corpus text
    is read only for the missing rows (normally zero).

    Idempotent under retry (foreachBatch is at-least-once): a replayed
    batch's kept rows are now exact text-hash matches in the artifact,
    so the gates drop them and the upserts are no-ops on the same keys.

    Raises FileNotFoundError when `out_dir` has no committed corpus or
    no committed `{out_dir}_signatures` artifact — append requires a
    prior `prep --atomic --signatures`-style base commit."""
    from mempool_dumpster_spark.sources.manifest import (
        read_committed,
        upsert,
    )

    cfg = config or PrepConfig()
    sigs_out = f"{out_dir}_signatures"
    sigs = read_committed(spark, sigs_out)
    # every signature computed in this transaction (heal, gate, upsert)
    # must match the committed artifact's width, not the library default
    slots = artifact_slot_count(sigs)
    committed = read_committed(spark, out_dir)
    missing = committed.join(
        sigs.select("doc_id"), "doc_id", "left_anti"
    ).cache()  # referenced up to three times in the heal path
    if missing.limit(1).count():
        upsert(
            spark,
            sigs_out,
            corpus_signatures(missing, shingle_k=cfg.shingle_k, n_hashes=slots),
            ["doc_id"],
        )
        sigs = read_committed(spark, sigs_out)
    missing.unpersist()
    gated = prep_incremental(docs, sigs, benchmark=benchmark, config=cfg)
    kept = gated.cache()
    try:
        upsert(spark, out_dir, kept, ["doc_id"])
        upsert(
            spark,
            sigs_out,
            corpus_signatures(kept, shingle_k=cfg.shingle_k, n_hashes=slots),
            ["doc_id"],
        )
        return {
            r["split"]: r["n"]
            for r in kept.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
    finally:
        kept.unpersist()
        # release the gate chain's intermediate cache (cross_corpus_filter
        # pins the post-exact-anti-join base; see _ccf_cached_base) — the
        # streaming append gate calls this once per micro-batch
        ccf = getattr(gated, "_ccf_cached_base", None)
        if ccf is not None:
            ccf.unpersist()


def calibrate_cross_corpus_gate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
    est_jaccard_threshold: float = 0.7,
    max_docs: int = 500,
    fractions: tuple[float, ...] = (
        0.30, 0.40, 0.50, 0.60, 0.70, 0.78, 0.84, 0.90, 0.95, 0.98,
    ),
) -> DataFrame:
    """MEASURE the near-dup gate's error rates instead of trusting the
    binomial math: build one controlled-overlap variant per sampled doc
    (keep the first ⌊f·n⌋ words, pad with per-doc-salted filler so
    variants never collide with each other), then for every
    shingle-sharing (variant, base) pair report

      j_exact       exact k-shingle Jaccard (ground truth),
      j_est         the gate's MinHash estimate (agreeing slots / n),
      is_candidate  whether LSH banding surfaced the pair,
      would_drop    the gate's actual decision
                    (is_candidate AND j_est ≥ threshold).

    A pair with j_exact < threshold−0.1 that `would_drop` is a FALSE
    DROP — silent data loss, the failure direction that motivated
    raising n_hashes 16→64 — and a pair with j_exact ≥ threshold+0.15
    that would NOT drop is a FALSE KEEP (a dup leaking into the
    corpus). `gate_error_rates` aggregates both;
    tests/test_ml.py pins them <1% and bench.py republishes the
    measurement every round (the same evidence pattern as the ANN
    recall gates).

    Bounded by construction: `max_docs` caps the sample (deterministic
    doc_id order, not rand()), so pairs ≤ max_docs × shingle-collision
    fan-out and every join is over the sample, never the corpus."""
    base = (
        docs.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.col(text_col).alias("text"),
        )
        .orderBy("doc_id")
        .limit(max_docs)
    )
    arr = F.array(*[F.lit(float(x)) for x in fractions])
    nfr = len(fractions)
    w = F.split(F.col("text"), r"\s+")
    n = F.size(w)
    f = F.element_at(
        arr, ((F.xxhash64("doc_id") % nfr + nfr) % nfr + 1).cast("int")
    )
    m = F.greatest(F.lit(1), F.floor(n * f)).cast("int")
    filler = F.when(
        n > m,
        F.transform(
            F.sequence(F.lit(1), (n - m).cast("int")),
            lambda i: F.concat(
                F.lit("calib"), F.col("doc_id"), F.lit("x"),
                i.cast("string"),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    variants = base.select(
        F.concat(F.lit("v"), F.col("doc_id")).alias("doc_id"),
        F.concat_ws(
            " ", F.concat(F.slice(w, 1, m), filler)
        ).alias("text"),
    )

    sh_new = shingle_sets(variants, k=shingle_k)
    sh_old = shingle_sets(base, k=shingle_k)
    sz_new = sh_new.groupBy("doc_id").agg(F.count("*").alias("__n"))
    sz_old = sh_old.groupBy("doc_id").agg(F.count("*").alias("__n"))
    inter = (
        sh_new.withColumnRenamed("doc_id", "new_id")
        .join(sh_old.withColumnRenamed("doc_id", "old_id"), "shingle")
        .groupBy("new_id", "old_id")
        .agg(F.count("*").alias("__i"))
    )
    exact = (
        inter.join(
            sz_new.select(F.col("doc_id").alias("new_id"), F.col("__n").alias("__na")),
            "new_id",
        )
        .join(
            sz_old.select(F.col("doc_id").alias("old_id"), F.col("__n").alias("__nb")),
            "old_id",
        )
        .select(
            "new_id",
            "old_id",
            (
                F.col("__i")
                / (F.col("__na") + F.col("__nb") - F.col("__i"))
            ).alias("j_exact"),
        )
    )

    sig_new = minhash_signatures(sh_new, n_hashes=n_hashes)
    sig_old = minhash_signatures(sh_old, n_hashes=n_hashes)
    cand = (
        lsh_band_rows(sig_new, bands=bands, rows_per_band=rows_per_band)
        .withColumnRenamed("doc_id", "new_id")
        .join(
            lsh_band_rows(
                sig_old, bands=bands, rows_per_band=rows_per_band
            ).withColumnRenamed("doc_id", "old_id"),
            ["band", "key"],
        )
        .select("new_id", "old_id")
        .distinct()
        .withColumn("is_candidate", F.lit(True))
    )
    agree = sum(
        F.when(F.col(f"n.m{i}") == F.col(f"o.m{i}"), 1).otherwise(0)
        for i in range(n_hashes)
    )
    est = (
        exact.select("new_id", "old_id")
        .join(sig_new.alias("n"), F.col("new_id") == F.col("n.doc_id"))
        .join(sig_old.alias("o"), F.col("old_id") == F.col("o.doc_id"))
        .select(
            "new_id",
            "old_id",
            (agree / F.lit(float(n_hashes))).alias("j_est"),
        )
    )
    return (
        exact.join(est, ["new_id", "old_id"], "left")
        .join(cand, ["new_id", "old_id"], "left")
        .withColumn(
            "is_candidate", F.coalesce("is_candidate", F.lit(False))
        )
        .withColumn(
            # j_est comes off a LEFT join: a pair without an estimate
            # must read as a definite non-drop (False), not NULL — a
            # NULL here silently falls out of gate_error_rates'
            # ~would_drop numerator while staying in the denominator,
            # understating the measured false-keep rate
            "would_drop",
            F.coalesce(
                F.col("is_candidate")
                & (F.col("j_est") >= F.lit(est_jaccard_threshold)),
                F.lit(False),
            ),
        )
    )


def gate_error_rates(
    pairs: DataFrame,
    est_jaccard_threshold: float = 0.7,
    drop_margin: float = 0.1,
    keep_margin: float = 0.15,
) -> dict:
    """Collapse a `calibrate_cross_corpus_gate` frame to the two pinned
    rates (one bounded aggregate, driver gets five numbers):

      false_drop_rate  P(would_drop | j_exact < τ − drop_margin)
      false_keep_rate  P(¬would_drop | j_exact ≥ τ + keep_margin)
    """
    lo = est_jaccard_threshold - drop_margin
    hi = est_jaccard_threshold + keep_margin
    r = pairs.agg(
        F.count(F.when(F.col("j_exact") < lo, 1)).alias("n_low"),
        F.count(
            F.when((F.col("j_exact") < lo) & F.col("would_drop"), 1)
        ).alias("n_false_drop"),
        F.count(F.when(F.col("j_exact") >= hi, 1)).alias("n_high"),
        F.count(
            F.when((F.col("j_exact") >= hi) & ~F.col("would_drop"), 1)
        ).alias("n_false_keep"),
    ).collect()[0]
    return {
        "n_pairs_low": r["n_low"],
        "false_drop_rate": (
            r["n_false_drop"] / r["n_low"] if r["n_low"] else None
        ),
        "n_pairs_high": r["n_high"],
        "false_keep_rate": (
            r["n_false_keep"] / r["n_high"] if r["n_high"] else None
        ),
    }


def write_prep_bucketed(
    prepped: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 32,
    id_col: str = "doc_id",
) -> None:
    """Land the prepped corpus as a doc_id-BUCKETED catalog table
    (partitioned by split above the buckets) — the 100 TB layout for
    everything that happens to a corpus after prep: re-running a dedup
    gate, joining quality/embedding features, decontaminating against a
    new benchmark, or packing are all doc_id equi-joins/aggregations, and
    against a bucketed corpus they plan with ZERO Exchange on the corpus
    side (plan-guarded in tests/test_bucketed.py). The hash shuffle is
    paid once here, at write time — the same amortization
    `write_backfill_bucketed` gives the mempool tables.

    Reads must go through the catalog (`spark.table(table)` /
    `read_bucketed`); `spark.read.parquet(path)` silently drops the
    bucket spec."""
    from mempool_dumpster_spark.sources.bucketed import write_bucketed

    write_bucketed(
        prepped,
        table,
        bucket_col=id_col,
        n_buckets=n_buckets,
        sort_cols=[id_col],
        path=path,
        partition_cols=["split"],
    )


def pack_prepped(
    prepped: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str | None = None,
    n_shards: int = 64,
) -> DataFrame:
    """Pack a prepped corpus (output of `prep_corpus`, carrying `split`)
    into fixed-token-budget training sequences — sharded WITHIN each
    split, so no sequence ever mixes train/val/test rows and parallelism
    is split × shard. Token counts are whitespace words over the text a
    training run actually consumes: `text_redacted` when the redaction
    pass produced it, else `text` (override with text_col=; swap in
    `ml.text.bpe_encode`'s n_bpe_tokens upstream for tokenizer-exact
    budgets). Sequence identity is (split, shard, seq_id)."""
    from mempool_dumpster_spark.ml.packing import pack_sequences
    from mempool_dumpster_spark.ml.splits import split_bucket
    from mempool_dumpster_spark.ml.text import token_count

    if text_col is None:
        text_col = (
            "text_redacted" if "text_redacted" in prepped.columns else "text"
        )
    if "shard" in prepped.columns:
        # same contract as pack_sequences' auto-shard: never silently
        # clobber a caller's shard column
        raise ValueError(
            "input already has a 'shard' column; pack with "
            "ml.packing.pack_sequences(partition_cols=['split', 'shard']) "
            "directly to use it"
        )
    df = prepped.withColumn("n_tokens", token_count(text_col)).withColumn(
        "shard", split_bucket(id_col, n_buckets=n_shards).cast("long")
    )
    return pack_sequences(
        df,
        max_tokens=max_tokens,
        token_col="n_tokens",
        id_col=id_col,
        partition_cols=["split", "shard"],
    )
