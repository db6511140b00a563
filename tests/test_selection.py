"""Unit tests for ml.selection — DSIR importance resampling, semantic
decontamination, cluster-balanced coreset (semantics beyond the DuckDB
oracle parity the selfcheck sweep already enforces)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mempool_dumpster_spark.ml.selection import (
    cluster_coreset,
    dsir_importance,
    dsir_top_k,
    semantic_contamination,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # Target docs (is_t) share the distinctive bigrams of "alpha beta gamma";
    # doc 10 is made of those bigrams, doc 11 of never-in-target bigrams,
    # doc 12 mixes both, doc 13 is a single word (no bigram evidence).
    rows = [
        (0, "alpha beta gamma alpha beta", "t"),
        (1, "alpha beta gamma delta", "t"),
        (2, "beta gamma alpha beta", "t"),
        (10, "alpha beta gamma", "r"),
        (11, "zig zag zog zig zag", "r"),
        (12, "alpha beta zig zag", "r"),
        (13, "solo", "r"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, grp string")


def test_dsir_importance_orders_target_like_docs_first(corpus):
    out = dsir_importance(corpus, F.col("grp") == "t", n_buckets=4096)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    # no bigrams -> no row (single-word doc carries no feature evidence)
    assert 13 not in got
    # every doc's raw mass covers at least its own gram instances
    for r in got.values():
        assert r["r_mass"] >= r["n_grams"] >= 1
        assert 0.0 <= r["importance"] <= 1.0
    # target-like > mixed > target-free
    assert got[10]["importance"] > got[12]["importance"] > got[11]["importance"]
    # doc 11's bigrams never occur in a target doc: only its own instances
    # (and any md5-bucket collisions) contribute, so t_mass must be 0 here
    assert got[11]["t_mass"] == 0 and got[11]["importance"] == 0.0


def test_dsir_top_k_rank_is_deterministic(corpus):
    out = dsir_top_k(corpus, F.col("grp") == "t", k=3).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    ordered = sorted(
        out, key=lambda r: (-r["importance"], r["doc_id"])
    )
    assert [r["doc_id"] for r in out] == [r["doc_id"] for r in ordered]


@pytest.fixture(scope="module")
def planted_vectors(spark):
    # benchmark = axis vectors e0, e1; corpus: 100 == e0 (leaked copy),
    # 101 orthogonal to both, 102 at cos 0.6 from e0
    dim = 4
    e = lambda i: [1.0 if j == i else 0.0 for j in range(dim)]
    rows = [
        (0, e(0)),
        (1, e(1)),
        (100, e(0)),
        (101, e(2)),
        (102, [0.6, 0.0, 0.8, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_contamination_flags_leaked_vectors(planted_vectors):
    bench = planted_vectors.filter(F.col("vec_id") < 100)
    corp = planted_vectors.filter(F.col("vec_id") >= 100)
    got = {
        r["vec_id"]: r.asDict()
        for r in semantic_contamination(corp, bench, threshold=0.5).collect()
    }
    assert got[100]["max_sim_r"] == 1.0 and got[100]["contaminated"] == 1
    assert got[101]["max_sim_r"] == 0.0 and got[101]["contaminated"] == 0
    assert got[102]["max_sim_r"] == 0.6 and got[102]["contaminated"] == 1


def test_semantic_contamination_zero_norm_vectors(spark):
    """A zero vector has no direction: its cosine is defined as 0 on both
    sides of the join, so the row stays visible to `contaminated == 0`
    filters instead of becoming NULL (which matches neither flag)."""
    bench = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0])],  # one real, one zero-norm
        "vec_id long, embedding array<float>",
    )
    corp = spark.createDataFrame(
        [(100, [0.0, 0.0]), (101, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: r.asDict()
        for r in semantic_contamination(corp, bench, threshold=0.5).collect()
    }
    assert got[100]["max_sim_r"] == 0.0 and got[100]["contaminated"] == 0
    assert got[101]["max_sim_r"] == 1.0 and got[101]["contaminated"] == 1

    # empty benchmark: every corpus row comes back clean, never an empty
    # frame (which would drop the corpus under a contaminated==0 keep)
    got = {
        r["vec_id"]: r.asDict()
        for r in semantic_contamination(
            corp, bench.filter("vec_id > 999"), threshold=0.5
        ).collect()
    }
    assert set(got) == {100, 101}
    assert all(r["contaminated"] == 0 and r["max_sim_r"] == 0.0 for r in got.values())


def test_cluster_coreset_rejects_wrong_width(spark):
    """dim is a validation contract: a ragged row fails the job loudly
    instead of silently smearing the posexplode index space."""
    vecs = spark.createDataFrame(
        [(0, 0, [1.0, 2.0]), (1, 0, [1.0, 2.0, 3.0])],
        "vec_id long, label int, embedding array<float>",
    )
    with pytest.raises(Exception, match="expected 2-wide|USER_RAISED"):
        cluster_coreset(vecs, m=1, dim=2).collect()


def test_cluster_coreset_picks_centroid_neighbors(spark):
    # cluster 0: three points on a line, centroid at x=1 -> nearest is the
    # middle point; cluster 1: two coincident points, both dist 0, tiebreak id
    rows = [
        (0, 0, [0.0, 0.0]),
        (1, 0, [1.0, 0.0]),
        (2, 0, [2.0, 0.0]),
        (10, 1, [5.0, 5.0]),
        (11, 1, [5.0, 5.0]),
    ]
    vecs = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    out = cluster_coreset(vecs, m=2, dim=2).collect()
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    assert sorted(by_cluster) == [0, 1]
    c0 = sorted(by_cluster[0], key=lambda r: r["rank"])
    assert [r["vec_id"] for r in c0] == [1, 0]  # center first, tiebreak id
    assert c0[0]["dist_r"] == 0.0 and c0[1]["dist_r"] == 1.0
    c1 = sorted(by_cluster[1], key=lambda r: r["rank"])
    assert [r["vec_id"] for r in c1] == [10, 11]
    assert all(r["dist_r"] == 0.0 for r in c1)
    # balanced: never more than m per cluster
    assert all(len(v) <= 2 for v in by_cluster.values())


def test_dsir_artifact_roundtrip_and_apply_parity(spark, corpus):
    from mempool_dumpster_spark.ml.selection import (
        dsir_apply,
        dsir_bucket_stats,
        dsir_stats_from_json,
        dsir_stats_to_json,
    )

    stats = dsir_bucket_stats(corpus, F.col("grp") == "t", n_buckets=4096)
    payload = dsir_stats_to_json(stats, n=2, n_buckets=4096)
    # bit-for-bit: serializing the deserialized frame yields the same JSON
    back, n, n_buckets = dsir_stats_from_json(spark, payload)
    assert (n, n_buckets) == (2, 4096)
    assert dsir_stats_to_json(back, n, n_buckets) == payload

    # scoring the training corpus with its own artifact == inline training
    inline = {
        r["doc_id"]: r.asDict()
        for r in dsir_importance(corpus, F.col("grp") == "t").collect()
    }
    applied = {
        r["doc_id"]: r.asDict()
        for r in dsir_apply(corpus, back, n=n, n_buckets=n_buckets).collect()
    }
    assert applied == inline

    # the triple form pins the artifact's own n/n_buckets — identical
    # scores with no parameters to get wrong, and a contradicting
    # explicit value is a hard error (a silent mismatch hashes every
    # gram into the wrong-but-populated bucket space: confidently
    # wrong scores, not zeros)
    triple = dsir_stats_from_json(spark, payload)
    applied_t = {
        r["doc_id"]: r.asDict() for r in dsir_apply(corpus, triple).collect()
    }
    assert applied_t == inline
    with pytest.raises(ValueError, match="contradicts"):
        dsir_apply(corpus, triple, n_buckets=8192)

    # unseen grams carry no mass: a doc of never-trained words scores 0.0
    new = spark.createDataFrame(
        [(99, "qqq www eee rrr")], "doc_id long, text string"
    )
    got = dsir_apply(new, back).collect()
    assert len(got) == 1
    r = got[0].asDict()
    assert r["t_mass"] == 0 and r["r_mass"] == 0 and r["importance"] == 0.0
    assert r["n_grams"] == 3


def test_prep_corpus_dsir_stage(spark, corpus):
    from mempool_dumpster_spark.ml.prep import PrepConfig, prep_corpus

    # disable the other gates so the DSIR stage's effect is isolated;
    # grp serves as the target predicate column
    cfg = PrepConfig(
        gopher=False,
        exact=False,
        near_dup=False,
        dsir_target="grp = 't'",
        dsir_keep=3,
    )
    kept = prep_corpus(corpus, config=cfg)
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    expected = sorted(
        r["doc_id"]
        for r in dsir_top_k(corpus, F.col("grp") == "t", k=3).collect()
    )
    assert ids == expected
    assert "split" in kept.columns  # selection composes with the split stage


def test_prep_cli_rejects_half_dsir_flags(tmp_path, corpus):
    from mempool_dumpster_spark.__main__ import build_parser, cmd_prep

    src = str(tmp_path / "docs.parquet")
    corpus.write.parquet(src)
    args = build_parser().parse_args(
        ["prep", src, "--out", str(tmp_path / "out"), "--dsir-keep", "3"]
    )
    assert cmd_prep(args, spark=corpus.sparkSession) == 2


def test_leakage_safe_split_clusters_share_split(spark):
    from mempool_dumpster_spark.ml.splits import assign_split, leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id long, text string"
    )
    # components: {0,7,13} headed by 0, {20,21} headed by 20
    comp = spark.createDataFrame(
        [(0, 0), (7, 0), (13, 0), (20, 20), (21, 20)],
        "doc_id long, component_id long",
    )
    out = {r["doc_id"]: r.asDict() for r in leakage_safe_split(docs, comp).collect()}
    assert {out[i]["split"] for i in (0, 7, 13)} == {out[0]["split"]}
    assert out[20]["split"] == out[21]["split"]
    assert all(out[i]["split_key"] == 0 for i in (0, 7, 13))
    # singletons keep exactly the per-doc content-addressed assignment
    plain = {
        r["doc_id"]: r["split"] for r in assign_split(docs).collect()
    }
    for i in out:
        if i not in (0, 7, 13, 20, 21):
            assert out[i]["split"] == plain[i] and out[i]["split_key"] == i


def test_corpus_card_sections_consistent(spark):
    from mempool_dumpster_spark.plans.registry import all_queries

    out = all_queries()["docs_corpus_card"](spark, "/root/testdata/sf0.001")
    rows = [r.asDict() for r in out.collect()]
    by_sec: dict[str, list] = {}
    for r in rows:
        by_sec.setdefault(r["section"], []).append(r)
    assert set(by_sec) == {"lang", "source", "total"}
    total = by_sec["total"][0]
    assert total["key"] == "all"
    # each section partitions the corpus: doc/token sums equal the total
    for sec in ("lang", "source"):
        assert sum(r["n_docs"] for r in by_sec[sec]) == total["n_docs"]
        assert sum(r["n_tokens"] for r in by_sec[sec]) == total["n_tokens"]
        # floor-rounded shares never exceed 10000 in aggregate
        assert sum(r["share_bp"] for r in by_sec[sec]) <= 10000
    assert total["share_bp"] == 10000
    assert total["n_unique_texts"] <= total["n_docs"]


def test_temperature_weights_interpolates_natural_and_uniform(spark):
    from mempool_dumpster_spark.ml.selection import temperature_weights

    docs = spark.createDataFrame(
        [(i, "a" if i < 90 else "b") for i in range(100)],
        "doc_id long, source string",
    )
    nat = {r["source"]: r for r in temperature_weights(docs, alpha=1.0).collect()}
    sqr = {r["source"]: r for r in temperature_weights(docs, alpha=0.5).collect()}
    uni = {r["source"]: r for r in temperature_weights(docs, alpha=0.0).collect()}
    assert abs(nat["a"]["weight_r"] - 0.9) < 1e-6
    assert abs(uni["a"]["weight_r"] - 0.5) < 1e-6
    # 0<alpha<1 up-samples the small group relative to natural proportions
    assert nat["b"]["weight_r"] < sqr["b"]["weight_r"] < uni["b"]["weight_r"]
    # quotas never exceed the budget in aggregate (floor rounding)
    for d in (nat, sqr, uni):
        assert sum(r["quota"] for r in d.values()) <= 1_000_000


def test_selection_plan_guards(spark, corpus):
    """Pin the 100 TB shapes: DSIR's stats join must be a broadcast hash
    join (never a corpus shuffle on the bucket key), semantic
    contamination must not shuffle the corpus before the per-id max, and
    cluster_coreset's centroid join must broadcast."""
    plan_of = lambda df: df._jdf.queryExecution().executedPlan().toString()

    p = plan_of(dsir_importance(corpus, F.col("grp") == "t"))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "Cartesian" not in p

    vecs = corpus.sparkSession.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    p = plan_of(
        semantic_contamination(
            vecs.filter("vec_id >= 4"), vecs.filter("vec_id < 4"), 0.5
        )
    )
    # the only join is the broadcast NLJ against the benchmark side; the
    # single Exchange is the per-id max aggregate
    assert "BroadcastNestedLoopJoin" in p and "SortMergeJoin" not in p
    assert p.count("Exchange hashpartitioning") <= 2  # partial+final agg

    lv = corpus.sparkSession.createDataFrame(
        [(i, i % 2, [float(i), 0.0]) for i in range(8)],
        "vec_id long, label int, embedding array<float>",
    )
    p = plan_of(cluster_coreset(lv, m=2, dim=2))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "Cartesian" not in p


def test_dsir_partition_invariance(spark, corpus):
    """Integer masses make the score independent of physical layout —
    the property that lets any cluster reproduce the ranking."""
    base = {
        r["doc_id"]: r.asDict()
        for r in dsir_importance(corpus, F.col("grp") == "t").collect()
    }
    for parts in (1, 7):
        got = {
            r["doc_id"]: r.asDict()
            for r in dsir_importance(
                corpus.repartition(parts), F.col("grp") == "t"
            ).collect()
        }
        assert got == base
