"""CLI smoke tests: every subcommand of `python -m mempool_dumpster_spark`
(the reference's cmd/main.go surface) runs end-to-end in-process against the
shared session — merge produces the three sink formats + summary, analyze
renders a report from parquet, collect drains a landing dir, website builds
the index pages."""

from __future__ import annotations

import glob

import pytest

from mempool_dumpster_spark.__main__ import main
from txgen import make_tx, tx_hash_of

TS = 1693785600_000


def test_cli_merge_and_analyze(spark, tmp_path):
    tx_a = make_tx(priv=0xA11CE, tx_type=2, nonce=1)
    tx_b = make_tx(priv=0xB0B, tx_type=0, nonce=2)
    ha, hb = tx_hash_of(tx_a), tx_hash_of(tx_b)
    txs = tmp_path / "txs.csv"
    txs.write_text(f"{TS + 100},{ha},{tx_a}\n{TS + 200},{hb},{tx_b}\n")
    sl = tmp_path / "sourcelog.csv"
    sl.write_text(f"{TS + 100},{ha},alchemy\n{TS + 150},{hb},local\n")
    out = tmp_path / "out"
    blocks = tmp_path / "blocks.parquet"
    spark.createDataFrame(
        [(ha, 18_000_000, TS + 1_000)],
        "hash string, block_number long, block_timestamp_ms long",
    ).write.parquet(str(blocks))

    rc = main(
        [
            "merge", str(txs),
            "--out", str(out),
            "--sourcelog", str(sl),
            "--write-summary",
            "--blocks", str(blocks),
            "--stats",
        ],
        spark=spark,
    )
    assert rc == 0
    merged = spark.read.parquet(str(out / "transactions.parquet"))
    assert {r["hash"] for r in merged.select("hash").collect()} == {ha, hb}
    incl = {r["hash"]: r for r in merged.collect()}
    assert incl[ha]["includedAtBlockHeight"] == 18_000_000  # J3 blocks path
    assert incl[hb]["includedAtBlockHeight"] == 0
    assert (out / "summary.txt").exists()
    assert glob.glob(str(out / "transactions.csv" / "*.csv"))
    assert glob.glob(str(out / "sourcelog.csv" / "*.csv"))

    report = tmp_path / "report.txt"
    rc = main(
        [
            "analyze", str(out / "transactions.parquet"),
            "--out", str(report),
        ],
        spark=spark,
    )
    assert rc == 0
    text = report.read_text()
    assert "[Mempool Dumpster]" in text and "Date: 2023-09-04" in text


def test_cli_collect_drain(spark, tmp_path):
    tx = make_tx(priv=0xFEED, tx_type=2, nonce=9)
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.csv").write_text(f"2023-09-04 00:01:40,{tx},alchemy\n")
    out = tmp_path / "cout"
    rc = main(
        ["collect", "--landing", str(landing), "--out", str(out), "--drain"],
        spark=spark,
    )
    assert rc == 0
    sl = glob.glob(str(out / "sourcelog" / "date=*" / "hour=*" / "*.csv"))
    assert sl, "collector wrote no sourcelog buckets"


def test_cli_website(spark, tmp_path):
    arch = tmp_path / "arch" / "2023-09"
    arch.mkdir(parents=True)
    (arch / "2023-09-04.parquet").write_bytes(b"x" * 128)
    site = tmp_path / "site"
    rc = main(
        ["website", "--root", str(tmp_path / "arch"), "--out", str(site)],
        spark=spark,
    )
    assert rc == 0
    assert (site / "index.html").exists()
    assert (site / "ethereum" / "mainnet" / "2023-09" / "index.html").exists()


def test_cli_compact(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    root = str(tmp_path / "arch")
    df = spark.range(0, 50).select(F.col("id"), F.lit("07").alias("hour"))
    for _ in range(4):
        df.repartition(3).write.mode("append").partitionBy("hour").parquet(root)
    rc = main(
        ["compact", "--root", root, "--quiesce-seconds", "0"],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "'partitions_compacted': 1" in out
    assert spark.read.parquet(root).count() == 200


def test_cli_prep(spark, tmp_path, capsys):
    """prep: filters + dedups + decontaminates + splits a documents parquet
    into split= partitioned output with a manifest. Uses docs long enough
    to pass the Gopher word-count gate, one exact duplicate pair, and one
    doc sharing a 5-gram with the benchmark."""
    import json

    # distinct word-streams per doc so only the INTENDED relations hold:
    # 1==2 exactly; 3 shares a 5-gram with the benchmark; 4 independent
    def stream(salt, n=40):
        return " ".join(f"{salt}w{i % 17} {salt}t{i % 31}" for i in range(n))

    rows = [
        (1, stream("a"), "en", "web", 100),
        (2, stream("a"), "en", "web", 100),   # exact dup of 1
        (3, stream("c") + " beta gamma delta eps zeta", "en", "web", 100),
        (4, stream("d"), "en", "books", 100),
    ]
    docs = tmp_path / "docs.parquet"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(docs))
    bench = tmp_path / "bench.parquet"
    spark.createDataFrame(
        [(99, "beta gamma delta eps zeta", "en", "bench", 25)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(bench))

    out = tmp_path / "prep_out"
    rc = main(
        [
            "prep", str(docs),
            "--out", str(out),
            "--benchmark", str(bench),
            "--redact-pii",
            "--no-gopher",  # synthetic vocab fails mean-word-len gates
        ],
        spark=spark,
    )
    assert rc == 0
    manifest = json.loads((out / "_prep_manifest.json").read_text())
    back = spark.read.parquet(str(out))
    kept = {r["doc_id"] for r in back.select("doc_id").collect()}
    assert 2 not in kept            # exact dup removed (min id kept)
    assert 3 not in kept            # contaminated vs benchmark
    assert 1 in kept and 4 in kept
    assert "split" in back.columns and "text_redacted" in back.columns
    assert sum(manifest["splits"].values()) == len(kept)


def test_cli_prep_bucketed(spark, tmp_path):
    """prep --bucketed TABLE: beside the plain split-partitioned output, a
    doc_id-bucketed catalog table lands at OUT_bucketed; a doc_id
    aggregation over it plans exchange-free."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    docs = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(i, f"body text {i} " * 5, "en", "web", 50) for i in range(30)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(docs))
    out = tmp_path / "prep_out"
    rc = main(
        [
            "prep", str(docs),
            "--out", str(out),
            "--no-gopher", "--no-near-dedup",
            "--bucketed", "prep_cli_b",
            "--bucket-count", "4",
        ],
        spark=spark,
    )
    try:
        assert rc == 0
        tbl = spark.table("prep_cli_b")
        assert tbl.count() == spark.read.parquet(str(out)).count()
        agg = tbl.groupBy("doc_id").agg(F.count("*").alias("n"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            agg.explain("formatted")
        assert "Exchange" not in buf.getvalue(), buf.getvalue()
    finally:
        spark.sql("DROP TABLE IF EXISTS prep_cli_b")


def test_cli_prep_atomic(spark, tmp_path):
    """prep --atomic: the corpus publishes through a manifest-committed
    version; read_committed sees it, plain discovery of the version dir
    works, and re-running advances the version without a partial window."""
    import json

    from mempool_dumpster_spark.sources.manifest import (
        current_version,
        read_committed,
    )

    docs = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(i, f"doc {i} body text here now", "en", "web", 20) for i in range(8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(docs))

    out = tmp_path / "prep_atomic"
    rc = main(
        ["prep", str(docs), "--out", str(out), "--no-gopher",
         "--no-near-dedup", "--atomic"],
        spark=spark,
    )
    assert rc == 0
    assert current_version(str(out))["version"] == 1
    assert read_committed(spark, str(out)).count() == 8
    manifest = json.loads((out / "_prep_manifest.json").read_text())
    assert sum(manifest["splits"].values()) == 8

    rc = main(
        ["prep", str(docs), "--out", str(out), "--no-gopher",
         "--no-near-dedup", "--atomic"],
        spark=spark,
    )
    assert rc == 0
    assert current_version(str(out))["version"] == 2


def test_cli_rollup(spark, tmp_path, capsys):
    """rollup: incremental per-partition archive stats with an optional
    mergeable distinct sketch; second run is a no-op until data changes."""
    from pyspark.sql import functions as F

    root = tmp_path / "arch"
    for h, users in ((0, range(0, 50)), (1, range(25, 75))):
        spark.createDataFrame(
            [(u,) for u in users], "user_id long"
        ).write.parquet(str(root / f"hour={h:02d}"))

    out = tmp_path / "roll"
    rc = main(
        ["rollup", "--root", str(root), "--out", str(out),
         "--distinct-col", "user_id"],
        spark=spark,
    )
    assert rc == 0
    assert "'changed': 2" in capsys.readouterr().out
    roll = spark.read.parquet(str(out))
    assert {r["hour"]: r["n_rows"] for r in roll.collect()} == {0: 50, 1: 50}
    est = roll.agg(
        F.hll_sketch_estimate(F.hll_union_agg("distinct_sk")).alias("d")
    ).collect()[0]["d"]
    assert abs(est - 75) / 75 < 0.05

    rc = main(
        ["rollup", "--root", str(root), "--out", str(out),
         "--distinct-col", "user_id"],
        spark=spark,
    )
    assert rc == 0
    assert "'changed': 0" in capsys.readouterr().out


def test_cli_query(spark, capsys):
    """query: --list enumerates the catalog; running a name prints rows;
    --explain prints a plan; unknown names exit 2."""
    rc = main(["query", "--list"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out and "[oracle]" in out

    rc = main(
        ["query", "q1_pricing_summary", "--sf-dir", "/root/testdata/sf0.001",
         "--limit", "2"],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "l_returnflag" in out

    rc = main(
        ["query", "q1_pricing_summary", "--sf-dir", "/root/testdata/sf0.001",
         "--explain"],
        spark=spark,
    )
    assert rc == 0
    assert "AdaptiveSparkPlan" in capsys.readouterr().out

    assert main(["query", "nope_not_real"], spark=spark) == 2


def test_cli_prep_pack(spark, tmp_path):
    """prep --pack-tokens: the packed companion dataset lands beside the
    corpus with (split, shard, seq_id) sequence keys within budget."""
    docs = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(i, f"doc{i} " + "tok " * (4 + i % 5), "en", "web", 20)
         for i in range(30)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(docs))
    out = tmp_path / "prep_pack"
    rc = main(
        ["prep", str(docs), "--out", str(out), "--no-gopher",
         "--no-near-dedup", "--pack-tokens", "16"],
        spark=spark,
    )
    assert rc == 0
    packed = spark.read.parquet(str(out) + "_packed")
    assert packed.count() == 30
    assert {"split", "shard", "seq_id", "n_tokens"} <= set(packed.columns)


def test_cli_prep_training_order(spark, tmp_path):
    """prep --pack-tokens --training-order SEED: the packed companion
    lands so that reading each split's parquet files IN NAME ORDER
    streams the deterministic epoch permutation — sequences ordered by
    md5(seed|split|shard|seq_id) (recomputed independently here with
    hashlib, the same oracle contract as docs_training_order), members
    of a sequence adjacent and in doc_id order. This is the prep→train
    handoff: no shuffle at training time."""
    import glob
    import hashlib

    import pyarrow.parquet as pq

    docs = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(i, f"doc{i:02d} " + "tok " * (4 + i % 5), "en", "web", 20)
         for i in range(40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(docs))
    out = tmp_path / "prep_order"
    rc = main(
        ["prep", str(docs), "--out", str(out), "--no-gopher",
         "--no-near-dedup", "--pack-tokens", "16",
         "--training-order", "epoch1"],
        spark=spark,
    )
    assert rc == 0

    packed = spark.read.parquet(str(out) + "_packed")
    rows = packed.select("split", "shard", "seq_id", "doc_id").collect()
    assert len(rows) == 40

    def key(r):
        ident = f"epoch1|{r['split']}|{r['shard']}|{r['seq_id']}"
        return hashlib.md5(ident.encode()).hexdigest()

    for split in {r["split"] for r in rows}:
        expected = [
            r["doc_id"]
            for r in sorted(
                (r for r in rows if r["split"] == split),
                key=lambda r: (key(r), r["doc_id"]),
            )
        ]
        on_disk: list[int] = []
        for path in sorted(
            glob.glob(f"{out}_packed/split={split}/part-*.parquet")
        ):
            on_disk.extend(pq.read_table(path).column("doc_id").to_pylist())
        assert on_disk == expected, f"file order != epoch order in {split}"

    # a different seed is a different (but equally deterministic) epoch
    out2 = tmp_path / "prep_order2"
    assert main(
        ["prep", str(docs), "--out", str(out2), "--no-gopher",
         "--no-near-dedup", "--pack-tokens", "16",
         "--training-order", "epoch2"],
        spark=spark,
    ) == 0

    # precondition: --training-order without --pack-tokens is exit 2
    assert main(
        ["prep", str(docs), "--out", str(tmp_path / "x"),
         "--training-order", "epoch1"],
        spark=spark,
    ) == 2


def test_cli_prep_append_incremental(spark, tmp_path):
    """prep --append: base corpus lands atomically with its signature
    artifact; an append batch is gated against it (exact dup dropped,
    fresh doc upserted), both artifacts advance a version, and
    re-appending the same batch is a no-op (signatures were updated)."""
    import json

    from mempool_dumpster_spark.sources.manifest import read_committed

    def doc(i, salt):
        return (f"{salt}{i}", " ".join(f"{salt}w{j}x{i}" for j in range(30)))

    base_docs = tmp_path / "base.parquet"
    spark.createDataFrame(
        [doc(i, "base") for i in range(6)], "doc_id string, text string"
    ).write.parquet(str(base_docs))
    out = str(tmp_path / "corpus")
    rc = main(
        ["prep", str(base_docs), "--out", out, "--no-gopher",
         "--atomic", "--signatures"],
        spark=spark,
    )
    assert rc == 0
    n_base = read_committed(spark, out).count()

    dup_text = " ".join(f"basew{j}x3" for j in range(30))  # == base3's text
    new_docs = tmp_path / "new.parquet"
    spark.createDataFrame(
        [("newdup", dup_text), doc(0, "fresh")],
        "doc_id string, text string",
    ).write.parquet(str(new_docs))
    rc = main(
        ["prep", str(new_docs), "--out", out, "--no-gopher",
         "--atomic", "--append"],
        spark=spark,
    )
    assert rc == 0
    corpus = read_committed(spark, out)
    ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert "fresh0" in ids and "newdup" not in ids
    assert corpus.count() == n_base + 1
    sigs = read_committed(spark, out + "_signatures")
    assert sigs.count() == n_base + 1  # artifact tracks the corpus

    # idempotent: the same batch appends nothing the second time
    rc = main(
        ["prep", str(new_docs), "--out", out, "--no-gopher",
         "--atomic", "--append"],
        spark=spark,
    )
    assert rc == 0
    assert read_committed(spark, out).count() == n_base + 1

    # --append without --atomic is rejected up front
    rc = main(
        ["prep", str(new_docs), "--out", out, "--no-gopher", "--append"],
        spark=spark,
    )
    assert rc == 2


def test_cli_prep_append_heals_stale_signatures_and_packs(spark, tmp_path):
    """Review regressions on --append: (1) a crash between the corpus and
    signature commits leaves the artifact behind — the next append must
    self-heal (recompute signatures for committed docs missing from the
    artifact) so duplicates of the stranded rows still gate; (2)
    --pack-tokens is honored on append runs (the packed companion
    refreshes from the post-append corpus); (3) the corpus stays
    split-partitioned after upsert."""
    import os

    from mempool_dumpster_spark.sources.manifest import (
        current_version,
        read_committed,
        upsert,
    )

    def doc(i, salt):
        return (f"{salt}{i}", " ".join(f"{salt}w{j}x{i}" for j in range(30)))

    base_docs = tmp_path / "base.parquet"
    spark.createDataFrame(
        [doc(i, "base") for i in range(5)], "doc_id string, text string"
    ).write.parquet(str(base_docs))
    out = str(tmp_path / "corpus")
    assert main(
        ["prep", str(base_docs), "--out", out, "--no-gopher",
         "--atomic", "--signatures"],
        spark=spark,
    ) == 0

    # simulate the crash window: a doc lands in the corpus but never in
    # the signature artifact
    stranded_text = " ".join(f"strandw{j}" for j in range(30))
    committed = read_committed(spark, out)
    stranded = spark.createDataFrame(
        [("stranded0", stranded_text, "train")],
        "doc_id string, text string, split string",
    ).select(*committed.columns)
    upsert(spark, out, stranded, ["doc_id"])
    n_after_strand = read_committed(spark, out).count()

    # append a batch containing an exact dup of the STRANDED doc + fresh
    new_docs = tmp_path / "new.parquet"
    spark.createDataFrame(
        [("dupofstranded", stranded_text), doc(0, "fresh")],
        "doc_id string, text string",
    ).write.parquet(str(new_docs))
    assert main(
        ["prep", str(new_docs), "--out", out, "--no-gopher",
         "--atomic", "--append", "--pack-tokens", "64"],
        spark=spark,
    ) == 0
    corpus = read_committed(spark, out)
    ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert "dupofstranded" not in ids      # healed artifact gated it
    assert "fresh0" in ids
    assert corpus.count() == n_after_strand + 1
    sigs = read_committed(spark, out + "_signatures")
    assert sigs.count() == corpus.count()  # heal + append both landed

    # split partitioning survived the upserts
    m = current_version(out)
    assert m["partition_by"] == ["split"]
    vdir = os.path.join(out, m["data_dir"])
    assert any(d.startswith("split=") for d in os.listdir(vdir))

    # the packed companion refreshed on the append run
    packed = read_committed(spark, out + "_packed")
    assert packed.count() > 0


def test_cli_ann_lifecycle(spark, tmp_path, capsys):
    """ann build -> append -> query: the IVF-PQ index lifecycle end-to-end
    through the CLI — train artifacts round-trip through the JSON file,
    the appended batch becomes searchable without retraining, and the
    served top-k equals the inline composition over the union."""
    import json

    rows = []
    for i in range(50):
        axis = i % 3
        vec = [0.05 * ((i * 7 + d) % 5) for d in range(8)]
        vec[axis] += 10.0
        rows.append((i, vec))
    base = spark.createDataFrame(
        rows[:40], "vec_id long, embedding array<float>"
    )
    newer = spark.createDataFrame(
        rows[40:], "vec_id long, embedding array<float>"
    )
    base_p, new_p = tmp_path / "base.parquet", tmp_path / "new.parquet"
    base.write.parquet(str(base_p))
    newer.write.parquet(str(new_p))
    art = tmp_path / "artifacts.json"

    rc = main(
        [
            "ann", "build", str(base_p),
            "--table", "cli_ann_idx", "--artifacts", str(art),
            "--path", str(tmp_path / "idx"),
            "--dim", "8", "--n-cells", "4", "--n-assign", "2",
            "--m", "4", "--k-codes", "8", "--n-iters", "2",
        ],
        spark=spark,
    )
    assert rc == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["index_rows"] == 80  # 40 vectors x n_assign 2
    assert json.load(open(art))["format"] == "ivfpq-index-artifacts-v1"

    # append WITHOUT repeating --dim/--n-assign: both must come from the
    # artifact (build recorded n_assign=2) — the silent-n_assign=1 recall
    # degradation this used to allow is the regression under test
    rc = main(
        [
            "ann", "append", str(new_p),
            "--table", "cli_ann_idx", "--artifacts", str(art),
        ],
        spark=spark,
    )
    assert rc == 0
    appended = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert appended["index_rows"] == 100  # 80 + 10 vectors x n_assign 2

    # an explicit override that contradicts the artifact is a hard error
    with pytest.raises(SystemExit, match="n-assign 1 contradicts"):
        main(
            [
                "ann", "append", str(new_p),
                "--table", "cli_ann_idx", "--artifacts", str(art),
                "--n-assign", "1",
            ],
            spark=spark,
        )
    capsys.readouterr()

    union_p = tmp_path / "union.parquet"
    base.union(newer).write.parquet(str(union_p))
    q_p = tmp_path / "q.parquet"
    base.filter("vec_id < 3").write.parquet(str(q_p))
    out_p = tmp_path / "topk.parquet"
    rc = main(
        [
            "ann", "query", str(union_p),
            "--table", "cli_ann_idx", "--artifacts", str(art),
            "--queries", str(q_p), "--dim", "8",
            "-k", "3", "--nprobe", "2", "--refine", "4",
            "--out", str(out_p),
        ],
        spark=spark,
    )
    assert rc == 0
    served = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in spark.read.parquet(str(out_p)).collect()
    }
    from mempool_dumpster_spark.ml.similarity import (
        centroids_from_json,
        ivfpq_topk,
        pq_codebooks_from_json,
    )

    obj = json.load(open(art))
    inline = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in ivfpq_topk(
            spark.read.parquet(str(union_p)),
            spark.read.parquet(str(q_p)),
            k=3, dim=8, nprobe=2, n_assign=2, refine=4,
            centroids=centroids_from_json(json.dumps(obj["centroids"])),
            codebooks=pq_codebooks_from_json(json.dumps(obj["codebooks"])),
        ).collect()
    }
    assert served == inline and served


def _ann_vec_fixture(spark, tmp_path):
    """Shared 50-vector fixture for the quantized-rung CLI lifecycles:
    three loose axis clusters at dim 8, split 40 base + 10 append."""
    rows = []
    for i in range(50):
        axis = i % 3
        vec = [0.05 * ((i * 7 + d) % 5) for d in range(8)]
        vec[axis] += 10.0
        rows.append((i, vec))
    base = spark.createDataFrame(
        rows[:40], "vec_id long, embedding array<float>"
    )
    newer = spark.createDataFrame(
        rows[40:], "vec_id long, embedding array<float>"
    )
    base_p, new_p = tmp_path / "base.parquet", tmp_path / "new.parquet"
    base.write.parquet(str(base_p))
    newer.write.parquet(str(new_p))
    union_p = tmp_path / "union.parquet"
    base.union(newer).write.parquet(str(union_p))
    q_p = tmp_path / "q.parquet"
    base.filter("vec_id < 3").write.parquet(str(q_p))
    return base_p, new_p, union_p, q_p


def test_cli_ann_sq8_lifecycle(spark, tmp_path, capsys):
    """ann --method sq8 build -> append -> query (r11 verdict #8): the
    SQ8 rung's full CLI lifecycle — the bounds artifact round-trips
    through its sq8-bounds-v1 JSON file, the appended batch becomes
    searchable under the SAME bounds without retraining, and the served
    top-k equals the inline sq8_topk over the union with those bounds
    (bit-identical by construction: shared encode/score expressions)."""
    import json

    base_p, new_p, union_p, q_p = _ann_vec_fixture(spark, tmp_path)
    art = tmp_path / "sq8.json"

    rc = main(
        [
            "ann", "build", str(base_p), "--method", "sq8",
            "--table", "cli_sq8_idx", "--artifacts", str(art),
            "--path", str(tmp_path / "sq8_idx"), "--dim", "8",
        ],
        spark=spark,
    )
    assert rc == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["index_rows"] == 40
    assert json.load(open(art))["format"] == "sq8-bounds-v1"

    # append derives dim from the artifact — no flag needed
    rc = main(
        [
            "ann", "append", str(new_p), "--method", "sq8",
            "--table", "cli_sq8_idx", "--artifacts", str(art),
        ],
        spark=spark,
    )
    assert rc == 0
    appended = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert appended["index_rows"] == 50

    # a contradictory --dim override is a hard error, never a silent
    # re-interpretation of the persisted codes
    with pytest.raises(SystemExit, match="contradicts the bounds artifact"):
        main(
            [
                "ann", "append", str(new_p), "--method", "sq8",
                "--table", "cli_sq8_idx", "--artifacts", str(art),
                "--dim", "16",
            ],
            spark=spark,
        )
    capsys.readouterr()

    out_p = tmp_path / "sq8_topk.parquet"
    rc = main(
        [
            "ann", "query", str(union_p), "--method", "sq8",
            "--table", "cli_sq8_idx", "--artifacts", str(art),
            "--queries", str(q_p), "-k", "3", "--refine", "4",
            "--out", str(out_p),
        ],
        spark=spark,
    )
    assert rc == 0
    served = {
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in spark.read.parquet(str(out_p)).collect()
    }
    from mempool_dumpster_spark.ml.similarity import (
        sq8_bounds_from_json,
        sq8_topk,
    )

    bounds = sq8_bounds_from_json(open(art).read())
    inline = {
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in sq8_topk(
            spark.read.parquet(str(union_p)),
            spark.read.parquet(str(q_p)),
            k=3, dim=8, refine=4, bounds=bounds,
        ).collect()
    }
    assert served == inline and served


def test_cli_ann_bq_lifecycle(spark, tmp_path, capsys):
    """ann --method bq build -> append -> query (r11 verdict #8): the
    1-bit rung's CLI lifecycle — no trained state at all, so the
    artifact JSON carries only the dim contract; appends are always
    valid under the same dim, a mismatched dim fails loudly, and the
    served top-k equals the inline bq_topk over the union."""
    import json

    base_p, new_p, union_p, q_p = _ann_vec_fixture(spark, tmp_path)
    art = tmp_path / "bq.json"

    rc = main(
        [
            "ann", "build", str(base_p), "--method", "bq",
            "--table", "cli_bq_idx", "--artifacts", str(art),
            "--path", str(tmp_path / "bq_idx"), "--dim", "8",
        ],
        spark=spark,
    )
    assert rc == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["index_rows"] == 40
    assert json.load(open(art)) == {
        "format": "bq-index-artifacts-v1", "dim": 8
    }

    rc = main(
        [
            "ann", "append", str(new_p), "--method", "bq",
            "--table", "cli_bq_idx", "--artifacts", str(art),
        ],
        spark=spark,
    )
    assert rc == 0
    appended = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert appended["index_rows"] == 50

    with pytest.raises(SystemExit, match="contradicts the BQ artifact"):
        main(
            [
                "ann", "append", str(new_p), "--method", "bq",
                "--table", "cli_bq_idx", "--artifacts", str(art),
                "--dim", "64",
            ],
            spark=spark,
        )
    capsys.readouterr()

    out_p = tmp_path / "bq_topk.parquet"
    rc = main(
        [
            "ann", "query", str(union_p), "--method", "bq",
            "--table", "cli_bq_idx", "--artifacts", str(art),
            "--queries", str(q_p), "-k", "3", "--refine", "8",
            "--out", str(out_p),
        ],
        spark=spark,
    )
    assert rc == 0
    served = {
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in spark.read.parquet(str(out_p)).collect()
    }
    from mempool_dumpster_spark.ml.similarity import bq_topk

    inline = {
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in bq_topk(
            spark.read.parquet(str(union_p)),
            spark.read.parquet(str(q_p)),
            k=3, dim=8, refine=8,
        ).collect()
    }
    assert served == inline and served
