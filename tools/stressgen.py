"""Deterministic >sf0.1 stress-corpus generator (r8 verdict #2).

Builds a scaled documents/embeddings dataset from the driver's sf0.1
fixtures — factor× the rows, same schema, derived with SEEDLESS
deterministic column transforms (no rand(), no time) so every run of
this script produces byte-equivalent content:

- documents: `factor` salted copies. Copy 0 is the base corpus verbatim.
  For c > 0, doc_id' = doc_id + c·1_000_000 and
    · doc_id % 97 == 0  → text kept VERBATIM (cross-copy EXACT dups),
    · doc_id % 50 == c  → every 11th word salted (cross-copy NEAR dups,
      ~75% shared 3-gram shingles — LSH candidates),
    · otherwise         → every word salted with the copy id (independent
      content; shares no shingles with any other copy).
  Dup structure therefore grows LINEARLY with factor — the volume and
  hot-bucket pressure scale 10×, while exact DuckDB oracles (shingle
  self-joins) stay feasible. A quadratic variant (all copies near-dup)
  makes the n-gram oracles quadratically slower in factor, which tests
  the oracle, not the engine.
- embeddings: factor copies, vec_id' = vec_id + c·100_000; copy 0
  verbatim, later copies perturbed per-component by c·0.001·((i mod 5)−2)
  — near-identical vectors stress the ANN/semantic-dedup candidate paths.
- events / lineitem / orders (r17, for the bench's sf1 quiet query tier):
  `factor` copies with key columns shifted per copy (event_id/user_id
  + c·10M; l_orderkey/o_orderkey + c·10M) and every other column
  verbatim — orderkey joins stay consistent within a copy, dimension
  joins (custkey, partkey, suppkey) fan out 10× onto the unchanged dims,
  and per-key row-count distributions are copy-invariant (no synthetic
  skew). Deterministic and linear in factor, like documents.
- the remaining tables (dims: region/nation/customer/supplier/part) are
  copied from the base dir unchanged, which keeps the sf dir complete
  for tools/selfcheck.py.

Usage: python tools/stressgen.py [base_sf_dir] [out_dir] [factor]
Defaults: /root/testdata/sf0.1 /tmp/spark_graft_sf1 10
"""

from __future__ import annotations

import os
import shutil
import sys

COPIED_TABLES = [
    "region", "nation", "customer", "supplier", "part",
]

#: fact tables scaled factor× by shifting their key columns per copy
#: (value columns verbatim; +c·10M keeps copies disjoint at any factor
#: this harness uses — base keys top out ~6M at sf0.1·100×)
SHIFTED_TABLES: dict[str, list[str]] = {
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
}
KEY_SHIFT = 10_000_000

#: generator layout version, written to `<out>/_GENVER`: bumped when the
#: derived corpus gains tables/columns, so consumers that cache the dir
#: (bench.py's sf1 query tier) can detect a stale pre-bump derivation
#: and regenerate instead of silently reading the old layout. 2 = r17
#: (scaled events/lineitem/orders added); 3 = r17 (≤8 MiB row groups —
#: single-group files decode on one task, see _write_single_parquet).
GENVER = 3


def _write_single_parquet(df, path: str) -> None:
    """Write as ONE parquet FILE (not a directory): the sf fixtures are
    single files and tools/selfcheck.py's oracle reads them as such.

    Row groups are capped at 2 MiB of writer-buffered bytes (r17,
    GENVER 3; parquet.block.size — default 128 MiB): a parquet file is
    decodable only at ROW-GROUP granularity, so the pre-r17 single-group
    files (6 M rows in one group for 10× lineitem) pinned every scan's
    decode to ONE task no matter how many byte-range splits Spark
    planned — guide §2.5's unsplittable-input skew, and it flattened
    the sf1 tier's core-scaling signal. ~2 MiB groups give the 10×
    fact tables dozens of independently decodable groups (each still
    MBs — not small-file pathology), and the preceding
    repartitionByRange keeps rows clustered by key so per-group min/max
    stats stay selective."""
    import glob

    tmp = f"{path}.__tmpdir__"
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("parquet.block.size", str(2 * 1024 * 1024))
        .parquet(tmp)
    )
    (part,) = glob.glob(f"{tmp}/part-*.parquet")
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.replace(part, path)
    shutil.rmtree(tmp)


def generate(spark, base: str, out: str, factor: int = 10) -> dict:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    for t in COPIED_TABLES:
        shutil.copyfile(f"{base}/{t}.parquet", f"{out}/{t}.parquet")

    copies0 = spark.range(factor).withColumnRenamed("id", "c")
    for t, keys in SHIFTED_TABLES.items():
        df = spark.read.parquet(f"{base}/{t}.parquet")
        cols = [
            (F.col(k) + F.col("c") * KEY_SHIFT).cast("long").alias(k)
            if k in keys
            else F.col(k)
            for k in df.columns
        ]
        big = (
            df.crossJoin(copies0)
            .select(*cols)
            .repartitionByRange(32, *keys)
        )
        _write_single_parquet(big, f"{out}/{t}.parquet")

    docs = spark.read.parquet(f"{base}/documents.parquet")
    copies = spark.range(factor).withColumnRenamed("id", "c")
    w = F.split(F.col("text"), " ")
    salted_all = F.concat_ws(
        " ",
        F.transform(w, lambda x: F.concat(F.concat_ws("", F.lit("c"), F.col("c").cast("string"), F.lit("_")), x)),
    )
    salted_11 = F.concat_ws(
        " ",
        F.transform(
            w,
            lambda x, i: F.when(
                i % 11 == 0,
                F.concat(F.concat_ws("", F.lit("n"), F.col("c").cast("string"), F.lit("_")), x),
            ).otherwise(x),
        ),
    )
    text2 = (
        F.when(F.col("c") == 0, F.col("text"))
        .when(F.col("doc_id") % 97 == 0, F.col("text"))
        .when(F.col("doc_id") % 50 == F.col("c"), salted_11)
        .otherwise(salted_all)
    )
    big_docs = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("c") * 1_000_000).alias("doc_id"),
            text2.alias("text"),
            "lang",
            "source",
            F.length(text2).cast("long").alias("n_chars"),
        )
        .repartitionByRange(32, "doc_id")
    )
    _write_single_parquet(big_docs, f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    pert = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x.cast("double")
            + F.col("c").cast("double") * 0.001 * ((i % 5) - 2).cast("double")
        ).cast("float"),
    )
    big_emb = (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("c") * 100_000).alias("vec_id"),
            F.when(F.col("c") == 0, F.col("embedding")).otherwise(pert).alias("embedding"),
            "label",
        )
        .repartitionByRange(16, "vec_id")
    )
    _write_single_parquet(big_emb, f"{out}/embeddings.parquet")

    with open(f"{out}/_GENVER", "w") as f:
        f.write(str(GENVER))
    return {
        "documents": spark.read.parquet(f"{out}/documents.parquet").count(),
        "embeddings": spark.read.parquet(f"{out}/embeddings.parquet").count(),
    }


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mempool_dumpster_spark.session import get_spark

    spark = get_spark("stressgen", shuffle_partitions=32)
    counts = generate(spark, base, out, factor)
    print(f"wrote {out}: {counts}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
