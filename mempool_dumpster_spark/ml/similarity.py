"""Similarity search over embedding columns (`array<float>`).

Two tiers:
- `cosine_topk` — brute-force exact baseline: broadcast query set × full
  scan, JVM-side zip_with/aggregate dot products, per-query top-k window.
  Right whenever the query set is small (the scan is one pass regardless).
- `lsh_bucketed_topk` — random-hyperplane LSH: sign-bit signatures bucket
  both sides; candidates come from a bucket equi-join, then exact cosine
  re-rank. The 100 TB path when BOTH sides are large: shuffle ∝ rows ×
  tables, never |Q|×|C|. Hyperplanes are derived deterministically from a
  seed (md5-based), so plans are reproducible run-to-run — no RNG state.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(u: Column, v: Column) -> Column:
    """Sequential fold — deterministic fp result for a given array order."""
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(u: Column) -> Column:
    return F.sqrt(dot(u, u))


def with_unit_vector(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Pre-normalize once so cosine = dot downstream."""
    e = _as_double(emb_col)
    return df.withColumn("__norm", norm(e)).withColumn(
        "unit", F.transform(e, lambda x: x / F.col("__norm"))
    ).drop("__norm")


def cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query → (query_id, neighbor_id, sim,
    rank). Query side is broadcast; candidate scan is a single pass."""
    c = with_unit_vector(candidates, emb_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("unit").alias("c_unit")
    )
    q = with_unit_vector(queries, emb_col).select(
        F.col(id_col).alias("query_id"), F.col("unit").alias("q_unit")
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            dot(F.col("q_unit"), F.col("c_unit")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: str = "lsh") -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes: components are
    md5-derived uniform values in [-1, 1). Seeded → reproducible plans."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()
            (u,) = struct.unpack(">Q", h[:8])
            row.append(u / 2**63 - 1.0)
        planes.append(row)
    return planes


def simhash_signature(emb_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature: bit p = (emb · plane_p) > 0, packed into a long."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bit = (dot(emb_col, lit_plane) > 0).cast("long")
        sig = sig + bit * F.lit(2**p).cast("long")
    return sig


def lsh_bucketed_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: `n_tables` independent sign-bit signatures; a pair
    is a candidate when any table's full signature matches; exact cosine
    re-rank on candidates. Recall rises with n_tables, cost with bucket
    collision rate — both deterministic for a fixed seed."""
    c = with_unit_vector(candidates, emb_col)
    q = with_unit_vector(queries, emb_col)
    tables = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=f"t{t}")
        tables.append(
            (
                c.select(
                    F.col(id_col).alias("neighbor_id"),
                    F.col("unit").alias("c_unit"),
                    simhash_signature(F.col("unit"), planes).alias("bucket"),
                    F.lit(t).alias("table"),
                ),
                q.select(
                    F.col(id_col).alias("query_id"),
                    F.col("unit").alias("q_unit"),
                    simhash_signature(F.col("unit"), planes).alias("bucket"),
                    F.lit(t).alias("table"),
                ),
            )
        )
    c_all = tables[0][0]
    q_all = tables[0][1]
    for ct, qt in tables[1:]:
        c_all = c_all.unionByName(ct)
        q_all = q_all.unionByName(qt)
    cand = (
        c_all.join(q_all, ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_unit", "c_unit")
        .distinct()
    )
    sims = cand.select(
        "query_id", "neighbor_id", dot(F.col("q_unit"), F.col("c_unit")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
