"""Deterministic dataset splitting — the train/val/test primitive every
training-data pipeline needs in front of the dedup/filter stages this
package already provides (no reference twin; this is part of the
LLM-pipeline extension surface, like ml/dedup and ml/text).

Spark's `randomSplit` is seed-dependent AND partitioning-dependent — the
same row can land in different splits across runs, clusters, or engine
versions, which silently leaks val/test data into training when a corpus
is re-processed. The pipeline-grade form is CONTENT-addressed: hash a
stable id, take a bucket in [0, 100), map bucket ranges to split names.
Properties that matter at 100 TB:

- stateless & shuffle-free: one projection, no sampling state, no seed
  plumbing — `WholeStageCodegen` all the way;
- stable under reprocessing: a document keeps its split for life, across
  engines too (md5 is md5 everywhere — the DuckDB oracle reproduces the
  assignment bit-for-bit, unlike engine-native hash() functions);
- proportions are exact in expectation and tight in practice (binomial
  over ~uniform md5 buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(id_col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets): first 8 hex chars of
    md5(id as string) as an integer, mod n_buckets. Engine-portable — the
    same expression is expressible in any SQL dialect with md5()."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
    return (h.cast("bigint") % n_buckets).alias("bucket")


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    boundaries: dict[str, int] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Add `out_col` with a deterministic split label per row.

    `boundaries` maps split name → exclusive upper bucket bound (out of
    100), in order — the default {'train': 90, 'val': 95, 'test': 100} is
    a 90/5/5 split. A row's label is the first entry whose bound exceeds
    its bucket, so boundaries double as cumulative percentages."""
    bounds = boundaries or {"train": 90, "val": 95, "test": 100}
    if list(bounds.values()) != sorted(bounds.values()) or max(bounds.values()) != 100:
        raise ValueError(f"boundaries must be ascending and end at 100: {bounds}")
    b = split_bucket(id_col)
    expr = None
    for name, bound in bounds.items():
        cond = b < bound
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr)


def leakage_safe_split(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    boundaries: dict[str, int] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Split assignment where every near-duplicate cluster lands in ONE
    split. Per-doc content-addressed splitting (``assign_split``) leaks
    evaluation data when a near-duplicate of a test doc hashes into
    train — the classic silent-contamination path. Here the hash key is
    the duplicate-component head (``component_id`` from
    ml.dedup.duplicate_components) for clustered docs and the doc's own
    id for untouched singletons, so duplicates can never straddle a
    split boundary, while singletons keep exactly the assignment
    ``assign_split`` would give them.

    Adds ``split_key`` (the id actually hashed) beside ``out_col``.
    Scale shape: one equi-join of the corpus against the components
    frame (only docs that belong to some cluster — typically a small
    fraction; AQE broadcasts it when it fits) and the same shuffle-free
    bucket projection as ``assign_split``."""
    comp = components.select(
        F.col(id_col), F.col("component_id").alias("__head")
    )
    keyed = docs.join(comp, id_col, "left").withColumn(
        "split_key", F.coalesce("__head", F.col(id_col))
    ).drop("__head")
    return assign_split(
        keyed, id_col="split_key", boundaries=boundaries, out_col=out_col
    )
