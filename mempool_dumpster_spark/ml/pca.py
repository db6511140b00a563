"""Distributed PCA over an embedding column — the dimensionality-reduction
/ whitening step between embedding extraction and ANN indexing or
semantic dedup (IVF cells and LSH planes both get cheaper and better
conditioned in a decorrelated low-rank basis).

Scale shape: the ONLY thing that crosses the wire is one (d + d²)-float
partial statistic per Arrow batch — each partition reduces its rows to
(count, sum vector, Gram matrix X'X) with numpy inside `mapInPandas`,
and the driver sums a handful of partials and eigendecomposes the d×d
covariance (d = embedding width, hundreds at most — the d³ eigh is
microseconds). No row-level shuffle, no iteration; corpus cost is one
scan regardless of row count, which is the textbook out-of-core PCA
factorization (compute sufficient statistics distributed, solve small
problem centrally).

The projection is plain column algebra: k dot products of the centered
embedding against literal component vectors (`zip_with`/`aggregate`
HOFs, JVM-side) — no Python in the transform path, so applying the model
at 100 TB costs a scalar map.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PCAModel:
    mean: list[float]
    components: list[list[float]]  # k rows, each a unit d-vector
    explained_variance: list[float]  # descending eigenvalues

    @property
    def k(self) -> int:
        return len(self.components)

    @property
    def dim(self) -> int:
        return len(self.mean)


def pca_fit(df: DataFrame, emb_col: str = "embedding", k: int = 8) -> PCAModel:
    """Fit a k-component PCA from one distributed pass of sufficient
    statistics. Deterministic: partial sums are combined in sorted
    partition order on the driver, and each component's sign is fixed so
    its largest-magnitude coordinate is positive."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def partials(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        n = 0
        s = None
        g = None
        for pdf in batches:
            x = np.stack(pdf[emb_col].to_numpy()).astype("float64")
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gram = x.T @ x
            g = gram if g is None else g + gram
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "g": [g.reshape(-1).tolist()],
                }
            )

    stats = df.select(emb_col).mapInPandas(
        partials, schema="n long, s array<double>, g array<double>"
    ).collect()
    if not stats:
        raise ValueError("pca_fit on an empty DataFrame")

    import numpy as np

    # combine in a deterministic order (float addition is order-sensitive)
    stats = sorted(stats, key=lambda r: (r["n"], r["s"][0] if r["s"] else 0.0))
    n = sum(r["n"] for r in stats)
    d = len(stats[0]["s"])
    if k > d:
        raise ValueError(f"k={k} exceeds embedding dim {d}")
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in stats:
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for i in order:
        v = evecs[:, i]
        if v[np.argmax(np.abs(v))] < 0:  # sign convention
            v = -v
        comps.append(v.tolist())
    return PCAModel(
        mean=mean.tolist(),
        components=comps,
        explained_variance=[float(max(evals[i], 0.0)) for i in order],
    )


def _dot_literal(col: Column, vec: list[float]) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in vec])
    return F.aggregate(
        F.zip_with(col, lit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pca_transform(
    df: DataFrame,
    model: PCAModel,
    emb_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project `emb_col` onto the model's components: out[i] =
    (x - mean) · component_i. Pure JVM column algebra (zip_with/aggregate
    HOFs) — zero shuffle, zero Python at transform time."""
    centered = F.zip_with(
        F.col(emb_col).cast("array<double>"),
        F.array(*[F.lit(float(m)) for m in model.mean]),
        lambda a, b: a - b,
    )
    tmp = df.withColumn("__centered", centered)
    proj = F.array(
        *[_dot_literal(F.col("__centered"), c) for c in model.components]
    )
    return tmp.withColumn(out_col, proj).drop("__centered")
