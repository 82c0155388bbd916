"""Distributed PCA via sufficient statistics (SURVEY.md M1 family).

The 100 TB shape for principal components over an embedding column:
ONE ``mapInArrow`` pass reduces each Arrow batch to its partial
(Σx, ΣxᵀX, n) — dim + dim² + 1 doubles per batch regardless of row
count — the driver sums the partials, forms the covariance, and runs
``numpy.linalg.eigh`` on the dim×dim matrix (microseconds for any
embedding width that fits a vector column). The corpus itself is never
shuffled, collected, or revisited; projection is one GEMM per batch
with the component matrix riding in the task closure. Same
sufficient-statistics contract as :func:`..ml.linear.
fit_ridge_distributed` (reference parity: the driver-side sklearn-style
fit in ml/ops.py:38 is the reference-faithful twin; this is the
scale-out path).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


class PCAModel:
    """Fitted components: ``components`` is (k, d) row-major, mean (d,).
    Deterministic sign convention: each component is flipped so its
    largest-|value| element is positive (numpy's eigh sign is otherwise
    arbitrary, which would make distributed and local fits disagree)."""

    def __init__(self, mean: np.ndarray, components: np.ndarray,
                 explained_variance: np.ndarray):
        self.mean = mean
        self.components = components
        self.explained_variance = explained_variance

    def transform(self, X) -> np.ndarray:
        return (np.asarray(X, dtype=np.float64) - self.mean) @ self.components.T


def _fix_signs(components: np.ndarray) -> np.ndarray:
    flip = np.sign(components[np.arange(len(components)),
                              np.abs(components).argmax(axis=1)])
    flip[flip == 0] = 1.0
    return components * flip[:, None]


def fit_pca_distributed(df: DataFrame, *, vec_col: str = "embedding",
                        k: int = 2) -> PCAModel:
    """One pass: per-batch (Σx, XᵀX, n) partials via ``mapInArrow``,
    driver-side covariance + eigh. Exact (not iterative/sketched) —
    float64 partial sums differ from a single-matrix computation only
    in summation order."""
    import pyarrow as pa

    def partials(batches):
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            flat = rb.column(0).flatten().to_numpy(zero_copy_only=False)
            X = flat.reshape(n, -1).astype(np.float64, copy=False)
            out = np.concatenate([X.sum(axis=0), (X.T @ X).ravel(),
                                  [float(n)]])
            yield pa.RecordBatch.from_arrays(
                [pa.ListArray.from_arrays(
                    pa.array([0, out.size], type=pa.int32()),
                    pa.array(out, type=pa.float64()))],
                names=["stats"])

    rows = df.select(vec_col).mapInArrow(partials, "stats array<double>") \
             .collect()
    if not rows:
        raise ValueError("cannot fit PCA on an empty DataFrame")
    total = np.sum([np.asarray(r["stats"]) for r in rows], axis=0)
    # stats layout: d + d*d + 1 doubles → d = root of d² + d + 1 = size
    d = int(round((np.sqrt(4 * (total.size - 1) + 1) - 1) / 2))
    s1 = total[:d]
    s2 = total[d:d + d * d].reshape(d, d)
    n = total[-1]
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)             # ascending eigenvalues
    order = np.argsort(vals)[::-1][:k]
    components = _fix_signs(vecs[:, order].T)
    return PCAModel(mean=mean, components=components,
                    explained_variance=vals[order])


def pca_project(df: DataFrame, model: PCAModel, *,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Project every vector onto the fitted components — one GEMM per
    Arrow batch, components in the task closure (k×d doubles), no
    shuffle. Output columns ``(id_col, pc1..pck)``."""
    import pyarrow as pa

    mean = model.mean
    comp = model.components
    names = [f"pc{i + 1}" for i in range(len(comp))]
    out_schema = f"{id_col} long, " + ", ".join(f"{c} double" for c in names)

    def project(batches):
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            ids = rb.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            flat = rb.column(1).flatten().to_numpy(zero_copy_only=False)
            X = flat.reshape(n, -1).astype(np.float64, copy=False)
            P = (X - mean) @ comp.T
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64())]
                + [pa.array(P[:, i], pa.float64()) for i in range(len(comp))],
                names=[id_col, *names])

    return df.select(id_col, vec_col).mapInArrow(project, out_schema)
