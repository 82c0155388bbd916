"""Distributed spherical k-means (Lloyd's algorithm) — the second
iterative parameter-server trainer next to ``ml/softmax.py``, and the
real coarse quantizer for the IVF ANN index (``ops/similarity.py``).

Per iteration:

1. the current centroid matrix (k × d, broadcast-small by the IVF
   contract) ships to executors in the ``mapInArrow`` closure;
2. each Arrow batch assigns its vectors to the nearest centroid by
   cosine (one GEMM) and emits PARTIAL per-cluster vector sums + counts
   — (k·d + k) doubles per partition, never the data;
3. the driver reduces the partials, re-normalizes the means (spherical
   k-means: centroids live on the unit sphere because assignment is by
   cosine), and loops. Empty clusters keep their previous centroid.

Cost per iteration is one map-only job — no shuffle at any corpus size.
Determinism: fixed strided init, ``argmax`` first-winner tie-break,
partition-ordered reduction ⇒ the centroid trajectory is reproducible
(pytest asserts equality with a single-node numpy run).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame


def _unit_rows(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return M / n


def fit_spherical_kmeans_distributed(df: DataFrame, *, vec_col: str,
                                     init: np.ndarray,
                                     iters: int = 8) -> np.ndarray:
    """Refine ``init`` (k × d) with ``iters`` distributed Lloyd steps
    over ``df[vec_col]``; returns the unit-normalized centroid matrix."""
    import pyarrow as pa

    C = _unit_rows(np.asarray(init, dtype=np.float64))
    k, d = C.shape
    src = df.select(vec_col).persist()
    try:
        for _ in range(iters):
            def partials(batches, C=C):
                for rb in batches:
                    n = rb.num_rows
                    if n == 0:
                        continue
                    flat = rb.column(0).flatten() \
                        .to_numpy(zero_copy_only=False)
                    V = flat.reshape(n, -1).astype(np.float64, copy=False)
                    Vn = _unit_rows(V)
                    a = np.argmax(Vn @ C.T, axis=1)
                    sums = np.zeros((k, d))
                    np.add.at(sums, a, Vn)
                    counts = np.bincount(a, minlength=k).astype(np.float64)
                    out = np.concatenate([sums.ravel(), counts])
                    yield pa.RecordBatch.from_arrays(
                        [pa.ListArray.from_arrays(
                            pa.array([0, out.size], type=pa.int32()),
                            pa.array(out, type=pa.float64()))],
                        names=["stats"])

            rows = (src.mapInArrow(partials, "stats array<double>")
                    .collect())
            if not rows:
                raise ValueError("cannot fit k-means on an empty DataFrame")
            total = np.sum([np.asarray(r["stats"]) for r in rows], axis=0)
            sums = total[:k * d].reshape(k, d)
            counts = total[k * d:]
            nonempty = counts > 0
            newC = C.copy()
            newC[nonempty] = sums[nonempty] / counts[nonempty, None]
            C = _unit_rows(newC)
        return C
    finally:
        src.unpersist()
