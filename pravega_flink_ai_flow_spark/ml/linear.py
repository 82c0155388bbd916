"""Distributed linear-model training via sufficient statistics
(SURVEY.md M1 depth — the trainer shape that holds at 100 TB).

The reference's only trainer collects the table to the driver and fits
sklearn (processor.py:124-137) — fine for its 150-row demo, impossible
at corpus scale. Ridge regression has a closed form over SUFFICIENT
STATISTICS: ``w = (XᵀX + λI)⁻¹ Xᵀy``, where ``XᵀX`` (d×d) and ``Xᵀy``
(d) are plain sums over rows. So the scalable trainer is:

1. one ``mapInArrow`` pass emits a PARTIAL Gram matrix per Arrow batch
   (a single flattened row of d·(d+1)+1 doubles — data never leaves the
   executors, only d²-sized statistics do);
2. the driver sums the handful of partial rows and solves the d×d
   system.

This is exactly how large-scale linear model / GLM trainers are built
(aggregate-then-solve; an iterative GLM repeats the same pass per
Newton step), and it is embarrassingly parallel: no shuffle at all,
the partials reduce like any map-side combine.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame


class RidgeModel:
    """Fitted ridge regressor: ``predict = X @ coef + intercept``."""

    def __init__(self, coef: np.ndarray, intercept: float, lam: float):
        self.coef = np.asarray(coef, dtype=np.float64)
        self.intercept = float(intercept)
        self.lam = float(lam)

    def predict(self, X) -> np.ndarray:
        return np.asarray(X, dtype=np.float64) @ self.coef + self.intercept

    def score(self, X, y) -> float:
        """R² (sklearn's regressor convention)."""
        y = np.asarray(y, dtype=np.float64)
        resid = y - self.predict(X)
        tot = y - y.mean()
        denom = float(tot @ tot)
        return 1.0 - float(resid @ resid) / denom if denom else 0.0


def fit_ridge_distributed(df: DataFrame, *, vec_col: str, label_col: str,
                          lam: float = 1e-3) -> RidgeModel:
    """One pass over ``df``: per-batch partial Gram statistics via
    ``mapInArrow``, driver-side solve. The intercept is handled by
    augmenting with a constant-1 feature (index d)."""
    import pyarrow as pa

    def partials(batches):
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            flat = rb.column(0).flatten().to_numpy(zero_copy_only=False)
            X = flat.reshape(n, -1).astype(np.float64, copy=False)
            y = rb.column(1).to_numpy(zero_copy_only=False).astype(np.float64)
            Xa = np.hstack([X, np.ones((n, 1))])
            G = Xa.T @ Xa                        # (d+1) × (d+1)
            b = Xa.T @ y                         # (d+1)
            out = np.concatenate([G.ravel(), b, [float(n)]])
            yield pa.RecordBatch.from_arrays(
                [pa.ListArray.from_arrays(
                    pa.array([0, out.size], type=pa.int32()),
                    pa.array(out, type=pa.float64()))],
                names=["stats"])

    rows = (df.select(vec_col, label_col)
            .mapInArrow(partials, "stats array<double>").collect())
    if not rows:
        raise ValueError("cannot fit on an empty DataFrame")
    total = np.sum([np.asarray(r["stats"]) for r in rows], axis=0)
    d1 = int(round((np.sqrt(4 * (total.size - 1) + 1) - 1) / 2))
    G = total[:d1 * d1].reshape(d1, d1)
    b = total[d1 * d1:d1 * d1 + d1]
    reg = lam * np.eye(d1)
    reg[-1, -1] = 0.0                            # don't penalize intercept
    w = np.linalg.solve(G + reg, b)
    return RidgeModel(coef=w[:-1], intercept=w[-1], lam=lam)
