"""Distributed ITERATIVE training: multinomial logistic (softmax)
regression via full-batch gradient descent (SURVEY.md M1 depth — the
third model family, and the one whose training loop is genuinely
iterative rather than closed-form).

The reference's trainer collects to the driver and fits sklearn
(batch_train_batch_predict_processor.py:124-137); ridge (ml/linear.py)
showed the one-pass sufficient-statistics shape. Softmax has no closed
form, so this module shows the other canonical scalable trainer: the
PARAMETER-SERVER loop.

Per epoch:

1. the current weight matrix ``W`` ((d+1) × C — a few KB) ships to the
   executors inside the ``mapInArrow`` closure (at cluster scale: a
   broadcast variable — same payload, same direction);
2. each Arrow batch computes its PARTIAL gradient ``Xaᵀ(softmax(XaW)−Y)``
   locally — one GEMM pair per batch, data never leaves the executors,
   only (d+1)·C gradient doubles per partition do;
3. the driver (the parameter server) sums the partials, applies the
   momentum update, and loops.

Cost per epoch is one map-only Spark job — no shuffle at any data size;
the input is persisted once so epochs 2+ skip the source scan (at 100 TB
that persist is MEMORY_AND_DISK per executor, or is dropped and epochs
re-scan — either way the loop shape is unchanged). This is exactly how
large-scale full-batch/L-BFGS trainers distribute (partial gradients
reduce like any map-side combine); mini-batch SGD differs only in
sampling a fraction per pass.

Determinism: partition count and order are fixed by the source layout,
``collect`` preserves partition order, and the driver reduces partials
in that order — so the whole W trajectory is reproducible run-to-run
(pytest asserts exact equality with a single-node numpy fit).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame


class SoftmaxModel:
    """Fitted softmax classifier: ``logits = [X, 1] @ W`` ((d+1) × C)."""

    def __init__(self, W: np.ndarray):
        self.W = np.asarray(W, dtype=np.float64)

    @property
    def n_classes(self) -> int:
        return self.W.shape[1]

    def logits(self, X) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        return X @ self.W[:-1] + self.W[-1]

    def predict(self, X) -> np.ndarray:
        return np.argmax(self.logits(X), axis=1)

    def score(self, X, y) -> float:
        return float((self.predict(X) == np.asarray(y)).mean())


def _partial_grad_pass(W: np.ndarray):
    """mapInArrow generator: per-batch partial softmax gradient plus the
    batch row count, flattened into one double row per batch."""
    import pyarrow as pa

    def gen(batches):
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            flat = rb.column(0).flatten().to_numpy(zero_copy_only=False)
            X = flat.reshape(n, -1).astype(np.float64, copy=False)
            y = rb.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
            Xa = np.hstack([X, np.ones((n, 1))])
            Z = Xa @ W
            Z -= Z.max(axis=1, keepdims=True)          # overflow-safe
            P = np.exp(Z)
            P /= P.sum(axis=1, keepdims=True)
            P[np.arange(n), y] -= 1.0                  # softmax − one-hot
            G = Xa.T @ P                               # (d+1) × C partial
            out = np.concatenate([G.ravel(), [float(n)]])
            yield pa.RecordBatch.from_arrays(
                [pa.ListArray.from_arrays(
                    pa.array([0, out.size], type=pa.int32()),
                    pa.array(out, type=pa.float64()))],
                names=["stats"])

    return gen


def fit_softmax_distributed(df: DataFrame, *, vec_col: str, label_col: str,
                            n_classes: int, epochs: int = 15,
                            lr: float = 1.0, momentum: float = 0.9,
                            lam: float = 1e-4) -> SoftmaxModel:
    """Full-batch gradient descent with classic momentum; L2 on weights
    (never the bias row). One map-only job per epoch."""
    src = df.select(vec_col, label_col).persist()
    try:
        first = src.select(vec_col).first()
        if first is None:
            raise ValueError("cannot fit on an empty DataFrame")
        d = len(first[0])
        W = np.zeros((d + 1, n_classes))
        V = np.zeros_like(W)
        for _ in range(epochs):
            rows = (src.mapInArrow(_partial_grad_pass(W),
                                   "stats array<double>").collect())
            total = np.sum([np.asarray(r["stats"]) for r in rows], axis=0)
            n = total[-1]
            G = total[:-1].reshape(d + 1, n_classes) / n
            G[:-1] += lam * W[:-1]
            V = momentum * V - lr * G
            W = W + V
        return SoftmaxModel(W)
    finally:
        src.unpersist()
