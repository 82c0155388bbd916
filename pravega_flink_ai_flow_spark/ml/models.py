"""Model implementations + persistence.

The reference trains ``KNeighborsClassifier(n_neighbors=5)`` and persists
it with joblib (``batch_train_batch_predict_processor.py:126-137``).
Neither sklearn nor joblib exists in this environment, so the engine
ships a small deterministic numpy KNN with the same fit/predict/score
surface and pickles it — the model artifact is still "an opaque file on
shared storage referenced by the registry", which is the property the
architecture depends on.
"""

from __future__ import annotations

import pickle

import numpy as np


class KNNClassifier:
    """K-nearest-neighbors classifier (euclidean, majority vote).

    Deterministic tie-breaks: neighbors ordered by (distance, train row
    index); tied vote counts go to the smallest label — matching the
    argmax-first behavior of the reference's sklearn KNN.
    """

    def __init__(self, n_neighbors: int = 5):
        self.n_neighbors = n_neighbors
        self._x: np.ndarray | None = None
        self._y: np.ndarray | None = None

    def fit(self, x, y) -> "KNNClassifier":
        self._x = np.asarray(x, dtype=np.float64)
        self._y = np.asarray(y)
        return self

    def predict(self, x) -> np.ndarray:
        if self._x is None:
            raise ValueError("model is not fitted")
        q = np.asarray(x, dtype=np.float64)
        # ||q-t||² = q·q − 2 q·t + t·t ; vectorized over the whole batch
        d2 = (np.sum(q * q, axis=1)[:, None]
              - 2.0 * q @ self._x.T
              + np.sum(self._x * self._x, axis=1)[None, :])
        # stable argsort → ties broken by train row index
        nn = np.argsort(d2, axis=1, kind="stable")[:, : self.n_neighbors]
        labels = self._y[nn]
        out = np.empty(len(q), dtype=self._y.dtype)
        for i, row in enumerate(labels):
            vals, counts = np.unique(row, return_counts=True)
            out[i] = vals[np.argmax(counts)]   # tie → smallest label
        return out

    def score(self, x, y) -> float:
        """Mean accuracy — the reference's validate metric
        (``knn.score``, processor.py:180)."""
        pred = self.predict(x)
        return float(np.mean(pred == np.asarray(y)))


def save_model(model, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(model, f)


def load_model(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
