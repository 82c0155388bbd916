"""Cross-engine numeric helpers shared by the pinned-artifact twins.

The driver's value hash compares Spark output against DuckDB bit-for-
bit, so any float the twins EMIT must come out of the same arithmetic
chain in both engines. Two invariants live here so they are
single-sourced (r12 review):

- rounding is HALF-AWAY-FROM-ZERO, matching Spark ``F.round`` /
  DuckDB ``ROUND`` — numpy's ``np.round`` is half-even and diverges on
  exact binary ties (1/128-grid values);
- squared-norm literals are built by a SEQUENTIAL python fold, so the
  exact same float lands in the SQL text and in the numpy closure.
"""

from __future__ import annotations


def round_half_away(arr, dp: int = 6):
    """Element-wise round-half-away-from-zero — the np.round replacement
    every emitted double in a mapInArrow twin must use (np.round's
    half-even diverges from DuckDB ROUND at binary ties)."""
    import numpy as np

    p = 10.0 ** dp
    return np.copysign(np.floor(np.abs(arr) * p + 0.5), arr) / p


def sequential_sq_norm(vals) -> float:
    """Sequential left-fold sum of squares over python floats — the
    chain used to EMIT a ||c||^2 literal must also be the chain that
    computes the value used numpy-side, or the two engines' argmin
    keys differ in the last ulp (r12 review #1)."""
    kk = 0.0
    for x in vals:
        kk += float(x) * float(x)
    return kk


def seq_dots(X, C):
    """All-pairs dot products ``(n,d) x (m,d) -> (n,m)`` accumulated
    as a PER-DIMENSION left fold — the exact float chain of DuckDB's
    ``list_dot_product`` / Spark's ``F.aggregate`` sequential folds
    (pinned against live DuckDB in tests/test_numeric_helpers.py).
    BLAS GEMM reassociates the sum, so an argmin/argmax over GEMM keys
    can flip at a near-tie the oracle resolves the other way (r12
    advice #1); the slack-banded re-scores in ops/similarity and
    queries/llm_similarity recompute flagged rows through THIS chain.
    O(n·m·d) python-loop-over-d vectorized ops — used only on the rare
    flagged rows, never the hot path."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    C = np.asarray(C, dtype=np.float64)
    acc = np.zeros((X.shape[0], C.shape[0]))
    for j in range(X.shape[1]):
        # 0.0 + x0*c0 == x0*c0 exactly, so starting from zeros keeps
        # the chain identical to the engines' first-element seed
        acc += X[:, j:j + 1] * C[:, j][None, :]
    return acc
