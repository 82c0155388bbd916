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
