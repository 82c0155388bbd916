"""ops/numeric.py holds the pinned twins' cross-engine float
invariants; these tests check them against a LIVE DuckDB, not against
our own reading of its semantics (the r12 review found np.round's
half-even silently diverging from DuckDB ROUND — this suite is that
probe made permanent)."""

from __future__ import annotations

import duckdb
import numpy as np

from pravega_flink_ai_flow_spark.ops.numeric import (
    round_half_away,
    seq_dots,
    sequential_sq_norm,
)


def test_round_half_away_matches_duckdb_round_on_binary_ties():
    """Exact binary ties (the j/2^k grid) are where half-even and
    half-away disagree; every value must round exactly like DuckDB."""
    con = duckdb.connect()
    vals = [0.0078125, -0.0078125, 0.1234565, -0.1234565, 1.0000005,
            2.5e-7, 123.4567885, -123.4567885, 0.0, 1e-12, -1e-12]
    # plus a deterministic spread of arbitrary doubles
    rng = np.random.default_rng(3)
    vals += [float(v) for v in rng.normal(scale=50, size=200)]
    ours = round_half_away(np.array(vals), 6)
    for v, o in zip(vals, ours):
        d = con.execute("SELECT ROUND(CAST(? AS DOUBLE), 6)",
                        [v]).fetchone()[0]
        assert float(o) == float(d), (v, float(o), float(d))


def test_round_half_away_differs_from_np_round_where_it_must():
    """The helper exists because np.round is half-even: pin one tie
    where they disagree so a 'simplification' back to np.round fails."""
    v = 0.0078125    # exactly representable; 7th decimal is a tie
    assert float(round_half_away(np.array([v]), 6)[0]) == 0.007813
    assert float(np.round(v, 6)) == 0.007812


def test_seq_dots_matches_duckdb_list_dot_product_bitwise():
    """The slack-band re-scores (r12 advice #1: PQ code assignment,
    IVF boundary picks) recompute flagged rows through seq_dots — it
    must equal DuckDB's list_dot_product fold bit-for-bit, including
    magnitude-mixed vectors where the accumulation ORDER decides the
    result (demonstrated below: the same products folded in reverse
    give a different double, which is exactly why a reassociating
    GEMM cannot be trusted at an argmin near-tie)."""
    con = duckdb.connect()
    rng = np.random.default_rng(7)
    X = rng.normal(size=(20, 8))
    C = rng.normal(size=(16, 8))
    # magnitude-mixed rows: absorption (1e16 + 3 -> spacing-2 rounding)
    # makes the fold order-sensitive
    X[0] = [1.0, 0.3, -1e16, -3.0, -1e16, -1e8, -1e8, -1e8]
    C[0] = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]
    ours = seq_dots(X, C)
    for i in range(X.shape[0]):
        for j in range(C.shape[0]):
            d = con.execute(
                "SELECT list_dot_product(CAST(? AS DOUBLE[]), "
                "CAST(? AS DOUBLE[]))",
                [[float(v) for v in X[i]],
                 [float(v) for v in C[j]]]).fetchone()[0]
            assert float(ours[i, j]) == float(d), (i, j, ours[i, j], d)
    # order-sensitivity is real on this input: the reversed fold of the
    # SAME products lands on a different double — any summation-order
    # change (GEMM blocking, pairwise numpy sums) is a last-ulp hazard
    fwd = seq_dots(X[0:1], C[0:1])[0, 0]
    rev = seq_dots(X[0:1, ::-1], C[0:1, ::-1])[0, 0]
    assert fwd != rev


def test_sequential_sq_norm_matches_duckdb_dot_fold():
    """The ||c||^2 literal chain must equal DuckDB's own sequential
    list_dot_product fold bit-for-bit — including an order-sensitive
    construction where any other summation order gives a different
    double."""
    con = duckdb.connect()
    rng = np.random.default_rng(4)
    cases = [list(map(float, rng.normal(size=8))) for _ in range(50)]
    cases.append([1e8, 1.0, -1e8, 1.0, 1e8, 1.0, -1e8, 1.0])
    for cv in cases:
        kk = sequential_sq_norm(cv)
        d = con.execute(
            "SELECT list_dot_product(CAST(? AS DOUBLE[]), "
            "CAST(? AS DOUBLE[]))", [cv, cv]).fetchone()[0]
        assert kk == d, (cv, kk, d)
