"""Full oracle sweep (``pytest -m oracle``) — replicates the driver's
DuckDB comparison for EVERY declared query, not just the 50 the driver's
correctness window records per round. Window rotation can therefore
never hide a regression: this sweep is the repo-side superset of the
gate (VERDICT.md r3, next-round item 8).

Uses the same canonicalization as tools/check_correctness.py (which is
itself kept in lockstep with FIXTURES.md); queries with no oracle get a
rows-only execution check (must run, must not produce complex-typed
output that would crash the driver's canonicalizer).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SF = os.environ.get("ORACLE_SWEEP_SF_DIR", "/root/testdata/sf0.01")


def _run_sweep(extra_env: dict) -> None:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_correctness.py"), SF],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, **extra_env})
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, (
        f"oracle sweep failed (rc={proc.returncode}):\n{tail}\n{proc.stderr[-2000:]}")
    assert " 0 FAILED" in proc.stdout, tail


@pytest.mark.oracle
def test_every_declared_query_matches_its_oracle():
    """Full sweep under the engine session (ANSI off, UTC, Arrow)."""
    _run_sweep({})


@pytest.mark.oracle
def test_every_declared_query_matches_under_vanilla_session():
    """Full sweep under the DRIVER-identical vanilla session — ANSI ON
    (Spark 4 default), JVM-default timezone, no engine configs. This is
    the session the external gate actually uses."""
    _run_sweep({"VANILLA": "1"})


def test_type_checker_flags_uncast_integer_sum(spark):
    """The driver's pandas value hash is type-sensitive: DuckDB returns
    HUGEINT for an uncast integer SUM (float64 after .df()) where Spark
    returns LongType (int64) — rows and schema match but the hash does
    not (CORRECTNESS_r04: tpch_q12, t5_session_window). The local
    checker must flag that class BEFORE the gate does."""
    import duckdb

    from tools.check_correctness import type_mismatches

    sdf = spark.sql("SELECT CAST(3 AS BIGINT) AS s, CAST(1.5 AS DOUBLE) AS d")
    con = duckdb.connect()
    base = "FROM (SELECT 1 AS x UNION ALL SELECT 2)"
    uncast = con.sql(f"SELECT SUM(x) AS s, CAST(1.5 AS DOUBLE) AS d {base}")
    assert type_mismatches(sdf, uncast) == [("s", "int", "float")]
    cast = con.sql(
        f"SELECT CAST(SUM(x) AS BIGINT) AS s, CAST(1.5 AS DOUBLE) AS d {base}")
    assert type_mismatches(sdf, cast) == []
    # DECIMAL lands in float64 via .df() — compatible with Spark DOUBLE
    dec = con.sql(f"SELECT CAST(3 AS BIGINT) AS s, CAST(1.5 AS DECIMAL(10,2)) AS d {base} LIMIT 1")
    assert type_mismatches(sdf, dec) == []
