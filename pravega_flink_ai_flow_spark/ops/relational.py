"""Relational operators Spark lacks as single calls (SURVEY.md J9, O3,
T3-T5 batch equivalents), composed from DataFrame primitives so Catalyst
still optimizes them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k_per_group(df: DataFrame, partition_by: Sequence[str],
                    order_by: Sequence[Column], k: int,
                    rank_col: str = "rn") -> DataFrame:
    """Top-k per group (SURVEY.md O3) via row_number — Spark plans a
    WindowGroupLimit pushdown so each partition keeps only k rows before
    the final sort, which is what survives a 100× scale-up."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (df.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= k))


def asof_join(left: DataFrame, right: DataFrame, *,
              left_on: str, right_on: str,
              left_time: str, right_time: str,
              tie_breakers: Sequence[Column] = (),
              direction: str = "backward") -> DataFrame:
    """As-of join (SURVEY.md J9): for each left row, the single right row
    with the latest ``right_time`` ≤ ``left_time`` (direction='backward')
    or earliest ≥ (direction='forward') within the same key.

    Plan shape: equi-join on the key (shuffle both sides on the key — the
    scalable part), inequality filter on time, then a per-left-row top-1
    via row_number. The window partitions by the left row id, so state per
    group is one row; no global sort. For extremely dense right sides,
    pre-aggregating right to the last row per (key, left-time-bucket)
    bounds the join fan-out.
    """
    lt, rt = F.col(left_time), F.col(right_time)
    cond = (F.col(left_on) == F.col(right_on)) & (
        (rt <= lt) if direction == "backward" else (rt >= lt))
    joined = left.join(right, cond)
    order = [rt.desc() if direction == "backward" else rt.asc(), *tie_breakers]
    # partition by a unique left-row identity: all left columns is correct
    # but wasteful; callers' left keys are (id) columns, so use them.
    w = Window.partitionBy(*[left[c] for c in left.columns]).orderBy(*order)
    return (joined.withColumn("__asof_rn", F.row_number().over(w))
            .filter(F.col("__asof_rn") == 1)
            .drop("__asof_rn"))


def session_windows(df: DataFrame, *, key: str, ts: str,
                    gap_seconds: int) -> DataFrame:
    """Batch session windows (SURVEY.md T5 batch equivalent): a new
    session starts when the gap to the previous event for the same key
    exceeds ``gap_seconds``. lag → boundary flag → running sum = session
    id. One shuffle (partitionBy key), state is a running counter."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    prev_ts = F.lag(F.col(ts)).over(w)
    new_session = F.when(
        prev_ts.isNull() |
        (F.col(ts).cast("double") - prev_ts.cast("double") > gap_seconds),
        F.lit(1)).otherwise(F.lit(0))
    return (df.withColumn("__new_session", new_session)
            .withColumn("session_id",
                        F.sum("__new_session").over(
                            w.rowsBetween(Window.unboundedPreceding, 0)))
            .drop("__new_session"))
