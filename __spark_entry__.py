"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real corpus lives in ``pravega_flink_ai_flow_spark.queries`` —
one declared query per implemented SURVEY.md §2 operator.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pravega_flink_ai_flow_spark.queries import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    registry = load_all()
    return registry["a1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


# Driver-window rotation. The external gate records only the FIRST 50
# queries in alphabetical order each round; round 1's window stopped at
# `l3_lsh_topk`, leaving 72 declared queries with no hard correctness
# signal. Per ADVICE.md, round 2 promotes into the window (via an `a0_`
# key prefix — sorts before every other name) the 50 queries that most
# need a driver-recorded result: the 5 entries that went red in round 1
# (now fixed) + the vacuous j6 (now non-empty) + all 21 TPC-H shapes +
# windows/setops/sorts/sources/projections/time-window/ML queries that
# were outside round 1's window. Canonical names are unchanged in the
# package registry, bench.py and tests; only the exported keys rotate.
# Remaining unseen queries (l4_*, l5_*, p2/p3/p6/p7/p8, o1/o2, u*_all,
# u5, s10, t4/t7/t11-t13, m3, w8) rotate into round 3's window.
_PROMOTED = frozenset({
    # round-1 red / vacuous, fixed this round
    "a6_positional_aggs", "a7_stats", "a13_approx_percentile",
    "f_array", "f_map", "j6_anti_join",
    # TPC-H (all 21 declared shapes; q1 is a1_pricing_summary, green r1)
    "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7",
    "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q13",
    "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18", "tpch_q19",
    "tpch_q20", "tpch_q21", "tpch_q22",
    # window functions (SURVEY W1-W7)
    "w1_row_number", "w2_rank_dense_ntile", "w3_lag_lead", "w4_running_sum",
    "w5_moving_avg", "w6_range_frame", "w7_first_last_value",
    # set ops (U1-U4), projections (P1/P4/P5), sort (O3)
    "u1_union_all", "u2_union_distinct", "u3_intersect", "u4_except",
    "p1_expression_select", "p4_filter_predicates", "p5_case_when",
    "o3_topk_per_group",
    # sources/sinks (S1-S9)
    "s1_csv_roundtrip", "s3_s4_stream_dir_roundtrip",
    "s7_parquet_pruned_scan", "s8_rows_source", "s9_pandas_bridge",
    # time windows batch analogs (T3/T5), ML scoring (M2)
    "t3_tumbling_window", "t5_session_window", "m2_knn_predict",
})


def _export_key(name: str) -> str:
    return f"a0_{name}" if name in _PROMOTED else name


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {_export_key(name): q.fn for name, q in sorted(load_all().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each hash-checkable query;
    approximate/non-SQL ops are omitted (rows-only check)."""
    return {_export_key(name): q.oracle for name, q in sorted(load_all().items())
            if q.oracle is not None}
