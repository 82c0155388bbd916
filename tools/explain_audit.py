#!/usr/bin/env python
"""Plan-quality audit: print ``explain("formatted")`` for the headline
queries and flag scale smells — missing filter pushdown, unexpected
cartesian products, row-at-a-time Python evaluation in the hot path.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = [
    "a1_pricing_summary", "j2_broadcast_dim_join", "j3_large_large_join",
    "tpch_q3", "tpch_q5", "tpch_q17", "j9_asof_join", "o3_topk_per_group",
    "l1_exact_dedup", "l3_brute_force_topk", "l2_minhash_lsh_pairs",
    "m2_knn_predict", "t14_resample_ffill", "l6_boilerplate_removal",
]

SMELLS = {
    "CartesianProduct": "unplanned cartesian product",
    "BatchEvalPython": "row-at-a-time Python UDF in plan",
    "PythonUDF": "Python UDF in plan (should be Arrow/pandas or JVM)",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT

    from pravega_flink_ai_flow_spark.engine.session import get_spark
    from pravega_flink_ai_flow_spark.queries import load_all

    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    for name in names:
        df = registry[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        flags = [msg for pat, msg in SMELLS.items() if pat in plan]
        markers = {
            "broadcast_joins": plan.count("BroadcastHashJoin"),
            "smj": plan.count("SortMergeJoin"),
            "shuffles": plan.count("Exchange"),
            "pushed_filters": plan.count("PushedFilters: [")
                              - plan.count("PushedFilters: []"),
            "codegen_spans": plan.count("codegen id"),
        }
        print(f"===== {name} ===== {markers}"
              + (f"  !! {flags}" if flags else ""))
        print(plan)
    spark.stop()


if __name__ == "__main__":
    main()
