#!/usr/bin/env python
"""Measured causes for the two sf10-gate tail ratios (r11 verdict #2).

1. s14_bucketed_colocated_join read 8.7× at 10× data DESPITE a
   plan-asserted zero-exchange join. Hypothesis: the FIXED
   ``bucketBy(8)`` capped the join+agg at 8 tasks on a 32-core box, so
   10× data was ~10× per-task wall (at-most-linear, no parallelism to
   absorb it). This tool times the s14 body at the sf10 tier under the
   old fixed-8 sizing AND the new volume-based sizing
   (queries/sources._s14_n_buckets) — the delta IS the cause.

2. l2_edit_distance_pairs read 8.92×. Hypothesis: pure linear work
   growth with no fixed-cost dilution — the inverted-index co-shingle
   join's output and the verified-candidate count both grow ~10× on
   the flat corpus (df per shingle stays O(1) while shingle count
   grows), and Levenshtein cost per pair is constant. This tool counts
   both quantities at sf1 and sf10.

Prints a JSON summary; the numbers land in PERFORMANCE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    import pravega_flink_ai_flow_spark.queries.sources as S
    from pravega_flink_ai_flow_spark.ops import dedup
    from pravega_flink_ai_flow_spark.queries import load_all

    registry = load_all()
    spark = bench.scale_session("explain-tails")
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = bench.normalize_layout(os.path.join(REPO, "testdata_scale", "sf1"))
    sf10 = bench.normalize_layout(os.path.join(REPO, "testdata_scale",
                                               "sf10"))
    out: dict = {}

    # --- s14: fixed-8 vs volume-sized buckets at the sf10 tier
    fn = registry["s14_bucketed_colocated_join"].fn
    real_rule = S._s14_n_buckets
    for label, rule in (("fixed8", lambda d: 8), ("sized", real_rule)):
        S._s14_n_buckets = rule
        fn(spark, sf10).write.format("noop").mode("overwrite").save()  # warm
        out[f"s14_sf10_{label}_buckets"] = rule(sf10)
        out[f"s14_sf10_{label}_sec"] = bench.median_noop_time(
            fn(spark, sf10), runs=4)
    S._s14_n_buckets = real_rule
    # the new rule's 10x ratio, measured in this same session
    fn(spark, sf1).write.format("noop").mode("overwrite").save()
    out["s14_sf1_sized_sec"] = bench.median_noop_time(fn(spark, sf1), runs=4)
    out["s14_sized_ratio_10x"] = round(
        out["s14_sf10_sized_sec"] / out["s14_sf1_sized_sec"], 2)

    # --- l2_edit_distance: work-quantity growth at 10x data
    for label, d in (("sf1", sf1), ("sf10", sf10)):
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        arrs = dedup.shingle_arrays(dedup.spread(docs),
                                    "doc_id", "text", k=3).persist()
        out[f"l2edit_{label}_shingle_rows"] = (
            arrs.select(F.explode("shingles")).count())
        cand = dedup.jaccard_count_pairs(arrs, threshold=0.5)
        t0 = time.perf_counter()
        out[f"l2edit_{label}_cand_pairs"] = cand.count()
        out[f"l2edit_{label}_cand_sec"] = round(time.perf_counter() - t0, 2)
        arrs.unpersist()
    out["l2edit_shingle_growth"] = round(
        out["l2edit_sf10_shingle_rows"] / out["l2edit_sf1_shingle_rows"], 2)
    out["l2edit_cand_growth"] = round(
        out["l2edit_sf10_cand_pairs"] / max(1, out["l2edit_sf1_cand_pairs"]),
        2)
    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
