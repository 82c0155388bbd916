#!/usr/bin/env python
"""Measured causes for the six unexplained >7x sf10-gate tails
(r12 verdict next #1): l2_incremental_dedup 8.23x, j11_salted_skew_join
8.15x, a13_approx_percentile 7.78x, l2_ngram_jaccard_pairs 7.68x,
l2_containment_pairs 7.49x, l5_progressive_decode 7.15x.

Method per the tools/explain_s14_l2edit.py precedent: isolate the
query body, vary ONE knob where a tunable could be the cause, and
count the work quantities (shingle rows, candidate pairs, join output
rows, documents decoded) at sf1 AND sf10 — if the quantities grow
10.0x, the wall ratio is honest fixed-box linearity, not a plan
defect; if a knob changes the sf10 wall materially, that knob IS the
cause.

Knobs varied:
  * j11: salt factor 8 vs 1 (is the 8x dim replication the tail?)
  * a13: percentile_approx accuracy 10000 vs 1000 (is the GK sketch
    buffer size the tail?)

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


def timed_count(df) -> tuple[int, float]:
    t0 = time.perf_counter()
    n = df.count()
    return n, round(time.perf_counter() - t0, 2)


def main() -> None:
    from pravega_flink_ai_flow_spark.ops import dedup
    from pravega_flink_ai_flow_spark.ops.relational import salted_join
    from pravega_flink_ai_flow_spark.queries import tables

    spark = bench.scale_session("explain-r13-tails")
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = bench.normalize_layout(os.path.join(REPO, "testdata_scale", "sf1"))
    sf10 = bench.normalize_layout(os.path.join(REPO, "testdata_scale",
                                               "sf10"))
    out: dict = {}

    # --- j11: salt-factor knob at the sf10 tier ----------------------
    def j11_body(sf_dir: str, salt: int):
        events, customer = tables(spark, sf_dir, "events", "customer")
        if salt <= 1:
            joined = events.join(customer,
                                 events.user_id == customer.c_custkey)
        else:
            joined = salted_join(events, customer, left_on="user_id",
                                 right_on="c_custkey", salt=salt,
                                 salt_source="event_id")
        return (joined.groupBy("event_type")
                .agg(F.count("*").alias("n_events"),
                     F.sum("c_acctbal").cast("double").alias("sum_acctbal")))

    for salt in (8, 1):
        df = j11_body(sf10, salt)
        df.write.format("noop").mode("overwrite").save()  # warm
        out[f"j11_sf10_salt{salt}_sec"] = bench.median_noop_time(df, runs=4)
    df = j11_body(sf1, 8)
    df.write.format("noop").mode("overwrite").save()
    out["j11_sf1_salt8_sec"] = bench.median_noop_time(df, runs=4)
    for label, d in (("sf1", sf1), ("sf10", sf10)):
        events, customer = tables(spark, d, "events", "customer")
        out[f"j11_{label}_events"] = events.count()
        out[f"j11_{label}_dim_rows"] = customer.count()
    out["j11_salt_overhead_sf10"] = round(
        out["j11_sf10_salt8_sec"] / out["j11_sf10_salt1_sec"], 2)
    out["j11_salt8_ratio_10x"] = round(
        out["j11_sf10_salt8_sec"] / out["j11_sf1_salt8_sec"], 2)

    # --- a13: sketch-accuracy knob at the sf10 tier ------------------
    def a13_body(sf_dir: str, acc: int):
        (li,) = tables(spark, sf_dir, "lineitem")
        q = (li.groupBy("l_returnflag")
             .agg(F.percentile_approx("l_extendedprice",
                                      [0.5, 0.9, 0.99], acc).alias("qs"),
                  F.approx_count_distinct("l_partkey", 0.02)
                  .alias("approx_parts")))
        return q.select("l_returnflag",
                        F.element_at("qs", 1).alias("p50"),
                        F.element_at("qs", 2).alias("p90"),
                        F.element_at("qs", 3).alias("p99"),
                        "approx_parts")

    for acc in (10000, 1000):
        df = a13_body(sf10, acc)
        df.write.format("noop").mode("overwrite").save()
        out[f"a13_sf10_acc{acc}_sec"] = bench.median_noop_time(df, runs=4)
    df = a13_body(sf1, 10000)
    df.write.format("noop").mode("overwrite").save()
    out["a13_sf1_acc10000_sec"] = bench.median_noop_time(df, runs=4)
    for label, d in (("sf1", sf1), ("sf10", sf10)):
        (li,) = tables(spark, d, "lineitem")
        out[f"a13_{label}_rows"] = li.count()
    out["a13_acc_knob_speedup"] = round(
        out["a13_sf10_acc10000_sec"] / out["a13_sf10_acc1000_sec"], 2)
    out["a13_acc10000_ratio_10x"] = round(
        out["a13_sf10_acc10000_sec"] / out["a13_sf1_acc10000_sec"], 2)

    # --- the three l2 pair tails: work-quantity growth ---------------
    # shared shingle table per tier (the queries share _shingle_arrays)
    for label, d in (("sf1", sf1), ("sf10", sf10)):
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        out[f"l2_{label}_docs"] = docs.count()
        arrs = dedup.shingle_arrays(dedup.spread(docs),
                                    "doc_id", "text", k=3).persist()
        out[f"l2_{label}_shingle_rows"], _ = timed_count(
            arrs.select(F.explode("shingles")))
        # ngram_jaccard: output pairs at >= 0.5 (its whole work is the
        # count-based inverted index the l2edit precedent already
        # measured; re-counted here so this tool is self-contained)
        n, sec = timed_count(dedup.jaccard_count_pairs(arrs, threshold=0.5))
        out[f"l2_ngram_{label}_pairs"], out[f"l2_ngram_{label}_sec"] = n, sec
        # containment: output pairs at >= 0.6 through the dispatcher
        n, sec = timed_count(
            dedup.containment_pairs_auto(arrs, threshold=0.6))
        out[f"l2_cont_{label}_pairs"], out[f"l2_cont_{label}_sec"] = n, sec
        # incremental: corpus/new split quantities + candidate pairs
        corpus = docs.filter(F.col("doc_id") % 10 < 8)
        new = docs.filter(F.col("doc_id") % 10 >= 8)
        arrs_c = dedup.shingle_arrays(dedup.spread(corpus),
                                      "doc_id", "text", 3).persist()
        arrs_n = dedup.shingle_arrays(dedup.spread(new),
                                      "doc_id", "text", 3).persist()
        out[f"l2_incr_{label}_corpus_docs"] = corpus.count()
        out[f"l2_incr_{label}_new_docs"] = new.count()
        n, sec = timed_count(dedup.jaccard_candidates_between_auto(
            arrs_n, arrs_c, threshold=0.7))
        out[f"l2_incr_{label}_cand_pairs"] = n
        out[f"l2_incr_{label}_cand_sec"] = sec
        arrs.unpersist()
        arrs_c.unpersist()
        arrs_n.unpersist()

    for q in ("l2_ngram", "l2_cont"):
        out[f"{q}_pair_growth"] = round(
            out[f"{q}_sf10_pairs"] / max(1, out[f"{q}_sf1_pairs"]), 2)
    out["l2_shingle_growth"] = round(
        out["l2_sf10_shingle_rows"] / out["l2_sf1_shingle_rows"], 2)
    out["l2_incr_cand_growth"] = round(
        out["l2_incr_sf10_cand_pairs"]
        / max(1, out["l2_incr_sf1_cand_pairs"]), 2)

    # --- l5_progressive_decode: rows ARE the work quantity -----------
    # (per-row codec cost is constant by construction: image size
    # depends only on doc_id/n_chars mod 3 — so work grows exactly with
    # the document count; wall ratio below 10x = fixed-cost dilution)
    out["l5_sf1_docs"] = out["l2_sf1_docs"]
    out["l5_sf10_docs"] = out["l2_sf10_docs"]
    bs = json.load(open(os.path.join(REPO, "BENCH_sf10.json")))["queries"]
    ent = bs.get("l5_progressive_decode", {})
    if ent:
        out["l5_per_doc_ms_sf1"] = round(
            1000 * ent["sf1_sec"] / out["l5_sf1_docs"], 3)
        out["l5_per_doc_ms_sf10"] = round(
            1000 * ent["sf10_sec"] / out["l5_sf10_docs"], 3)

    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


def detection_cost() -> None:
    """r14 (r13 verdict #3): cost of salted_join's HOT-KEY DETECTION
    pass at sf1/sf10, sampled (the new 10% default) vs full — the r13
    shape ran `left.groupBy(key).count()` eagerly over the whole fact
    side, a second full read before the join's own scan. The scaling
    rule under measurement: detection reads a Bernoulli sample of the
    column-pruned key projection (~f× one key column), and the
    threshold is k× the mean rows-per-key from that same pass
    (scale-relative, so the hot set never degrades to "everything" as
    rows-per-key grows). Prints detection wall for both fractions plus
    the full j11/j16 query wall, at both tiers."""
    from pravega_flink_ai_flow_spark.queries import tables
    from pravega_flink_ai_flow_spark.queries.joins import (
        j11_salted_skew_join, j16_hot_salted_join)

    spark = bench.scale_session("salt-detection-cost")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for label in ("sf1", "sf10"):
        d = bench.normalize_layout(os.path.join(REPO, "testdata_scale",
                                                label))
        events, = tables(spark, d, "events")
        events.count()  # warm the file index
        for f_label, frac in (("f0.1", 0.1), ("full", 1.0)):
            keys = events.select("user_id")
            if frac < 1.0:
                keys = keys.sample(fraction=frac, seed=42)
            counts = keys.groupBy("user_id").count()
            walls = []
            for i in range(4):            # first run = codegen warmup
                t0 = time.perf_counter()
                mean = counts.agg(F.avg("count")).first()[0]
                hot = counts.filter(
                    F.col("count") > (mean or 0.0) * 15.0) \
                    .limit(1025).count()
                walls.append(time.perf_counter() - t0)
            out[f"detect_{label}_{f_label}_sec"] = round(
                sorted(walls[1:])[1], 3)
            out[f"detect_{label}_{f_label}_hot_keys"] = hot
        for qname, q in (("j11", j11_salted_skew_join),
                         ("j16", j16_hot_salted_join)):
            df = q(spark, d)
            df.write.format("noop").mode("overwrite").save()  # warm
            out[f"{qname}_{label}_total_sec"] = bench.median_noop_time(
                df, runs=4)
        out[f"detect_{label}_sample_saving"] = round(
            out[f"detect_{label}_full_sec"]
            / max(out[f"detect_{label}_f0.1_sec"], 1e-9), 2)
    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "detection":
        detection_cost()
    else:
        main()
