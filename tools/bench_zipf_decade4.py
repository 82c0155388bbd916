#!/usr/bin/env python
"""FOURTH Zipf decade (r11 verdict #7): 5 M docs, Heaps-law vocabulary
(30 k × 100^0.75 ≈ 949 k words — vocabulary keeps growing the way real
corpora do). The corpus-scale dispatcher's crossover is anchored at the
500 k-doc tier; this measures one decade past it:

- the dispatch signal (df head ratio + n_docs) must still route `lsh`;
- jaccard LSH-banding wall at 5 M vs the SAME-SHAPE 500 k tier
  (zipf10h) → the honest per-decade slope (the r11 16×/decade figure
  compared across SHAPES — bounded-vocab 500 k over Heaps 50 k);
- LSH recall vs the exact df-prefix generator must hold ≥ 0.98.

Containment stays un-re-measured here: its exact ground truth at 5 M
is a ~15-minute single run that adds no routing information (the
jaccard family exercises the same banded-LSH machinery and the same
dispatcher), and the 500 k containment recall points stand.

MERGES a `decade4` tier into BENCH_zipf.json (never rewrites the other
tiers — the full bench_zipf.py run stays the canonical generator).

Usage:  SPARK_DRIVER_MEMORY=32g python tools/bench_zipf_decade4.py \
            [decade4_dir]          (default testdata_scale/zipf100h;
                                    generate with tools/make_zipf_corpus.py
                                    <dir> 5000000 949000)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _time(df, runs=2):
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(min(samples), 2)


def main() -> None:
    d4 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "testdata_scale", "zipf100h")
    huge_h = os.path.join(REPO, "testdata_scale", "zipf10h")
    if not os.path.isdir(d4):
        sys.exit(f"{d4} missing — tools/make_zipf_corpus.py {d4} "
                 "5000000 949000 first")

    from pravega_flink_ai_flow_spark.engine.session import get_spark
    from pravega_flink_ai_flow_spark.ops import dedup

    spark = get_spark("bench-zipf-decade4")
    spark.sparkContext.setLogLevel("ERROR")

    def arrs_of(sf_dir):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        return dedup.shingle_arrays(dedup.spread(docs),
                                    "doc_id", "text", 3).persist()

    def split_of(arrs):
        return (arrs.filter(F.col("id") % 10 >= 8),
                arrs.filter(F.col("id") % 10 < 8))

    def verified_jaccard(cands, arrs_n, arrs_c, t=0.7):
        sa = arrs_n.select(F.col("id").alias("id_new"),
                           F.col("shingles").alias("__sa"))
        sb = arrs_c.select(F.col("id").alias("id_corpus"),
                           F.col("shingles").alias("__sb"))
        n_common = F.size(F.array_intersect("__sa", "__sb"))
        j = n_common / (F.size("__sa") + F.size("__sb") - n_common)
        return (cands.join(sa, "id_new").join(sb, "id_corpus")
                .withColumn("jaccard", j).filter(F.col("jaccard") >= t)
                .select("id_new", "id_corpus"))

    def lsh_plan(arrs):
        arrs_n, arrs_c = split_of(arrs)
        return verified_jaccard(
            dedup.lsh_candidate_pairs_between(
                dedup.minhash_signatures_arrow(arrs_n, 64),
                dedup.minhash_signatures_arrow(arrs_c, 64), 64, 16),
            arrs_n, arrs_c)

    path = os.path.join(REPO, "BENCH_zipf.json")
    out = json.load(open(path))

    # same-shape baseline: LSH at the 500 k Heaps tier (the committed
    # artifact only has LSH on the bounded shape)
    if os.path.isdir(huge_h) and \
            "huge_heaps" not in out["plans"].get("jaccard_lsh_banding", {}):
        arrs_h = arrs_of(huge_h)
        t = _time(lsh_plan(arrs_h))
        out["plans"].setdefault("jaccard_lsh_banding", {})["huge_heaps"] = t
        print(f"huge_heaps lsh banding={t}s", flush=True)
        arrs_h.unpersist()

    arrs = arrs_of(d4)
    n_docs = arrs.count()
    head = dedup.shingle_df_head_ratio(arrs)
    route = dedup.auto_route(head, n_docs)
    out["corpora"]["decade4"] = {
        "dir": d4, "n_docs": n_docs,
        "df_head_ratio": round(head, 4),
        "auto_route": route,
        "note": "FOURTH decade: 5M docs, Heaps-law vocabulary "
                "(~949k words); confirms the 500k-anchored dispatcher "
                "crossover and the LSH slope one decade further out",
    }
    print(f"== decade4: {n_docs} docs, df head {head:.4f} -> route "
          f"{route}", flush=True)

    t_lsh = _time(lsh_plan(arrs))
    out["plans"].setdefault("jaccard_lsh_banding", {})["decade4"] = t_lsh
    print(f"   lsh banding={t_lsh}s", flush=True)
    capped = dedup.cap_shingle_df(arrs).persist()
    t_capped = _time(lsh_plan(capped))
    out["plans"].setdefault("jaccard_lsh_banding_dfcap", {})[
        "decade4"] = t_capped
    print(f"   lsh banding df-capped={t_capped}s", flush=True)
    capped.unpersist()

    # recall floor vs the exact df-prefix generator (single run — it is
    # the ground truth; its wall is recorded as a single-sample figure)
    arrs_n, arrs_c = split_of(arrs)
    t0 = time.perf_counter()
    exact_j = verified_jaccard(
        dedup.jaccard_prefix_candidates_between(
            arrs_n, arrs_c, threshold=0.7), arrs_n, arrs_c).persist()
    n_ej = exact_j.count()
    t_exact = round(time.perf_counter() - t0, 2)
    out["plans"].setdefault("jaccard_df_prefix", {})["decade4"] = t_exact
    lsh_j = lsh_plan(arrs).persist()
    n_lj = lsh_j.count()
    n_hit = lsh_j.join(exact_j, ["id_new", "id_corpus"]).count()
    recall = round(n_hit / n_ej, 4) if n_ej else 1.0
    out["corpora"]["decade4"]["jaccard_lsh_recall"] = recall
    out["corpora"]["decade4"]["jaccard_pairs_exact"] = n_ej
    print(f"   exact df-prefix={t_exact}s ({n_ej} pairs); lsh recall="
          f"{recall} ({n_hit}/{n_ej}, lsh found {n_lj})", flush=True)
    exact_j.unpersist()
    lsh_j.unpersist()
    arrs.unpersist()

    lsh = out["plans"]["jaccard_lsh_banding"]
    if "huge_heaps" in lsh:
        lsh["ratio_decade4_same_shape"] = round(
            lsh["decade4"] / lsh["huge_heaps"], 2)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"merged decade4 into {path}")


if __name__ == "__main__":
    main()
