#!/usr/bin/env python
"""Measure the ZIPFIAN branch of the dedup plan-family decisions.

Two plan choices were made on the FLAT synthetic corpus and defer their
alternative to "Zipfian corpora" in docstrings (r8 verdict, next #2):

1. containment: count-based inverted index + post-agg size joins
   (:func:`ops.dedup.containment_pairs`, the declared plan) vs the
   asymmetric small-side prefix filter
   (:func:`ops.dedup.containment_pairs_prefix`);
2. incremental jaccard candidates: in-row hash-ordered prefixes
   (:func:`ops.dedup.jaccard_hash_prefix_candidates_between`, the
   declared plan since r9) vs df-ordered prefixes
   (:func:`ops.dedup.jaccard_prefix_candidates_between`).

This tool times both members of each pair on the Zipfian corpora from
tools/make_zipf_corpus.py (df head: max shingle df ≈ 19 % of docs;
co-shingle pair work grows ~98× for 10× docs — measured 2.71 M →
265 M), asserts both plans agree on the output (exactness is the
contract), and writes BENCH_zipf.json with per-plan seconds and
10×-data ratios. The artifact is what turns each docstring's "on a
Zipfian corpus the ranking inverts" from an argument into a number.

Usage: python tools/bench_zipf.py [small_dir] [big_dir]
                                  [huge_bounded_dir] [huge_heaps_dir]
Defaults: <repo>/testdata_scale/zipf0.1  <repo>/testdata_scale/zipf1
          <repo>/testdata_scale/zipf10   <repo>/testdata_scale/zipf10h
          (each huge tier is optional — skipped when its directory is
          absent; zipf10 is the bounded-vocab adversary, zipf10h the
          Heaps'-law-scaled realistic shape)

The optional HUGE tier (r9 verdict, next #5: one more decade) runs the
SURVIVING prefix plans only — the count/hash plans are measured
quadratic at the 10× step (72×/12.8×) and re-running a known loser at
100× would take hours to prove nothing — and records their
ratio_10x_huge so the dispatcher's chosen plans are evidenced across
TWO decades of Zipfian growth.
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
    """BEST of `runs` noop-writes (the heavy plans here run minutes, so
    runs stays small and min is the noise-robust pick; the artifact
    numbers are best-of-2, not medians)."""
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(min(samples), 2)


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "testdata_scale", "zipf0.1")
    big = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "testdata_scale", "zipf1")

    from pravega_flink_ai_flow_spark.engine.session import get_spark
    from pravega_flink_ai_flow_spark.ops import dedup

    spark = get_spark("bench-zipf")
    out: dict = {"corpora": {}, "plans": {}}

    def arrs_of(sf_dir):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        return dedup.shingle_arrays(dedup.spread(docs),
                                    "doc_id", "text", 3).persist()

    def split_of(arrs):
        new = arrs.filter(F.col("id") % 10 >= 8)
        corpus = arrs.filter(F.col("id") % 10 < 8)
        return new, corpus

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

    for label, sf_dir in (("small", small), ("big", big)):
        arrs = arrs_of(sf_dir)
        n_docs = arrs.count()
        # the dispatch signal + the routes the auto entry points take —
        # recorded so the artifact shows dispatch choosing the measured
        # winner on the skewed corpus (and would expose a mis-route)
        head = dedup.shingle_df_head_ratio(arrs)
        route = dedup.auto_route(head, n_docs)
        out["corpora"][label] = {
            "dir": sf_dir, "n_docs": n_docs,
            "df_head_ratio": round(head, 4),
            "auto_route": route,
            "auto_containment_route": {
                "flat": "count", "zipf_exact": "prefix",
                "lsh": "lsh"}[route],
            "auto_jaccard_route": {
                "flat": "hash_prefix", "zipf_exact": "df_prefix",
                "lsh": "lsh_banding"}[route],
        }
        print(f"== {label}: {n_docs} docs, df head {head:.4f} -> "
              f"route {route}", flush=True)

        # --- containment: count plan vs prefix plan
        count_plan = dedup.containment_pairs(arrs, threshold=0.6)
        prefix_plan = dedup.containment_pairs_prefix(arrs, threshold=0.6)
        t_count = _time(count_plan)
        t_prefix = _time(prefix_plan)
        n_count = count_plan.count()
        n_prefix = prefix_plan.count()
        assert n_count == n_prefix, (n_count, n_prefix)
        out["plans"].setdefault("containment_count", {})[label] = t_count
        out["plans"].setdefault("containment_prefix", {})[label] = t_prefix
        print(f"   containment: count={t_count}s prefix={t_prefix}s "
              f"({n_count} pairs)", flush=True)

        # --- incremental jaccard: hash-order vs df-order generators
        arrs_n, arrs_c = split_of(arrs)
        hash_gen = verified_jaccard(
            dedup.jaccard_hash_prefix_candidates_between(
                arrs_n, arrs_c, threshold=0.7), arrs_n, arrs_c)
        df_gen = verified_jaccard(
            dedup.jaccard_prefix_candidates_between(
                arrs_n, arrs_c, threshold=0.7), arrs_n, arrs_c)
        t_hash = _time(hash_gen)
        t_df = _time(df_gen)
        n_hash = hash_gen.count()
        n_df = df_gen.count()
        assert n_hash == n_df, (n_hash, n_df)
        out["plans"].setdefault("jaccard_hash_prefix", {})[label] = t_hash
        out["plans"].setdefault("jaccard_df_prefix", {})[label] = t_df
        print(f"   incremental: hash={t_hash}s df={t_df}s "
              f"({n_hash} pairs)", flush=True)
        arrs.unpersist()

    # --- second decade (500 k docs), two corpus shapes (r9 verdict #5
    # asked "does the chosen plan hold at the next 10x?" — the answer
    # turned out to depend on VOCABULARY growth, so both shapes are
    # measured):
    #
    # 1. huge_bounded (zipf10): 10x docs over the SAME 30 k vocabulary.
    #    Adversarial: every shingle's df grows linearly with n, so ANY
    #    exact candidate generator is intrinsically quadratic — first
    #    measured here (prefix plans 37x/27x for 10x docs). The
    #    production answer on this shape is the LSH banding path
    #    (recall ~99 % at j>=0.7), measured alongside.
    # 2. huge_heaps (zipf10h): 10x docs with vocabulary grown by
    #    Heaps' law (~n^0.75, 30 k -> 169 k words). Real corpora grow
    #    vocabulary; tail-shingle dfs stay bounded and the prefix
    #    plans' near-linear scaling is the claim under test.
    huge_b = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, "testdata_scale", "zipf10")
    huge_h = sys.argv[4] if len(sys.argv) > 4 else os.path.join(
        REPO, "testdata_scale", "zipf10h")

    def prefix_pair_times(arrs):
        t_cont = _time(dedup.containment_pairs_prefix(arrs, threshold=0.6))
        arrs_n, arrs_c = split_of(arrs)
        t_jac = _time(verified_jaccard(
            dedup.jaccard_prefix_candidates_between(
                arrs_n, arrs_c, threshold=0.7), arrs_n, arrs_c))
        return t_cont, t_jac

    def containment_lsh_recall(arrs, label):
        """Escalated-containment wall + recall floor vs the exact plan
        (r11: the dispatcher routes here above _SCALE_DISPATCH_DOCS, so
        the artifact must carry what the route trades away). Precision
        is exact by construction (shared verify); recall is counted on
        the skinny pair sets."""
        exact = dedup.containment_pairs_prefix(arrs, threshold=0.6) \
            .select("id_a", "id_b").persist()
        lsh = dedup.containment_pairs_lsh(arrs, threshold=0.6)
        t_lsh = _time(lsh)
        lp = lsh.select("id_a", "id_b").persist()
        n_exact, n_lsh = exact.count(), lp.count()
        n_hit = lp.join(exact, ["id_a", "id_b"]).count()
        recall = round(n_hit / n_exact, 4) if n_exact else 1.0
        out["plans"].setdefault("containment_lsh", {})[label] = t_lsh
        out["corpora"][label]["containment_lsh_recall"] = recall
        out["corpora"][label]["containment_pairs_exact"] = n_exact
        print(f"   containment lsh={t_lsh}s recall={recall} "
              f"({n_hit}/{n_exact} exact pairs)", flush=True)
        exact.unpersist()
        lp.unpersist()

    if os.path.isdir(huge_b):
        arrs = arrs_of(huge_b)
        n_docs = arrs.count()
        head = dedup.shingle_df_head_ratio(arrs)
        out["corpora"]["huge_bounded"] = {
            "dir": huge_b, "n_docs": n_docs,
            "df_head_ratio": round(head, 4),
            "auto_route": dedup.auto_route(head, n_docs),
            "note": "bounded 30k vocab at 500k docs: df ~ n for every "
                    "shingle, exact candidate generation intrinsically "
                    "quadratic; LSH is the measured survivor and (r11) "
                    "the dispatched route",
        }
        print(f"== huge_bounded: {n_docs} docs, df head {head:.4f} -> "
              f"route {dedup.auto_route(head, n_docs)}", flush=True)
        t_cont, t_jac = prefix_pair_times(arrs)
        out["plans"]["containment_prefix"]["huge_bounded"] = t_cont
        out["plans"]["jaccard_df_prefix"]["huge_bounded"] = t_jac
        print(f"   prefix: containment={t_cont}s jaccard={t_jac}s",
              flush=True)
        containment_lsh_recall(arrs, "huge_bounded")
        # the approximate path on the adversarial shape; the df-capped
        # variant (ops/dedup.cap_shingle_df before signatures) is
        # measured alongside — it came back wall-NEUTRAL (hot bands
        # were not the residual driver; the cap's value is pair
        # quality), and the artifact records that finding either way
        def lsh_time(a):
            arrs_n, arrs_c = split_of(a)
            return _time(verified_jaccard(
                dedup.lsh_candidate_pairs_between(
                    dedup.minhash_signatures_arrow(arrs_n, 64),
                    dedup.minhash_signatures_arrow(arrs_c, 64), 64, 16),
                arrs_n, arrs_c))

        t_lsh = lsh_time(arrs)
        out["plans"].setdefault("jaccard_lsh_banding", {})[
            "huge_bounded"] = t_lsh
        # recall floor of the escalated jaccard route: verified LSH
        # output vs the verified exact-generator output (was a prose
        # "~99 %" claim — now a recorded number)
        arrs_n, arrs_c = split_of(arrs)
        exact_j = verified_jaccard(
            dedup.jaccard_prefix_candidates_between(
                arrs_n, arrs_c, threshold=0.7), arrs_n, arrs_c).persist()
        lsh_j = verified_jaccard(
            dedup.lsh_candidate_pairs_between(
                dedup.minhash_signatures_arrow(arrs_n, 64),
                dedup.minhash_signatures_arrow(arrs_c, 64), 64, 16),
            arrs_n, arrs_c).persist()
        n_ej, n_lj = exact_j.count(), lsh_j.count()
        n_hit = lsh_j.join(exact_j, ["id_new", "id_corpus"]).count()
        j_recall = round(n_hit / n_ej, 4) if n_ej else 1.0
        out["corpora"]["huge_bounded"]["jaccard_lsh_recall"] = j_recall
        out["corpora"]["huge_bounded"]["jaccard_pairs_exact"] = n_ej
        print(f"   jaccard lsh recall={j_recall} ({n_hit}/{n_ej})",
              flush=True)
        exact_j.unpersist()
        lsh_j.unpersist()
        capped = dedup.cap_shingle_df(arrs).persist()
        t_capped = lsh_time(capped)
        out["plans"].setdefault("jaccard_lsh_banding_dfcap", {})[
            "huge_bounded"] = t_capped
        print(f"   lsh banding={t_lsh}s df-capped={t_capped}s",
              flush=True)
        capped.unpersist()
        arrs.unpersist()

    if os.path.isdir(huge_h):
        arrs = arrs_of(huge_h)
        n_docs = arrs.count()
        head = dedup.shingle_df_head_ratio(arrs)
        out["corpora"]["huge_heaps"] = {
            "dir": huge_h, "n_docs": n_docs,
            "df_head_ratio": round(head, 4),
            "auto_route": dedup.auto_route(head, n_docs),
            "note": "Heaps-law vocabulary (~n^0.75) at 500k docs — the "
                    "realistic growth shape the prefix plans are "
                    "designed for",
        }
        print(f"== huge_heaps: {n_docs} docs, df head {head:.4f}",
              flush=True)
        t_cont, t_jac = prefix_pair_times(arrs)
        out["plans"]["containment_prefix"]["huge_heaps"] = t_cont
        out["plans"]["jaccard_df_prefix"]["huge_heaps"] = t_jac
        print(f"   prefix: containment={t_cont}s jaccard={t_jac}s",
              flush=True)
        arrs.unpersist()

    # LSH at the first decade too, for the bounded-shape 10x ratios
    if "jaccard_lsh_banding" in out["plans"]:
        arrs = arrs_of(big)

        def lsh_time_big(a):
            arrs_n, arrs_c = split_of(a)
            return _time(verified_jaccard(
                dedup.lsh_candidate_pairs_between(
                    dedup.minhash_signatures_arrow(arrs_n, 64),
                    dedup.minhash_signatures_arrow(arrs_c, 64), 64, 16),
                arrs_n, arrs_c))

        t_lsh = lsh_time_big(arrs)
        out["plans"]["jaccard_lsh_banding"]["big"] = t_lsh
        capped = dedup.cap_shingle_df(arrs).persist()
        t_capped = lsh_time_big(capped)
        out["plans"]["jaccard_lsh_banding_dfcap"]["big"] = t_capped
        print(f"   lsh banding @50k={t_lsh}s df-capped={t_capped}s",
              flush=True)
        capped.unpersist()
        containment_lsh_recall(arrs, "big")   # first-decade recall point
        arrs.unpersist()

    for plan, d in out["plans"].items():
        if "small" in d and "big" in d:
            d["ratio_10x"] = (round(d["big"] / d["small"], 2)
                              if d["small"] else None)
        if "huge_bounded" in d and "big" in d:
            d["ratio_10x_bounded_vocab"] = round(
                d["huge_bounded"] / d["big"], 2)
        if "huge_heaps" in d and "big" in d:
            d["ratio_10x_heaps_vocab"] = round(
                d["huge_heaps"] / d["big"], 2)

    path = os.path.join(REPO, "BENCH_zipf.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}")
    print(json.dumps(out["plans"], indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
