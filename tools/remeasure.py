#!/usr/bin/env python
"""Quiet single-query re-measurement into BENCH_sf1.json.

The 62-query scaling gate (tools/bench_scale.py) runs hot — queries
share one session with 61 neighbors, and the runbook's measured ±20%
(occasionally worse: l6_dup_span_removal recorded 5.74× there vs 1.95×
quiet, r9 verdict watch #4) means an artifact outlier needs a QUIET
second opinion before anyone believes it. This tool re-times the named
queries with the bench_scale protocol (same session confs, same
warmup-plus-median-of-3) but NOTHING else in the session, and updates
their entries in BENCH_sf1.json in place (totals/super_linear
recomputed), stamping each updated row with "quiet_remeasure": true.

Usage: python tools/remeasure.py [--tier sf1|sf10] query1 [...]   (quiet box)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main() -> None:
    # --tier sf10 re-measures the sf1 → sf10 decade into BENCH_sf10.json
    # (r11: the outlier re-checks were hand-rolled twice before this);
    # default stays the sf0.1 → sf1 decade into BENCH_sf1.json.
    args = sys.argv[1:]
    tier = "sf1"
    if args and args[0] == "--tier":
        tier = args[1]
        args = args[2:]
    names = args
    if not names:
        sys.exit("usage: remeasure.py [--tier sf1|sf10] query1 [query2 ...]")
    if tier == "sf1":
        small_dir, ks = "/root/testdata/sf0.1", "sf0.1_sec"
    elif tier == "sf10":
        small_dir = os.path.join(REPO, "testdata_scale", "sf1")
        ks = "sf1_sec"
    else:
        sys.exit(f"unknown tier {tier!r} (sf1 or sf10)")
    sf_small = bench.normalize_layout(small_dir)
    sf_big = bench.normalize_layout(
        os.path.join(REPO, "testdata_scale", tier))
    kb = f"{tier}_sec"

    from pravega_flink_ai_flow_spark.queries import load_all

    spark = bench.scale_session("remeasure")
    registry = load_all()

    def t_median(name: str, sf_dir: str) -> float:
        return bench.median_noop_time(registry[name].fn(spark, sf_dir))

    path = os.path.join(REPO, f"BENCH_{tier}.json")
    art = json.load(open(path))
    for name in names:
        ts = t_median(name, sf_small)
        tb = t_median(name, sf_big)
        art["queries"][name] = {
            ks: ts, kb: tb,
            "ratio_10x_data": round(tb / ts, 2) if ts else None,
            "quiet_remeasure": True,
        }
        print(f"{name}: {ts}s -> {tb}s  ({art['queries'][name]['ratio_10x_data']}x)",
              flush=True)

    art[f"total_{ks}"] = round(
        sum(r[ks] for r in art["queries"].values()), 3)
    art[f"total_{kb}"] = round(
        sum(r[kb] for r in art["queries"].values()), 3)
    art["total_ratio"] = round(
        art[f"total_{kb}"] / art[f"total_{ks}"], 2)
    # same flag criterion as tools/bench_scale.py — minus the operators
    # whose CONTRACT is quadratic (bench.QUADRATIC_BY_CONTRACT: the
    # brute-force all-pairs baselines; their ratios are reported
    # separately, not hidden)
    art["super_linear"] = sorted(
        n for n, r in art["queries"].items()
        if r["ratio_10x_data"] and r["ratio_10x_data"] > 10.0
        and n not in bench.QUADRATIC_BY_CONTRACT)
    art["quadratic_by_contract"] = {
        n: art["queries"][n]["ratio_10x_data"]
        for n in sorted(bench.QUADRATIC_BY_CONTRACT)
        if n in art["queries"]}
    with open(path, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(f"updated {path}: total_ratio={art['total_ratio']} "
          f"super_linear={art['super_linear']}")


if __name__ == "__main__":
    main()
