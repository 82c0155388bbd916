#!/usr/bin/env python
"""A/B the r9 forced spread() at sf0.1 AND sf1 (r9 verdict, next #3).

r9 switched the codec queries' skinny-meta repartition to
``spread(..., force=True)`` because a file scan's partition COUNT lies
(byte splits >= cores with rows clustered in a few) — justified by sf1
measurements (4-way -> 32-way) but shipped UNMEASURED at sf0.1, where
the committed sweep showed the three changed queries 0.2-0.5 s slower.
This tool measures both variants of every force=True codec query at
both scales in ONE quiet session and writes AB_SPREAD.json so the
decision rests on numbers.

Variants:
- force:       the shipped code (unconditional repartition)
- conditional: spread() falls back to the partition-count gate
               (repartition only when scan partitions < cores)

Protocol: per (scale, query, variant): rebuild the plan (the variant
is a plan-construction difference), one untimed warmup, then 3 timed
noop-sink runs; report the median of the post-cold runs. Variants
alternate within one session so box drift hits both equally.

Usage: python tools/ab_spread.py   (quiet box — nothing else running)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

QUERIES = [
    "l5_image_decode", "l5_jpeg_decode", "l5_progressive_decode",
    "l5_interlaced_decode", "l5_mixed_codec_decode", "l5_audio_decode",
    "l5_image_resize", "l5_audio_features", "l5_image_phash",
    "l5_gif_decode",   # r11: the GIF codec query ships the same rule
]


def main() -> None:
    sf_small = bench.normalize_layout("/root/testdata/sf0.1")
    sf_big_raw = os.path.join(REPO, "testdata_scale", "sf1")
    if not os.path.isdir(sf_big_raw):
        sys.exit(f"{sf_big_raw} missing — run tools/make_sf_scale.py")
    sf_big = bench.normalize_layout(sf_big_raw)

    from pravega_flink_ai_flow_spark.ops.partitioning import (
        spread as real_spread,
    )
    from pravega_flink_ai_flow_spark.queries import load_all
    import pravega_flink_ai_flow_spark.queries.multimodal as qm

    def conditional_spread(df, target=None, *, force=False):
        return real_spread(df, target, force=False)

    spark = bench.scale_session("ab-spread")
    registry = load_all()

    def run_one(name: str, sf_dir: str, variant: str) -> float:
        qm.spread = real_spread if variant == "force" else conditional_spread
        try:
            return bench.median_noop_time(registry[name].fn(spark, sf_dir))
        finally:
            qm.spread = real_spread

    out = {"queries": {}}
    for scale, sf_dir in (("sf0.1", sf_small), ("sf1", sf_big)):
        for name in QUERIES:
            rec = out["queries"].setdefault(name, {})
            for variant in ("force", "conditional"):
                rec[f"{scale}_{variant}_sec"] = run_one(name, sf_dir,
                                                        variant)
            print(f"{scale:6s} {name:24s} force "
                  f"{rec[f'{scale}_force_sec']:7.3f}s  cond "
                  f"{rec[f'{scale}_conditional_sec']:7.3f}s", flush=True)

    tot = {f"{s}_{v}": round(sum(r[f"{s}_{v}_sec"]
                                 for r in out["queries"].values()), 3)
           for s in ("sf0.1", "sf1") for v in ("force", "conditional")}
    out["totals"] = tot
    path = os.path.join(REPO, "AB_SPREAD.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(tot, indent=1, sort_keys=True))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
