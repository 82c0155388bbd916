#!/usr/bin/env python
"""Time a NAMED subset of declared queries in one engine session —
the surgical companion to time_all.py for optimization A/B loops:
one warmup + N timed noop-sink runs per query, min of the steady runs
reported. Prints one line per query and a JSON tail; writes nothing.

Usage: python tools/time_subset.py [--sf sf_dir] [--runs N] q1 [q2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    sf_dir, runs = "/root/testdata/sf0.1", 3
    while args and args[0].startswith("--"):
        if args[0] == "--sf":
            sf_dir = args[1]
        elif args[0] == "--runs":
            runs = int(args[1])
        args = args[2:]
    names = args
    if not names:
        sys.exit("usage: time_subset.py [--sf dir] [--runs N] q1 [q2 ...]")

    from pravega_flink_ai_flow_spark.engine.session import get_spark
    from pravega_flink_ai_flow_spark.queries import load_all

    spark = get_spark("time-subset")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    unknown = [n for n in names if n not in registry]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time_subset: {name}")
        samples = []
        for i in range(runs):
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        out[name] = round(min(samples[1:]), 3)
        print(f"{out[name]:7.3f}  {name}   (all: "
              f"{' '.join(f'{s:.3f}' for s in samples)})")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
