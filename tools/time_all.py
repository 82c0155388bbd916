#!/usr/bin/env python
"""Time EVERY declared query at a scale factor (default sf0.1) — the
breadth companion to bench.py's 17-query headline: one warmup run and
two timed runs per query (min reported), full-plan execution via noop
sink. Writes TIMINGS.json at the repo root and prints the total plus
the slowest 15.

Usage: python tools/time_all.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pravega_flink_ai_flow_spark.engine.session import get_spark
    from pravega_flink_ai_flow_spark.queries import load_all

    spark = get_spark("time-all")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, q in sorted(registry.items()):
        try:
            runs = []
            for i in range(3):
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs[1:]), 3)
        except Exception as e:  # noqa: BLE001 — record, keep timing others
            failures[name] = f"{type(e).__name__}: {str(e)[:200]}"

    # structural end-of-round guard (r12 verdict #7: m10 was born one
    # commit after the final TIMINGS run, so the artifact covered
    # 215/216): the artifact must cover the ENTIRE registry it was run
    # against, or say loudly that it doesn't
    missing = sorted(set(registry) - set(timings) - set(failures))
    assert not missing, (
        f"TIMINGS is stale vs the registry: {len(missing)} declared "
        f"queries never ran: {missing}")
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(timings),
        "registry_size": len(registry),
        "total_steady_sec": round(sum(timings.values()), 3),
        "failures": failures,
        "queries": timings,
    }
    path = os.path.join(REPO, "TIMINGS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in
                      ("sf_dir", "n_queries", "total_steady_sec", "failures")}))
    worst = sorted(timings.items(), key=lambda kv: -kv[1])[:15]
    for name, t in worst:
        print(f"  {t:6.2f}s  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
