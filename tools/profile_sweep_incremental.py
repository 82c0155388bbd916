#!/usr/bin/env python
"""Profile l2_incremental_dedup INSIDE a sweep session (r10 verdict #2).

The 207-query sweep (tools/time_all.py) has reported ~4.1 s for this
query for three rounds while every quiet re-measure says ~1.0 s. This
script reproduces the sweep environment incrementally: it runs the
alphabetical sweep prefix (every declared query before
l2_incremental_dedup, 3 runs each, exactly like time_all.py), timing
the target query after every K prefix queries, and records the JVM
storage-memory + cached-RDD count alongside — so the output localizes
WHICH prefix query (or which accumulated state) buys the 3 s.

Usage: python tools/profile_sweep_incremental.py [sf_dir] [checkpoint_every]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TARGET = "l2_incremental_dedup"


def _storage_stats(spark) -> dict:
    """Best-effort storage snapshot. Reaches through py4j internals
    (getExecutorMemoryStatus, Tuple2 accessors) that are NOT public
    PySpark API and can vanish on a Spark upgrade — degrade to {}
    rather than abort a profiling run after its expensive prefix sweep
    (r11 advice)."""
    try:
        sc = spark.sparkContext
        jsc = sc._jsc.sc()
        rdds = jsc.getPersistentRDDs()
        n_cached = rdds.size()
        # executor memory status: used storage across block managers
        mem = jsc.getExecutorMemoryStatus()
        it = mem.iterator()
        total_remaining = 0
        total_max = 0
        while it.hasNext():
            kv = it.next()
            total_max += kv._2()._1()
            total_remaining += kv._2()._2()
        return {
            "cached_rdds": n_cached,
            "storage_used_mb": round((total_max - total_remaining) / 2**20,
                                     1),
            "storage_max_mb": round(total_max / 2**20, 1),
        }
    except Exception:
        return {}


def _time_query(fn, spark, sf_dir, runs=3) -> list[float]:
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    every = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from pravega_flink_ai_flow_spark.engine.session import get_spark
    from pravega_flink_ai_flow_spark.queries import load_all

    spark = get_spark("profile-sweep-incremental")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    names = sorted(registry)
    prefix = [n for n in names if n < TARGET]

    checkpoints = []
    # baseline: quiet, cold session
    quiet = _time_query(registry[TARGET].fn, spark, sf_dir)
    checkpoints.append({"after": 0, "last_prefix": None,
                        "target_runs": quiet, **_storage_stats(spark)})
    print(json.dumps(checkpoints[-1]), flush=True)

    for i, name in enumerate(prefix, 1):
        try:
            _time_query(registry[name].fn, spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"prefix {name} failed: {e}", file=sys.stderr)
        if i % every == 0 or i == len(prefix):
            t = _time_query(registry[TARGET].fn, spark, sf_dir)
            checkpoints.append({"after": i, "last_prefix": name,
                                "target_runs": t, **_storage_stats(spark)})
            print(json.dumps(checkpoints[-1]), flush=True)

    out = {"sf_dir": sf_dir, "target": TARGET, "checkpoints": checkpoints}
    with open(os.path.join(REPO, "PROFILE_incremental.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
