#!/usr/bin/env python
"""Normalized plan fingerprints for EVERY declared query — the
worktree plan-diff primitive behind the export-window rotation's
"(b) plan changed this round" list: run it at two revisions, diff the
hashes. Normalization strips expression ids (#123), plan ids, and
cached-relation serial numbers so only the SHAPE is hashed.

Usage: python tools/plan_fingerprint.py OUT.json [sf_dir]
"""
from __future__ import annotations

import hashlib
import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def normalize(plan: str) -> str:
    plan = re.sub(r"#\d+", "#N", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
    plan = re.sub(r"\[id=#?\d+\]", "[id=N]", plan)
    plan = re.sub(r"Statistics\([^)]*\)", "Statistics(N)", plan)
    # scratch dirs carry mkdtemp random suffixes; warehouse paths carry
    # per-checkout absolute prefixes — neither is plan shape
    plan = re.sub(r"file:[^\s,\]]+", "file:X", plan)
    plan = re.sub(r"Location: \S+ \[[^\]]*\]", "Location: X", plan)
    # lambda variable names carry a session-global counter (x_84, ...)
    # and RDD lineage ids a per-context serial — registry-order noise
    plan = re.sub(r"lambda [a-z]+_\d+", "lambda v", plan)
    plan = re.sub(r"RDD\[\d+\]", "RDD[N]", plan)
    return plan


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pravega_flink_ai_flow_spark.engine.session import get_spark
    from pravega_flink_ai_flow_spark.queries import load_all

    spark = get_spark("plan-fp")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    out = {}
    for name, q in sorted(registry.items()):
        try:
            # each query fingerprints against a cache-free session:
            # an earlier query's persist() otherwise rewrites LATER
            # plans' matching subtrees to InMemoryRelation, making the
            # fingerprint depend on registry ORDER, not shape
            spark.catalog.clearCache()
            df = q.fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            out[name] = hashlib.sha256(
                normalize(buf.getvalue()).encode()).hexdigest()[:16]
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERROR: {type(e).__name__}: {str(e)[:80]}"
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", out_path, len(out), "fingerprints")


if __name__ == "__main__":
    main()
