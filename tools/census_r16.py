#!/usr/bin/env python
"""r16 plan census (verdict item 7): for EVERY declared query, dump the
formatted plan and count (a) parquet scans per source table, (b) scan
nodes whose (table, PushedFilters, ReadSchema) signature appears more
than once — the duplicated-subtree smell the r15 window rewrites
removed — plus the standing smells (CartesianProduct, BatchEvalPython).

Writes CENSUS_r16.json at the repo root. Rows-only output; judgment
(which multi-scans are by-design) lives in OPTIMIZATION_r16.md.

Usage: python tools/census_r16.py [sf_dir]
"""
from __future__ import annotations

import io
import json
import os
import re
import sys
from collections import Counter
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pravega_flink_ai_flow_spark.engine.session import get_spark
    from pravega_flink_ai_flow_spark.queries import load_all

    spark = get_spark("census-r16")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    out: dict = {}
    for name, q in sorted(registry.items()):
        try:
            df = q.fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
            continue
        # one record per scan DETAIL block: "(n) Scan parquet" entries
        # carry Location/PushedFilters/ReadSchema lines below them
        scans = re.findall(
            r"\(\d+\) Scan parquet ?\n(?:Output.*\n)?"
            r"(?:Batched.*\n)?Location:.*?\[(?:file:)?([^\]]+)\]\n"
            r"(?:ReadSchema: (.*)\n)?(?:PushedFilters: (.*)\n)?",
            plan)
        sigs = Counter()
        tables = Counter()
        for loc, schema, filt in scans:
            table = os.path.basename(loc.rstrip("/")).replace(".parquet", "")
            tables[table] += 1
            sigs[(table, schema or "", filt or "")] += 1
        dup_sigs = {f"{t}|{s[:60]}|{f[:60]}": n
                    for (t, s, f), n in sigs.items() if n > 1}
        rec = {
            "scans_per_table": dict(tables),
            "dup_scan_signatures": dup_sigs,
            "n_exchanges": plan.count("(Exchange"),
            "exchange_mentions": len(re.findall(r"\(\d+\) Exchange", plan)),
            "joins": len(re.findall(r"\(\d+\) \w*Join", plan)),
            "cartesian": "CartesianProduct" in plan,
            "batch_eval_python": "BatchEvalPython" in plan,
        }
        out[name] = rec

    flagged = {n: r for n, r in out.items()
               if r.get("dup_scan_signatures") or r.get("cartesian")
               or r.get("batch_eval_python")}
    res = {"sf_dir": sf_dir, "n_queries": len(out),
           "n_flagged": len(flagged),
           "flagged": {n: out[n] for n in sorted(flagged)},
           "queries": out}
    with open(os.path.join(REPO, "CENSUS_r16.json"), "w") as fh:
        json.dump(res, fh, indent=1, default=str)
    print(f"{len(out)} plans, {len(flagged)} flagged")
    for n in sorted(flagged):
        print("  ", n, json.dumps(flagged[n]["dup_scan_signatures"]),
              "cart" if flagged[n]["cartesian"] else "",
              "bep" if flagged[n]["batch_eval_python"] else "")


if __name__ == "__main__":
    main()
