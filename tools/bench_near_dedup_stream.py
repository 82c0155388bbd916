#!/usr/bin/env python
"""Streaming near-dedup throughput (r10 verdict next #6): the
exactly-once ingest writer has a floor-gated artifact (28.5 k rows/s,
tools/bench_socket_stream.py) but `streaming_near_dedup` — the
cross-batch LSH suppression with a persistent signature store
(streaming/ops.py) — had correctness pytest and no throughput number.

This drives the sf0.1 documents table (5 000 docs) through the
stream-dir transport in ≥10 micro-batches (one segment file per
trigger), so the signature/bands store GROWS across the drain and the
probe-path per-batch cost is measured against an accumulating corpus,
exactly the production shape. Reports sustained rows/s over the whole
drain plus the first/last micro-batch durations (a growing per-batch
cost would show as last >> first — the banded-probe design claims
O(batch), not O(store)). Merges a `near_dedup` entry + floor into
BENCH_stream.json.

Usage: python tools/bench_near_dedup_stream.py  (quiet box)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Sustained floor for the 10-micro-batch drain: measured ~254 rows/s
# quiet after the r13 fixed-cost compression (500-doc batches at
# ~2.0 s/batch of FIXED micro-batch cost: one raw batch count, the
# shuffle-free broadcast plan materializing into the store append, and
# the bands append racing it in a parallel thread; the idempotency
# scans run only on checkpoint retry — not per-row work: the big-batch
# arm below and the flat last-vs-first batch duration prove it). The
# floor catches an order-of-magnitude regression, not run-to-run noise.
FLOOR_ROWS_PER_SEC = 120
N_BATCHES = 10
N_BATCHES_BIG = 2   # second arm: same rows, 2500-doc batches —
                    # rows/s scales with batch size when cost is
                    # per-batch-fixed, and WOULD NOT if it were
                    # per-row or per-store-size


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pravega_flink_ai_flow_spark.engine.session import get_spark
    from pravega_flink_ai_flow_spark.io.pravega_sim import StreamDir
    from pravega_flink_ai_flow_spark.queries import tables
    from pravega_flink_ai_flow_spark.streaming import ops as st

    spark = get_spark("bench-near-dedup-stream")
    spark.sparkContext.setLogLevel("ERROR")

    (docs,) = tables(spark, sf_dir, "documents")
    docs = docs.select("doc_id", "text")
    n_rows = docs.count()
    def drain(tag: str, n_batches: int) -> dict:
        work = tempfile.mkdtemp(prefix=f"near_dedup_{tag}_")
        try:
            stream = StreamDir(os.path.join(work, "docs-stream"),
                               docs.schema)
            # one segment file per batch tier: N appends of 1 file each
            # so maxFilesPerTrigger=1 yields exactly N micro-batches in
            # doc_id order (store grows monotonically under the drain)
            for b in range(n_batches):
                stream.append(
                    docs.filter((docs.doc_id % n_batches) == b)
                        .coalesce(1))
            store = os.path.join(work, "sig_store")
            t0 = time.perf_counter()
            q = st.streaming_near_dedup(
                stream.read_stream(spark, max_files_per_trigger=1),
                store_dir=store,
                checkpoint=os.path.join(work, "ck"),
                threshold=0.7)
            q.awaitTermination()
            wall = time.perf_counter() - t0
            prog = [p for p in (q.recentProgress or [])
                    if p.get("numInputRows", 0) > 0]
            batch_ms = [p["batchDuration"] for p in prog]
            survivors = spark.read.parquet(store).count()
            return {
                "rows_per_sec": round(n_rows / wall, 1),
                "sec": round(wall, 2),
                "n_rows": n_rows,
                "n_batches": len(batch_ms),
                "first_batch_ms": batch_ms[0] if batch_ms else None,
                "last_batch_ms": batch_ms[-1] if batch_ms else None,
                "survivors_in_store": survivors,
            }
        finally:
            shutil.rmtree(work, ignore_errors=True)

    drain("warm", 2)                 # codegen/stream machinery, untimed
    entry = drain("main", N_BATCHES)
    big = drain("big", N_BATCHES_BIG)

    path = os.path.join(REPO, "BENCH_stream.json")
    art = json.load(open(path)) if os.path.exists(path) else {}
    art["near_dedup"] = entry
    art["near_dedup_big_batch"] = big
    art["near_dedup_floor"] = FLOOR_ROWS_PER_SEC
    art["near_dedup_floor_ok"] = entry["rows_per_sec"] >= FLOOR_ROWS_PER_SEC
    with open(path, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(json.dumps({"near_dedup": entry, "near_dedup_big_batch": big,
                      "floor_ok": art["near_dedup_floor_ok"]}))
    spark.stop()


if __name__ == "__main__":
    main()
