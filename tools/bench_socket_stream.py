#!/usr/bin/env python
"""Socket-transport streaming ingest throughput (r8 verdict, next #4).

The exactly-once ``pravega_socket`` path (DataSourceStreamReader with
checkpointable offsets → transactional stream writer with a
(writer-group, batchId) commit ledger) is correctness-proven by
tests/test_pravega_socket.py but had no recorded rows/s; the 100 TB
story needs an ingest number. This drives the sf0.1 events table
(100 k rows) through a live PravegaEmulatorServer over TCP:

- **txn_uncapped**: availableNow drain, source → exactly-once socket
  txn sink, one shot (cold) and repeated on a fresh checkpoint/output
  stream (steady — JVM/codegen warm);
- **txn_capped**: the same loop with ``maxRecordsPerBatch`` admission
  control (4 bounded micro-batches), processing-time trigger — the
  shape a production backlog drain runs with, including per-batch
  offset planning and ledger round-trips.

Rows ride as JSON over real sockets on BOTH legs (executor-side ranged
pulls, per-task transactional appends), so this measures the
transport + txn protocol, not parquet scanning. Writes
BENCH_stream.json at the repo root; the regression bar is
``rows_per_sec_floor`` (steady uncapped must stay above it).

Usage: python tools/bench_socket_stream.py
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

# steady uncapped ingest below this is a regression (pinned ~40 % under
# the first recorded measurement, same convention as bench.py's floors)
ROWS_PER_SEC_FLOOR = 8_000


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pravega_flink_ai_flow_spark.engine.session import get_spark
    from pravega_flink_ai_flow_spark.io import pravega_source
    from pravega_flink_ai_flow_spark.io.pravega_server import (
        PravegaEmulatorServer,
    )
    from pravega_flink_ai_flow_spark.queries import tables

    spark = get_spark("bench-socket-stream")
    spark.sparkContext.setLogLevel("ERROR")

    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")

    (events,) = tables(spark, sf_dir, "events")
    rows = events.select("event_id", "ts", "user_id", "event_type",
                         "value", "props").collect()
    n_rows = len(rows)
    payload = [{"event_id": r.event_id,
                "ts": int(r.ts.timestamp() * 1_000_000),
                "user_id": r.user_id, "event_type": r.event_type,
                "value": r.value, "props": r.props} for r in rows]

    srv = PravegaEmulatorServer()
    srv.start()
    work = tempfile.mkdtemp(prefix="socket_bench_")
    results: dict = {"n_rows": n_rows, "sf_dir": sf_dir,
                     "rows_per_sec_floor": ROWS_PER_SEC_FLOOR}
    try:
        # setup (untimed): land events in the server in 10k chunks
        for i in range(0, n_rows, 10_000):
            srv.append("scope", "events", payload[i:i + 10_000])
        pravega_source.register(spark)

        def source(cap=None):
            r = (spark.readStream.format("pravega_socket")
                 .schema(schema)
                 .option("controller", srv.controller_uri)
                 .option("scope", "scope").option("stream", "events"))
            if cap:
                r = r.option("maxRecordsPerBatch", str(cap))
            return r.load()

        def txn_drain(tag, cap=None):
            """source → exactly-once socket txn sink; returns seconds."""
            out = f"out_{tag}"
            ck = os.path.join(work, f"ck_{tag}")
            t0 = time.perf_counter()
            if cap is None:
                q = (source().writeStream.format("pravega_socket")
                     .option("controller", srv.controller_uri)
                     .option("scope", "scope").option("stream", out)
                     .option("checkpointLocation", ck)
                     .trigger(availableNow=True).start())
                q.awaitTermination(600)
            else:
                q = (source(cap).writeStream.format("pravega_socket")
                     .option("controller", srv.controller_uri)
                     .option("scope", "scope").option("stream", out)
                     .option("checkpointLocation", ck)
                     .trigger(processingTime="100 milliseconds").start())
                deadline = time.time() + 600
                while time.time() < deadline:
                    if srv.tail("scope", out) >= n_rows:
                        break
                    time.sleep(0.25)
                q.stop()
                q.awaitTermination(60)
            sec = time.perf_counter() - t0
            got = srv.tail("scope", out)
            assert got == n_rows, f"{tag}: {got} != {n_rows}"
            return sec

        sec_cold = txn_drain("cold")
        sec_steady = min(txn_drain("steady1"), txn_drain("steady2"))
        cap = max(n_rows // 4, 1)
        sec_capped = txn_drain("capped", cap=cap)

        results["txn_uncapped_cold"] = {
            "sec": round(sec_cold, 2),
            "rows_per_sec": int(n_rows / sec_cold)}
        results["txn_uncapped_steady"] = {
            "sec": round(sec_steady, 2),
            "rows_per_sec": int(n_rows / sec_steady)}
        results[f"txn_capped_{cap}"] = {
            "sec": round(sec_capped, 2),
            "rows_per_sec": int(n_rows / sec_capped)}

        steady_rps = results["txn_uncapped_steady"]["rows_per_sec"]
        results["floor_ok"] = steady_rps >= ROWS_PER_SEC_FLOOR
        path = os.path.join(REPO, "BENCH_stream.json")
        with open(path, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(json.dumps(results, indent=1, sort_keys=True))
        print(f"wrote {path}")
        if not results["floor_ok"]:
            sys.exit(1)
    finally:
        srv.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
