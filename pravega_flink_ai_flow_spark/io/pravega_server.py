"""In-process Pravega-emulating network server (SURVEY.md S4/S5, T1).

The reference's connector speaks to a Pravega controller over TCP at
``tcp://localhost:9090`` (batch_train_batch_predict_processor.py:83,
106,217) and reads stream segments from a segment store. This module
provides the network half of that story for the socket transport
(:mod:`.pravega_source`): a threaded TCP server holding append-only
per-stream event logs, with the four operations the connector surface
needs — create, append, tail, ranged read. The wire protocol is one
newline-delimited JSON request per connection with one JSON response
(deliberately minimal; the real Pravega wire protocol is a binary
framed protocol, but the CLIENT-side semantics — offset-addressed
ranged reads of an append-only log — are identical, and those are what
the Spark data source exercises).

Semantics mirrored from Pravega:

- streams are append-only: ``append`` returns the new tail offset and
  never rewrites history, so a ranged ``read(start, end)`` is
  deterministic forever — the property that gives the Spark stream
  reader exactly-once replay from checkpointed offsets;
- offsets are per-stream record indices (real Pravega uses per-segment
  byte offsets; record indices are the same abstraction one segment
  up);
- reads are served to any number of concurrent clients (executors pull
  their partition ranges in parallel, like segment-store reads).
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading


def pravega_rpc(host: str, port: int, request: dict) -> dict:
    """One request/response round trip. Module-level pure function so
    executor-side readers can call it without capturing server objects
    in task closures."""
    with socket.create_connection((host, port), timeout=30) as sock:
        sock.sendall((json.dumps(request) + "\n").encode("utf-8"))
        sock.shutdown(socket.SHUT_WR)
        buf = b""
        while True:
            chunk = sock.recv(1 << 16)
            if not chunk:
                break
            buf += chunk
    if not buf:
        raise ConnectionError(
            "pravega server closed the connection without a response "
            "(torn read)")
    resp = json.loads(buf.decode("utf-8"))
    if resp.get("error"):
        raise RuntimeError(f"pravega server error: {resp['error']}")
    return resp


def parse_controller_uri(uri: str) -> tuple[str, int]:
    """``tcp://host:port`` (the reference's controller-uri shape,
    processor.py:83) or bare ``host:port``."""
    addr = uri[len("tcp://"):] if uri.startswith("tcp://") else uri
    host, _, port = addr.rpartition(":")
    if not host or not port.isdigit():
        raise ValueError(f"cannot parse controller uri {uri!r} "
                         "(expected tcp://host:port)")
    return host, int(port)


class PravegaEmulatorServer:
    """Threaded TCP server over in-memory append-only stream logs."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._host, self._want_port = host, port
        self._streams: dict[tuple[str, str], list] = {}
        # transactional-writer state (Pravega TransactionalEventStreamWriter
        # semantics): events staged under a txn id are invisible to
        # readers until an atomic commit; a (group, batchId) ledger makes
        # commits idempotent under micro-batch replay.
        self._pending: dict[tuple[str, str, str], list] = {}
        self._committed: dict[tuple[str, str, str], int] = {}
        self._lock = threading.Lock()
        self._server: socketserver.ThreadingTCPServer | None = None
        self._thread: threading.Thread | None = None
        # chaos hook (tests): op name → number of connections to DROP
        # mid-request (close without a response — the torn-TCP shape a
        # real segment store failure produces client-side)
        self._chaos_drops: dict[str, int] = {}

    # -- direct (in-process) API -------------------------------------------

    def create_stream(self, scope: str, stream: str) -> None:
        with self._lock:
            self._streams.setdefault((scope, stream), [])

    def append(self, scope: str, stream: str, events: list) -> int:
        with self._lock:
            log = self._streams.setdefault((scope, stream), [])
            log.extend(events)
            return len(log)

    def tail(self, scope: str, stream: str) -> int:
        with self._lock:
            return len(self._streams.get((scope, stream), []))

    def read(self, scope: str, stream: str, start: int, end: int) -> list:
        with self._lock:
            log = self._streams.get((scope, stream), [])
            return list(log[start:end])

    def streams(self) -> list:
        with self._lock:
            return sorted(f"{s}/{st}" for s, st in self._streams)

    # -- transactional writer (Pravega TransactionalEventStreamWriter) ------
    #
    # A Spark write task stages its rows under a fresh txn id; nothing is
    # visible to readers until the DRIVER commits the ids of the tasks
    # that actually succeeded. A failed/killed attempt's staged txn is
    # simply never named in a commit, so its rows never appear —
    # exactly-once under task retry. For streaming, commit also carries
    # (writer_group, batch_id): the ledger records the highest committed
    # batch per group, and a REPLAYED commit of an already-committed
    # micro-batch (checkpoint-recovery re-run) drops its txns instead of
    # appending twice — Pravega's ordered-commit idempotency one level up.

    def txn_write(self, scope: str, stream: str, txn: str,
                  events: list) -> int:
        with self._lock:
            # replace, not extend: a re-delivered RPC for the same txn id
            # must stay idempotent
            self._pending[(scope, stream, txn)] = list(events)
            return len(events)

    def txn_commit(self, scope: str, stream: str, txns: list,
                   group: str | None = None,
                   batch_id: int | None = None) -> dict:
        with self._lock:
            if group is not None and batch_id is not None:
                key = (scope, stream, group)
                last = self._committed.get(key)
                if last is not None and batch_id <= last:
                    # replayed micro-batch: already durable — drop the
                    # re-staged txns too (they were applied under the
                    # original commit), and a replay never reports
                    # missing ids: the first commit consumed them
                    for t in txns:
                        self._pending.pop((scope, stream, t), None)
                    return {"tail": len(self._streams.get((scope, stream), [])),
                            "duplicate": True, "missing": []}
            # committing an unknown/expired txn id is DATA LOSS, not a
            # no-op: real Pravega fails such a commit. Surface the ids so
            # the driver-side committer fails the batch instead of acking
            # silently dropped rows (r6 ADVICE). The failure must be
            # ATOMIC (r7 ADVICE): if any id is missing, leave the ledger
            # unset and every staged txn in place — otherwise Spark's
            # retry of the failed batch hits the duplicate-ledger path
            # above and drops the re-staged txns, so the recovery the
            # failure exists to enable could never succeed.
            missing = [t for t in txns
                       if (scope, stream, t) not in self._pending]
            if missing:
                return {"tail": len(self._streams.get((scope, stream), [])),
                        "duplicate": False, "missing": missing}
            if group is not None and batch_id is not None:
                self._committed[(scope, stream, group)] = batch_id
            staged = [self._pending.pop((scope, stream, t), None)
                      for t in txns]
            log = self._streams.setdefault((scope, stream), [])
            for ev in staged:
                if ev:
                    log.extend(ev)
            return {"tail": len(log), "duplicate": False, "missing": []}

    def txn_abort(self, scope: str, stream: str, txns: list) -> None:
        with self._lock:
            for t in txns:
                self._pending.pop((scope, stream, t), None)

    # -- network lifecycle --------------------------------------------------

    def start(self) -> tuple[str, int]:
        """Bind (port 0 → ephemeral), serve in a daemon thread, return
        the bound (host, port)."""
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                try:
                    req = json.loads(self.rfile.readline().decode("utf-8"))
                    if outer._consume_chaos(req.get("op")):
                        return   # drop the connection, no response
                    resp = outer._dispatch(req)
                except Exception as e:  # malformed request must not kill the server
                    resp = {"error": f"{type(e).__name__}: {e}"}
                self.wfile.write((json.dumps(resp) + "\n").encode("utf-8"))

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((self._host, self._want_port), Handler)
        host, port = self._server.server_address[:2]
        # pin the ephemeral port: a later start()/restart() rebinds the
        # SAME address, so clients holding the controller uri reconnect
        self._want_port = port
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        name="pravega-emulator", daemon=True)
        self._thread.start()
        return host, port

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    def restart(self) -> tuple[str, int]:
        """Rebind on the SAME port with state kept — the crash/recovery
        shape the chaos tests drive (a production Pravega keeps the log
        durable across controller restarts; here durability is the
        object's lifetime). Works on a stopped server too: start() pins
        the bound port."""
        self.stop()
        return self.start()

    # -- chaos hooks (tests) -------------------------------------------------

    def inject_connection_drops(self, op: str, times: int) -> None:
        """Drop the next ``times`` connections carrying ``op`` without a
        response — the client sees a torn read mid-pull."""
        with self._lock:
            self._chaos_drops[op] = times

    def _consume_chaos(self, op: str) -> bool:
        with self._lock:
            left = self._chaos_drops.get(op, 0)
            if left > 0:
                self._chaos_drops[op] = left - 1
                return True
            return False

    @property
    def controller_uri(self) -> str:
        assert self._server is not None, "server not started"
        host, port = self._server.server_address[:2]
        return f"tcp://{host}:{port}"

    # -- dispatch -----------------------------------------------------------

    def _dispatch(self, req: dict) -> dict:
        op = req.get("op")
        scope, stream = req.get("scope", ""), req.get("stream", "")
        if op == "create_stream":
            self.create_stream(scope, stream)
            return {"ok": True}
        if op == "append":
            return {"tail": self.append(scope, stream, req["events"])}
        if op == "tail":
            return {"tail": self.tail(scope, stream)}
        if op == "read":
            return {"events": self.read(scope, stream,
                                        int(req["start"]), int(req["end"]))}
        if op == "list":
            return {"streams": self.streams()}
        if op == "txn_write":
            return {"staged": self.txn_write(scope, stream, req["txn"],
                                             req["events"])}
        if op == "txn_commit":
            return self.txn_commit(
                scope, stream, req["txns"], req.get("group"),
                int(req["batch"]) if req.get("batch") is not None else None)
        if op == "txn_abort":
            self.txn_abort(scope, stream, req["txns"])
            return {"ok": True}
        return {"error": f"unknown op {op!r}"}
