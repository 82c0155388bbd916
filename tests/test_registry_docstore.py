"""Document-store metadata backend for the model registry (SURVEY.md
M4) — the MongoDB-shaped third store of the reference's AI Flow stack
(/root/reference/README.md:39-41 lists sqlite/MySQL/MongoDB).

The registry logic is written against a three-primitive
``DocumentStore`` interface; ``FileDocumentStore`` (always available)
and the ``pymongo``-backed ``MongoDocumentStore`` implement it. These
tests drive every registry code path through the file engine — the
identical calls the Mongo adapter forwards to a real server.
"""

import os
import subprocess
import sys
import textwrap

import pytest

from pravega_flink_ai_flow_spark.ml import (
    DocumentModelRegistry, FileDocumentStore, ModelVersionStage,
    MongoDocumentStore, open_registry,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_open_registry_routing_docstore(tmp_workdir):
    reg = open_registry(f"docstore://{tmp_workdir}/meta")
    assert isinstance(reg, DocumentModelRegistry)
    # mongodb:// routes to the pymongo adapter; without pymongo in this
    # sandbox the error must say how to proceed, not AttributeError later
    with pytest.raises(ImportError, match="pymongo"):
        open_registry("mongodb://localhost:27017/aiflow")


def test_docstore_lifecycle_matches_other_backends(tmp_workdir):
    """Same API surface and lifecycle semantics as the JSON and SQLite
    backends: stage machine, event bus, version allocation, KeyError on
    unknown versions."""
    reg = DocumentModelRegistry(
        FileDocumentStore(os.path.join(tmp_workdir, "meta")))
    events = []
    reg.subscribe(lambda name, event, mv: events.append((event, mv.version)))

    reg.register_model("wide_and_deep", "demo model")
    v1 = reg.register_model_version("wide_and_deep", "/models/v1")
    v2 = reg.register_model_version("wide_and_deep", "/models/v2")
    assert (v1.version, v2.version) == (1, 2)
    assert reg.get_latest_generated_model_version("wide_and_deep").version == 2

    reg.update_model_version("wide_and_deep", 1, ModelVersionStage.DEPLOYED)
    assert reg.get_deployed_model_version("wide_and_deep").version == 1
    assert reg.get_latest_generated_model_version("wide_and_deep").version == 2
    assert events == [("MODEL_GENERATED", 1), ("MODEL_GENERATED", 2),
                      ("MODEL_DEPLOYED", 1)]

    with pytest.raises(KeyError):
        reg.update_model_version("wide_and_deep", 99,
                                 ModelVersionStage.DEPLOYED)

    # re-registering an existing model keeps its description and versions
    meta = reg.register_model("wide_and_deep")
    assert meta.model_desc == "demo model"
    assert [v.version for v in meta.versions] == [1, 2]


def test_docstore_cross_process_visibility(tmp_workdir):
    """Every read reloads the collection files, so a mutation made by
    ANOTHER process is visible without reopening — matching the SQLite
    backend's behavior (and a real MongoDB's)."""
    root = os.path.join(tmp_workdir, "meta")
    reg = DocumentModelRegistry(FileDocumentStore(root))
    reg.register_model_version("m", "/p1")

    child = textwrap.dedent(f"""
        import sys; sys.path.insert(0, {REPO!r})
        from pravega_flink_ai_flow_spark.ml import (
            DocumentModelRegistry, FileDocumentStore)
        r = DocumentModelRegistry(FileDocumentStore({root!r}))
        r.register_model_version("m", "/p2")
        r.update_model_version("m", 1, "DEPLOYED")
    """)
    subprocess.run([sys.executable, "-c", child], check=True, timeout=60)

    assert [v.version for v in reg.versions("m")] == [1, 2]
    assert reg.get_deployed_model_version("m").version == 1
    assert reg.get_latest_generated_model_version("m").version == 2


def test_docstore_primitives(tmp_workdir):
    """The three primitives the Mongo adapter must provide, pinned on
    the file engine: insert/find by equality query/update-first-match."""
    store = FileDocumentStore(os.path.join(tmp_workdir, "db"))
    store.insert_one("c", {"a": 1, "b": "x"})
    store.insert_one("c", {"a": 2, "b": "x"})
    assert store.find("c", {"b": "x", "a": 2}) == [{"a": 2, "b": "x"}]
    assert store.find("c", {"a": 3}) == []
    assert store.update_one("c", {"a": 1}, {"b": "y"}) == 1
    assert store.update_one("c", {"a": 3}, {"b": "y"}) == 0
    assert store.find("c", {"a": 1}) == [{"a": 1, "b": "y"}]
    # collections are independent
    assert store.find("other", {}) == []


# ---------------------------------------------------------------------------
# Mongo adapter allocation semantics against an in-memory fake server
# (r13 verdict #5). The fake implements exactly the pymongo surface the
# adapter calls — insert_one (unique _id), find, update_one($set), and
# find_one_and_update with an aggregation-pipeline update applied
# atomically under a server-side lock — so the counter-document
# allocation is proven without a Mongo server in the sandbox.
# ---------------------------------------------------------------------------

class FakeDuplicateKeyError(Exception):
    pass


class _FakeCollection:
    def __init__(self, lock):
        self._docs: list[dict] = []
        self._lock = lock          # the server's per-document atomicity

    def insert_one(self, doc):
        with self._lock:
            d = dict(doc)
            if "_id" in d and any(x.get("_id") == d["_id"]
                                  for x in self._docs):
                raise FakeDuplicateKeyError(d["_id"])
            self._docs.append(d)

    def find(self, query):
        with self._lock:
            return [dict(d) for d in self._docs
                    if all(d.get(k) == v for k, v in query.items())]

    class _Res:
        def __init__(self, n):
            self.matched_count = n

    def update_one(self, query, update):
        with self._lock:
            for d in self._docs:
                if all(d.get(k) == v for k, v in query.items()):
                    d.update(update["$set"])
                    return self._Res(1)
            return self._Res(0)

    @staticmethod
    def _eval(expr, doc):
        if isinstance(expr, str) and expr.startswith("$"):
            return doc.get(expr[1:])
        if isinstance(expr, dict):
            (op, args), = expr.items()
            vals = [_FakeCollection._eval(a, doc) for a in args]
            if op == "$ifNull":
                return vals[0] if vals[0] is not None else vals[1]
            if op == "$max":
                return max(v for v in vals if v is not None)
            if op == "$add":
                return sum(vals)
            raise NotImplementedError(op)
        return expr

    def find_one_and_update(self, query, update, upsert=False,
                            return_document=False):
        assert isinstance(update, list), "adapter must send a pipeline"
        with self._lock:
            for d in self._docs:
                if all(d.get(k) == v for k, v in query.items()):
                    for stage in update:
                        for field, expr in stage["$set"].items():
                            d[field] = self._eval(expr, d)
                    return dict(d)
            if not upsert:
                return None
        # the INSERT happens outside the update lock on purpose: it
        # goes through insert_one, which raises FakeDuplicateKeyError
        # if a racing creator won — exactly MongoDB's behavior
        base = dict(query)
        for stage in update:
            for field, expr in stage["$set"].items():
                base[field] = self._eval(expr, base)
        self.insert_one(base)
        return dict(base)


class _FakeDB:
    def __init__(self, lock):
        self._cols: dict[str, _FakeCollection] = {}
        self._lock = lock

    def __getitem__(self, name):
        if name not in self._cols:
            self._cols[name] = _FakeCollection(self._lock)
        return self._cols[name]


class FakeMongoClient:
    def __init__(self):
        import threading
        self._lock = threading.Lock()
        self._dbs: dict[str, _FakeDB] = {}

    def __getitem__(self, name):
        if name not in self._dbs:
            self._dbs[name] = _FakeDB(self._lock)
        return self._dbs[name]


def _mongo_store(client=None):
    client = client or FakeMongoClient()
    return MongoDocumentStore("mongodb://fake", client=client,
                              dup_exc=FakeDuplicateKeyError), client


def test_mongo_adapter_allocate_is_server_side_and_monotonic():
    store, _ = _mongo_store()
    assert store.allocate("counters", "model_version:m") == 1
    assert store.allocate("counters", "model_version:m") == 2
    # floor folds a legacy max into the seed, then the counter dominates
    assert store.allocate("counters", "model_version:legacy", floor=7) == 8
    assert store.allocate("counters", "model_version:legacy", floor=7) == 9
    # a stale (lower) floor can never move the counter backwards
    assert store.allocate("counters", "model_version:legacy", floor=3) == 10


def test_mongo_adapter_creation_race_retries():
    """Two first-ever upserts race: MongoDB raises DuplicateKeyError on
    the loser's insert; the adapter must retry and take the update
    path, never burn or duplicate a number."""
    store, client = _mongo_store()
    col = client["model_registry"]["counters"]
    real = col.find_one_and_update
    state = {"first": True}

    def racy(query, update, **kw):
        if state["first"]:
            state["first"] = False
            # a racing creator lands the counter first…
            real(query, update, **kw)
            # …so OUR attempt hits the duplicate-_id insert
            raise FakeDuplicateKeyError(query["_id"])
        return real(query, update, **kw)

    col.find_one_and_update = racy
    # the raced attempt retried onto the existing doc: values 2 then 3
    # (1 was taken by the racing creator), strictly no duplicates
    assert store.allocate("counters", "k") == 2
    assert store.allocate("counters", "k") == 3


def test_mongo_registry_concurrent_writers_allocate_unique_versions():
    """N registry instances over ONE fake server — separate processes
    in production, where neither the in-process _alloc_lock nor the
    no-op transaction() protects the find-max+insert pair. The counter
    document must hand every writer a distinct version."""
    import threading

    client = FakeMongoClient()
    versions: list[int] = []
    lock = threading.Lock()
    barrier = threading.Barrier(6)

    def writer(i):
        store, _ = _mongo_store(client)       # fresh adapter = "process"
        reg = DocumentModelRegistry(store)
        barrier.wait()
        for j in range(5):
            mv = reg.register_model_version("m", f"/models/{i}/{j}")
            with lock:
                versions.append(mv.version)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(6)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert sorted(versions) == list(range(1, 31)), "duplicate or gap"

    # and the legacy-floor migration: versions that PREDATE the counter
    # are respected by the first allocation after the upgrade
    fresh = FakeMongoClient()
    store, _ = _mongo_store(fresh)
    store.insert_one("model_versions", {
        "model_name": "old", "version": 4, "model_path": "/p",
        "current_stage": "GENERATED"})
    reg = DocumentModelRegistry(store)
    assert reg.register_model_version("old", "/p5").version == 5


def test_mongo_injected_client_requires_dup_exc():
    """r15 (r14 advice): an injected client with no dup_exc must not
    silently disable the creation-race retry. In this sandbox pymongo is
    absent, so the constructor must refuse rather than default to ()."""
    import pytest
    try:
        import pymongo  # noqa: F401
        pytest.skip("pymongo present; default import path applies")
    except ImportError:
        pass
    with pytest.raises(ValueError, match="dup_exc"):
        MongoDocumentStore("mongodb://fake", client=FakeMongoClient())
