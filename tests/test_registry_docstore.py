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
    open_registry,
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
