"""Model registry with lifecycle stages (SURVEY.md M4).

Re-expresses the AI Flow model center the reference depends on:
``af.register_model`` (batch_train_batch_predict.py:77-78),
``af.register_model_version`` (processor.py:138),
``af.get_deployed_model_version`` / ``get_latest_generated_model_version``
(processor.py:165-166, 240), ``af.update_model_version`` with stages
GENERATED → VALIDATED → DEPLOYED → DEPRECATED (processor.py:26,
168-198). Storage is a JSON file (the reference uses a SQLite metadata
DB — same role); every stage transition publishes an event to the
in-process bus, mirroring the notification-server events that drive the
reference's control edges (batch_train_batch_predict.py:115-120).
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass, asdict, field
from typing import Callable, Optional


class ModelVersionStage:
    GENERATED = "GENERATED"
    VALIDATED = "VALIDATED"
    DEPLOYED = "DEPLOYED"
    DEPRECATED = "DEPRECATED"


class ModelEvent:
    MODEL_GENERATED = "MODEL_GENERATED"
    MODEL_VALIDATED = "MODEL_VALIDATED"
    MODEL_DEPLOYED = "MODEL_DEPLOYED"
    MODEL_DEPRECATED = "MODEL_DEPRECATED"

_STAGE_EVENT = {
    ModelVersionStage.GENERATED: ModelEvent.MODEL_GENERATED,
    ModelVersionStage.VALIDATED: ModelEvent.MODEL_VALIDATED,
    ModelVersionStage.DEPLOYED: ModelEvent.MODEL_DEPLOYED,
    ModelVersionStage.DEPRECATED: ModelEvent.MODEL_DEPRECATED,
}


@dataclass
class ModelVersion:
    model_name: str
    version: int
    model_path: str
    current_stage: str = ModelVersionStage.GENERATED


@dataclass
class ModelMeta:
    name: str
    model_desc: str = ""
    versions: list = field(default_factory=list)


class ModelRegistry:
    """In-process, optionally file-persisted model registry."""

    def __init__(self, path: str | None = None):
        self._path = path
        self._models: dict[str, ModelMeta] = {}
        self._listeners: list[Callable[[str, str, ModelVersion], None]] = []
        self._lock = threading.Lock()
        if path and os.path.exists(path):
            with open(path) as f:
                for m in json.load(f):
                    meta = ModelMeta(m["name"], m.get("model_desc", ""))
                    meta.versions = [ModelVersion(**v) for v in m["versions"]]
                    self._models[meta.name] = meta

    # -- event bus hookup ---------------------------------------------------

    def subscribe(self, cb: Callable[[str, str, ModelVersion], None]) -> None:
        """cb(model_name, event, version) fired on every registration /
        stage transition."""
        self._listeners.append(cb)

    def _emit(self, event: str, mv: ModelVersion) -> None:
        for cb in list(self._listeners):
            cb(mv.model_name, event, mv)

    # -- API mirroring the reference's af.* calls ---------------------------

    def register_model(self, model_name: str, model_desc: str = "") -> ModelMeta:
        with self._lock:
            meta = self._models.setdefault(model_name, ModelMeta(model_name, model_desc))
            self._persist()
        return meta

    def register_model_version(self, model_name: str, model_path: str) -> ModelVersion:
        """New version starts GENERATED and emits MODEL_GENERATED —
        the event the reference's validate job listens for
        (batch_train_batch_predict.py:115-117)."""
        with self._lock:
            meta = self._models.setdefault(model_name, ModelMeta(model_name))
            version = len(meta.versions) + 1
            mv = ModelVersion(model_name, version, model_path)
            meta.versions.append(mv)
            self._persist()
        self._emit(ModelEvent.MODEL_GENERATED, mv)
        return mv

    def update_model_version(self, model_name: str, model_version: int,
                             current_stage: str) -> ModelVersion:
        with self._lock:
            mv = self._find(model_name, model_version)
            mv.current_stage = current_stage
            self._persist()
        self._emit(_STAGE_EVENT[current_stage], mv)
        return mv

    def get_deployed_model_version(self, model_name: str) -> Optional[ModelVersion]:
        for mv in self._versions(model_name):
            if mv.current_stage == ModelVersionStage.DEPLOYED:
                return mv
        return None

    def get_latest_generated_model_version(self, model_name: str) -> Optional[ModelVersion]:
        gen = [mv for mv in self._versions(model_name)
               if mv.current_stage == ModelVersionStage.GENERATED]
        return gen[-1] if gen else None

    def versions(self, model_name: str) -> list[ModelVersion]:
        return list(self._versions(model_name))

    # -- internals ----------------------------------------------------------

    def _versions(self, model_name: str) -> list[ModelVersion]:
        meta = self._models.get(model_name)
        return meta.versions if meta else []

    def _find(self, model_name: str, version: int) -> ModelVersion:
        for mv in self._versions(model_name):
            if mv.version == version:
                return mv
        raise KeyError(f"{model_name} v{version} not registered")

    def _persist(self) -> None:
        if not self._path:
            return
        data = [{"name": m.name, "model_desc": m.model_desc,
                 "versions": [asdict(v) for v in m.versions]}
                for m in self._models.values()]
        with open(self._path, "w") as f:
            json.dump(data, f, indent=2)
