"""Dataset catalog (SURVEY.md M5).

Mirrors the reference's AI Flow dataset registry —
``af.register_dataset(dataset_name=..., data_format=..., uri=...)``
(``batch_train_batch_predict.py:42-44`` et al.) — as an in-process catalog
mapping names to (format, uri, schema). ``read``/``write`` dispatch to the
engine's batch sources/sinks; schemas are always explicit (never inferred
in the engine path, per SURVEY.md §1.3).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field, asdict
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


@dataclass
class DatasetEntry:
    name: str
    data_format: str          # csv | json | parquet | stream-dir
    uri: str
    schema_json: Optional[str] = None   # StructType.json() if declared
    options: dict = field(default_factory=dict)

    @property
    def schema(self) -> Optional[StructType]:
        if self.schema_json is None:
            return None
        return StructType.fromJson(json.loads(self.schema_json))


class Catalog:
    """Name → dataset registry with optional JSON persistence.

    The reference persists its registry in the AI Flow metadata DB
    (``README.md:39-41``); here a JSON file is enough — the catalog holds
    metadata only, never data.
    """

    def __init__(self, path: str | None = None):
        self._path = path
        self._entries: dict[str, DatasetEntry] = {}
        if path and os.path.exists(path):
            with open(path) as f:
                for rec in json.load(f):
                    self._entries[rec["name"]] = DatasetEntry(**rec)

    def register_dataset(self, name: str, data_format: str, uri: str,
                         schema: StructType | None = None,
                         options: dict | None = None) -> DatasetEntry:
        entry = DatasetEntry(
            name=name, data_format=data_format, uri=uri,
            schema_json=schema.json() if schema is not None else None,
            options=options or {},
        )
        self._entries[name] = entry
        self._persist()
        return entry

    def get(self, name: str) -> DatasetEntry:
        return self._entries[name]

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def names(self) -> list[str]:
        return sorted(self._entries)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        from ..io import batch
        e = self.get(name)
        return batch.read(spark, e.data_format, e.uri, e.schema, e.options)

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        from ..io import batch
        e = self.get(name)
        batch.write(df, e.data_format, e.uri, mode=mode, options=e.options)

    def _persist(self) -> None:
        if not self._path:
            return
        with open(self._path, "w") as f:
            json.dump([asdict(e) for e in self._entries.values()], f, indent=2)
