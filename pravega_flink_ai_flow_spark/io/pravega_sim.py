"""Pravega-sim source/sink (SURVEY.md S3, S4, S5, T1, T9, T10).

The reference stores events in Pravega streams (``scope/train-stream``,
``scope/predict-stream``; README.md:89-91) accessed through the Pravega
Flink connector with JSON serialization. Two read modes exist there:

- bounded: ``'scan.execution.type' = 'batch'`` (processor.py:108,219) —
  a finite snapshot of whatever the stream currently holds;
- unbounded: the connector default under a stream env (processor.py:36).

Spark-first equivalent: a *stream directory* — an append-only directory of
JSON part-files. This is an honest simulation of Pravega's durable
append-only log using the filesystem as transport:

- ``append(df)``       ≈ Pravega JSON sink (processor.py:67-90);
- ``read_bounded``     ≈ ``scan.execution.type=batch`` — a plain
  ``spark.read.json`` snapshot;
- ``read_stream``      ≈ continuous scan — Spark's file-stream source,
  which discovers newly appended files per micro-batch;
- ``read_stream`` + ``trigger(availableNow=True)`` reproduces the
  reference's batch-scan-of-a-stream exactly: process everything present,
  then stop.

At 100 TB this layout maps 1:1 onto how a real Pravega (or Kafka/Kinesis)
connector behaves: the scan parallelizes over segment files, schemas are
explicit, and the streaming side gets exactly-once via the file-source's
offset log + checkpointing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class StreamDir:
    """A named append-only JSON stream, e.g. ``scope/train-stream`` →
    ``<root>/scope/train-stream/``."""

    def __init__(self, path: str, schema: StructType | None = None):
        self.path = path
        self.schema = schema

    # -- sink ---------------------------------------------------------------

    def append(self, df: DataFrame) -> None:
        """JSON stream sink (processor.py:67-90). Append-only, like a
        Pravega writer: each call adds new part files, never rewrites."""
        df.write.mode("append").json(self.path)

    def foreach_batch_writer(self):
        """`writeStream.foreachBatch` sink function for streaming writes
        into the same stream-dir layout."""
        def _write(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("append").json(self.path)
        return _write

    # -- sources ------------------------------------------------------------

    def read_bounded(self, spark: SparkSession) -> DataFrame:
        """Bounded snapshot read — ``scan.execution.type=batch``
        (processor.py:108)."""
        self._require_schema()
        return spark.read.schema(self.schema).json(self.path)

    def read_stream(self, spark: SparkSession,
                    max_files_per_trigger: int | None = None) -> DataFrame:
        """Unbounded read (connector default scan mode, SURVEY.md S5)."""
        self._require_schema()
        reader = spark.readStream.schema(self.schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        return reader.json(self.path)

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".json") or f.startswith("part-")
            for f in os.listdir(self.path))

    def _require_schema(self) -> None:
        if self.schema is None:
            raise ValueError(
                f"stream {self.path!r} needs an explicit schema: the engine "
                "never infers schemas on the read path (SURVEY.md §1.3)")
