"""Partitioning helpers.

Spark inherits a scan's partitioning through narrow transformations, so a
CPU-dense per-row pipeline (shingling, hashing, per-pair dot products)
over a small single-file table would run on ONE core of the cluster.
``spread`` is the explicit fix; at real scale inputs already have ≥ cores
partitions and it is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition up to ``target`` (default: the session's
    default parallelism) iff the input has fewer partitions. Costs one
    narrow-ish shuffle of the input; only worth it ahead of CPU-dense
    per-row work whose cost dwarfs the row bytes moved."""
    if target is None:
        target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
