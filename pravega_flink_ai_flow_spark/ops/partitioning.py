"""Partitioning helpers.

Spark inherits a scan's partitioning through narrow transformations, so a
CPU-dense per-row pipeline (shingling, hashing, per-pair dot products)
over a small single-file table would run on ONE core of the cluster.
``spread`` is the explicit fix; at real scale inputs already have ≥ cores
partitions and it is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, target: int | None = None, *,
           force: bool = False) -> DataFrame:
    """Round-robin repartition up to ``target`` (default: the session's
    default parallelism) iff the input has fewer partitions. Costs one
    narrow-ish shuffle of the input; only worth it ahead of CPU-dense
    per-row work whose cost dwarfs the row bytes moved.

    ``force=True`` repartitions unconditionally. The partition COUNT of
    a file scan lies about parallelism: byte-range splitting can report
    ≥ cores splits while every row group's midpoint lands in a handful
    of them, leaving the rest empty (measured r9: a 4-row-group parquet
    under 8 MB splits reported 32 partitions, 4 non-empty — the codec
    pass ran 4-way and the conditional spread was a no-op). Use force
    ahead of interpreter-bound per-row work, where a shuffle of the
    skinny input rows is always cheaper than idle cores."""
    if target is None:
        target = df.sparkSession.sparkContext.defaultParallelism
    if force or df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
