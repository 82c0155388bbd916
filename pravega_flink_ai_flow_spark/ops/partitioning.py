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


def spread_coalesced(df: DataFrame, target: int | None = None) -> DataFrame:
    """Re-spread a POST-SHUFFLE frame whose next consumer is CPU-dense
    per-row work, iff the session's AQE partition coalescing is active.

    AQE coalesces a shuffle stage by BYTES (``parallelismFirst`` targets
    ``max(total/parallelism, minPartitionSize)``, min 1 MB by default),
    so a skinny-row shuffle output — candidate id-pairs, digests, keys —
    collapses to one or two partitions even though the stage fused AFTER
    it does heavy per-row work (array_intersect verify, codec calls).
    Measured on l2_incremental_dedup at sf0.1 (interleaved A/B, engine
    session): candidate verify serialized to ~1 AQE partition ran the
    query at 4.14 s; with this re-spread 1.39 s. The alternative of
    lowering ``coalescePartitions.minPartitionSize`` session-wide to
    16 KB measured WORSE (1.69 s alone, 1.83 s combined with the
    spread): it widens every tiny stage in the plan and pays task
    overhead where there is no per-row work to parallelize.

    When AQE coalescing is off (the bench session pins static shuffle
    partitions), the shuffle already lands at the session's partition
    count and the extra exchange is pure overhead (measured +0.15 s on
    l2_minhash under BENCH_CONF) — so this helper no-ops there."""
    conf = df.sparkSession.conf
    if (conf.get("spark.sql.adaptive.enabled") != "true"
            or conf.get(
                "spark.sql.adaptive.coalescePartitions.enabled") != "true"):
        return df
    return spread(df, target, force=True)


def compact_for_arrow(df: DataFrame, *,
                      bytes_per_task: int = 8 << 20) -> DataFrame:
    """Merge scan splits ahead of a vectorized Arrow pass so each task
    hands the Python worker one LARGE batch instead of a sliver.

    The inverse of :func:`spread`: a blocked-GEMM ``mapInArrow`` pass is
    Arrow-transfer- and dispatch-bound, not interpreter-bound — its
    per-task cost is dominated by the fixed Python-worker round trip,
    and BLAS gets FASTER with bigger batches. Under small-split configs
    (the bench session's 8 MB ``maxPartitionBytes``, or a toy tier) a
    sub-MB table still fans out into many near-empty splits: measured on
    m2_knn at sf0.1, the candidate stage ran 7 tasks over a 0.7 MB scan
    and the merge-to-one cut its steady median 0.275 → 0.189 s.

    ``coalesce`` (narrow — merges splits, no shuffle, no exchange) to
    ceil(plan-stats bytes / ``bytes_per_task``); the stats come from the
    optimized logical plan (file sizes — no job). Inputs whose splits
    already hold ≥ ``bytes_per_task`` are untouched (coalesce above the
    current partition count is the identity), so at real scale this is a
    no-op by construction — the knob is data-sized, not core-sized."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        size = int(str(stats.sizeInBytes()))
    except Exception:
        return df
    if size <= 0 or size >= (1 << 60):
        # In-memory inputs (createDataFrame → LogicalRDD) report the
        # conf's defaultSizeInBytes sentinel (~8 EB) when no real stats
        # exist: that means UNKNOWN, not huge — and the derived
        # partition count would overflow py4j's int32 marshalling
        # (coalesce(Long) does not exist). Leave such inputs untouched.
        return df
    n = max(1, -(-size // bytes_per_task))
    if n > (1 << 30):
        return df
    return df.coalesce(n)
