"""SparkSession factory.

The reference initializes a Flink stream environment per job
(``batch_train_batch_predict_processor.py:36`` —
``flink.set_flink_env(flink.FlinkStreamEnv())``). Spark-first equivalent:
one shared SparkSession configured for determinism (UTC, fixed shuffle
partitions) and scale (AQE, Arrow).

Scale notes (100 TB design intent, tested on local[32]):
- AQE on: runtime coalescing of shuffle partitions, dynamic broadcast
  joins, skew-join splitting — the knobs that keep a fixed logical plan
  healthy at 1000 executors.
- Arrow on: every pandas interchange (toPandas, pandas UDF, applyInPandas)
  is Arrow-batched, never row-at-a-time pickling.
- Shuffle partitions default to a CPU-proportional number locally; on a
  real cluster AQE coalescing makes the initial number far less critical.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # determinism
    "spark.sql.session.timeZone": "UTC",
    # scale / performance
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Runtime bloom-filter semi-join pruning (r11, measured on TPC-H Q5
    # at the sf10 tier: the date-filtered orders side prunes the 60 M-row
    # lineitem shuffle 5.75 s → 3.64 s, -37%). Spark's defaults block it
    # both here AND at production scale: applicationSideScanSizeThreshold
    # defaults to 10 GB (the probe side must be huge) while
    # creationSideThreshold defaults to 10 MB (the build side must be
    # tiny) — a selective-dim ⋈ fact join at 100 TB has a build side far
    # over 10 MB, so the default pair almost never fires. 64 MB / 256 MB
    # lets mid-size filtered dims prune fact shuffles from sf1 up while
    # leaving sf0.1-and-below plans untouched (scan < 64 MB).
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": str(64 * 1024 * 1024),
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
        str(256 * 1024 * 1024),
    # local runs read small parquet; keep partition count sane
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    # silence the UI in test harnesses
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
}


def get_spark(app_name: str = "pravega-flink-ai-flow-spark",
              master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default ``*``)
    so the same code runs unchanged under a cluster master URL.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
