"""End-to-end training-data pipeline composition (the BASELINE.json
north star): ingest → fingerprint → exact dedup → quality gate →
near-dedup clusters → per-language corpus stats, all as one lazy
DataFrame graph over the driver test tables.

Each stage is unit- and oracle-tested on its own; this asserts the
COMPOSITION stays correct (stages chain without materialization, counts
are monotonically non-increasing, final stats are deterministic).
"""

import os

from pyspark.sql import Window, functions as F

from pravega_flink_ai_flow_spark.ops import dedup, text
from pravega_flink_ai_flow_spark.queries import tables

SF = "/root/testdata/sf0.001"


def test_training_data_pipeline_composes(spark):
    (docs,) = tables(spark, SF, "documents")
    n_raw = docs.count()

    # 1. exact dedup on canonical fingerprint (keeps smallest doc_id)
    keepers = (docs
               .withColumn("fp", text.fingerprint(F.col("text")))
               .withColumn("keep_id", F.min("doc_id").over(
                   Window.partitionBy("fp")))
               .filter(F.col("doc_id") == F.col("keep_id"))
               .drop("fp", "keep_id"))
    n_exact = keepers.count()
    assert n_exact <= n_raw

    # 2. quality gate (pure JVM filter)
    gated = keepers.filter(
        (text.quality_score(F.col("text")) >= 0.6) &
        text.token_count(F.col("text")).between(20, 1000))
    n_gated = gated.count()
    assert 0 < n_gated <= n_exact

    # 3. near-dedup: MinHash pairs → connected components → drop
    #    everything but each cluster's smallest id
    pairs = dedup.minhash_dedup_pairs(gated, "doc_id", "text",
                                      k=3, num_hashes=64, bands=16,
                                      threshold=0.7)
    clusters = dedup.connected_components(pairs)
    losers = clusters.filter(F.col("id") != F.col("cluster_id")) \
                     .select(F.col("id").alias("doc_id"))
    corpus = gated.join(losers, "doc_id", "left_anti")
    n_final = corpus.count()
    assert n_final <= n_gated
    # the sf0.001 corpus contains synthesized near-dups — some must drop
    assert losers.count() > 0

    # 4. corpus stats are deterministic across runs
    stats1 = sorted(tuple(r) for r in corpus.groupBy("lang")
                    .agg(F.count("*").alias("n"),
                         F.sum("n_chars").alias("chars")).collect())
    stats2 = sorted(tuple(r) for r in corpus.groupBy("lang")
                    .agg(F.count("*").alias("n"),
                         F.sum("n_chars").alias("chars")).collect())
    assert stats1 == stats2 and len(stats1) >= 3
