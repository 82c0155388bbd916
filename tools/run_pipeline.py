#!/usr/bin/env python
"""Demo CLI: the full training-data pipeline over the driver test corpus.

    python tools/run_pipeline.py [sf_dir]

Stages (each backed by an oracle-checked operator, see SURVEY.md §8):
ingest → canonical-fingerprint exact dedup → quality gate → MinHash-LSH
near-dedup → connected-components cluster resolution → per-language
corpus statistics. Prints per-stage row counts and the final stats table.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import Window, functions as F
    from pravega_flink_ai_flow_spark.engine.session import get_spark
    from pravega_flink_ai_flow_spark.ops import dedup, text
    from pravega_flink_ai_flow_spark.queries import tables

    spark = get_spark("pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()

    (docs,) = tables(spark, sf_dir, "documents")
    print(f"ingest              {docs.count():>8} docs   ({sf_dir})")

    exact = (docs.withColumn("fp", text.fingerprint(F.col("text")))
             .withColumn("keep", F.min("doc_id").over(Window.partitionBy("fp")))
             .filter(F.col("doc_id") == F.col("keep")).drop("fp", "keep"))
    print(f"exact dedup         {exact.count():>8} docs")

    gated = exact.filter(
        (text.quality_score(F.col("text")) >= 0.6) &
        text.token_count(F.col("text")).between(20, 1000))
    print(f"quality gate        {gated.count():>8} docs")

    pairs = dedup.minhash_dedup_pairs(gated, "doc_id", "text",
                                      k=3, num_hashes=64, bands=16,
                                      threshold=0.7)
    losers = (dedup.connected_components(pairs)
              .filter(F.col("id") != F.col("cluster_id"))
              .select(F.col("id").alias("doc_id")))
    corpus = gated.join(losers, "doc_id", "left_anti")
    print(f"near dedup          {corpus.count():>8} docs")

    print("\nper-language corpus stats:")
    (corpus.groupBy("lang")
     .agg(F.count("*").alias("n_docs"),
          F.sum("n_chars").alias("total_chars"),
          F.round(F.avg("n_chars"), 1).alias("avg_chars"))
     .orderBy("lang")
     .show(truncate=False))

    print(f"wall: {time.perf_counter() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
