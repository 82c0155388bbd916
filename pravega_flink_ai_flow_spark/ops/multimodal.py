"""Multimodal columns (SURVEY.md L5): image/audio/video as opaque
``binary`` payloads + typed metadata structs.

The Spark-side plumbing — schema, partition sizing, Arrow-batched UDF
signatures — is real and tested; the actual media decoding is stubbed
(the image/audio libraries are not in this container) behind
``NotImplementedError`` / a deterministic fake, clearly marked.

At 100 TB the rules encoded here: payloads ride in ``BinaryType`` columns
(never base64 strings), metadata lives in a pruned-friendly struct,
decode work happens in ``mapInPandas`` with small-`maxRecordsPerBatch`
Arrow batches so a partition of 100 MB images never materializes as one
pandas block.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),          # image | audio | video
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mime", T.StringType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("content_sha256", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def read_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None) -> DataFrame:
    """Ingest raw media files as binary rows (spark.read.format
    ('binaryFile')); payload stays opaque bytes end-to-end."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def content_hash(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Exact binary dedup key: sha2 over the payload, computed JVM-side."""
    return df.withColumn("content_sha256", F.sha2(F.col(content_col), 256))


def decode_image(content: bytes) -> "object":
    """STUB — real implementation needs an image library (PIL/opencv),
    not present in this container. The engine treats decode as a
    black-box bytes→tensor function behind this seam."""
    raise NotImplementedError(
        "image decode requires an image library not present in this "
        "container; swap this stub for PIL.Image.open(io.BytesIO(content))")


def _fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature extractor (stands in for a real encoder):
    bytes → sha256 → `dim` floats in [0,1). Stable across runs/executors."""
    digest = hashlib.sha256(content or b"").digest()
    return [int.from_bytes(digest[4 * i: 4 * i + 4], "big") / 2**32
            for i in range(dim)]


def extract_features(df: DataFrame, content_col: str = "content",
                     id_col: str = "media_id", dim: int = 8) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas — the real
    plumbing for a decode/encode stage: Arrow-batched iterator in, bounded
    memory per batch, columnar result out. The per-item transform is the
    deterministic fake above (decode itself is stubbed)."""
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "content_sha256": pdf[content_col].map(
                    lambda b: hashlib.sha256(bytes(b or b"")).hexdigest()),
                "n_bytes": pdf[content_col].map(lambda b: len(b or b"")).astype("int32"),
                "feature": pdf[content_col].map(lambda b: _fake_feature(bytes(b or b""), dim)),
            })

    return df.mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, n_frames) into one
    row per sampled frame index — pure JVM sequence/explode; the actual
    frame decode is the stubbed seam above."""
    return (df.select("media_id",
                      F.explode(F.sequence(
                          F.lit(0),
                          F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                          F.lit(every_n))).alias("frame_idx")))
