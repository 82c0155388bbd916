"""Multimodal-column queries (SURVEY.md L5) — binary payloads with typed
metadata, exercised over ``documents`` (text bytes stand in for media
bytes; the plumbing — BinaryType payloads, hash-dedup keys, frame-sample
plan expansion — is byte-for-byte what an image/audio pipeline uses).
The decode seam itself is stubbed in ``ops.multimodal`` and covered by
pytest, not the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import declared, tables


@declared(
    "l5_binary_meta",
    oracle="""
    SELECT doc_id,
           sha256(text)                       AS content_sha256,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
    FROM documents
    ORDER BY doc_id
    """,
    survey_ids=("L5", "L1"),
)
def l5_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary handling: payload as BinaryType, content-addressed
    sha256 dedup key + byte length, computed JVM-side (never base64)."""
    (docs,) = tables(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.sha2(payload, 256).alias("content_sha256"),
        F.octet_length(payload).alias("n_bytes"),
    ).orderBy("doc_id")


@declared(
    "l5_frame_sample_plan",
    oracle="""
    SELECT doc_id AS media_id, unnest(range(0, (n_chars % 100) + 1, 10)) AS frame_idx
    FROM documents
    ORDER BY media_id, frame_idx
    """,
    survey_ids=("L5",),
)
def l5_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: (media_id, n_frames) → one row per
    sampled frame index via sequence+explode — pure plan expansion, the
    decode of each sampled frame is the stubbed seam."""
    (docs,) = tables(spark, sf_dir, "documents")
    meta = docs.select(F.col("doc_id").alias("media_id"),
                       (F.col("n_chars") % 100).alias("last_frame"))
    return (meta.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("last_frame"), F.lit(10)))
         .alias("frame_idx"))
        .orderBy("media_id", "frame_idx"))
