"""Training-data export queries (SURVEY.md L4 adjacency): the last
stage of a data pipeline — mixture re-weighting and deterministic
shard assignment before the corpus is written for training.

The reference's pipeline hands processed data straight to the training
job (processor.py feeds the Flink job's sink); at 100 TB the handoff is
a sharded, mixture-weighted export, which is what these queries model.
Everything is integer arithmetic on both engines — deterministic,
replayable, ANSI-overflow-safe (coefficients < 2^31, ids < 2^31 at
declared scales ⇒ products < 2^62).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import declared, tables

# Universal-hash constants (distinct per use so derived streams don't
# correlate); modulus = Mersenne prime 2^31-1 as in ops.dedup.
_P = (1 << 31) - 1
_SAMPLE_A, _SAMPLE_B = 1000003, 12345
_SHARD_A, _SHARD_B = 999983, 777
_N_SHARDS = 8


@declared(
    "l6_mixture_weighted_sample",
    oracle=f"""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               (doc_id * {_SAMPLE_A} + {_SAMPLE_B}) % {_P} % 100 AS pct,
               (CAST(substr(source, 4) AS INT) % 4 + 1) * 25 AS rate_pct
        FROM documents
    ) WHERE pct < rate_pct
    """,
    survey_ids=("L4", "P4"),
)
def l6_mixture_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture re-weighting: downsample each source to a configured
    rate (here a rule on the source index — 25/50/75/100% cycling) with
    a deterministic per-row universal-hash accept test. The accept
    predicate is a pure row expression — map-side, pushed to the scan,
    zero shuffle at any corpus size — and replayable: the same doc
    survives every rerun, so downstream incremental stages stay stable."""
    (docs,) = tables(spark, sf_dir, "documents")
    pct = F.pmod(F.pmod(F.col("doc_id") * _SAMPLE_A + _SAMPLE_B, F.lit(_P)),
                 F.lit(100))
    rate = (F.pmod(F.substring("source", 4, 10).cast("int"), F.lit(4)) + 1) * 25
    return (docs.filter(pct < rate).select("doc_id", "source"))


_PACK_BUDGET = 2048   # tokens per packed training sequence


@declared(
    "l6_sequence_packing",
    oracle=f"""
    SELECT doc_id, lang, n_tokens,
           CAST(cum - n_tokens AS BIGINT)                    AS tok_offset,
           CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS pack_id
    FROM (
        SELECT doc_id, lang, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM (
            SELECT doc_id, lang,
                   CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                        t -> t != '')) AS BIGINT) AS n_tokens
            FROM documents
        )
    )
    ORDER BY lang, doc_id
    """,
    survey_ids=("L4", "W4", "O1"),
)
def l6_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training export: contiguous offset-based
    assignment of documents to fixed token-budget packs. Each doc gets
    its cumulative token offset within its shard (here: language) and
    ``pack_id = offset // budget`` — the deterministic, parallel
    formulation of packing (true first-fit is inherently sequential;
    offset-chunking is what large-scale packers actually run because it
    needs ONE window cumsum per shard, no cross-shard coordination, and
    re-runs reproducibly). At 100 TB the shard key keeps every window
    partition independent — no global sort."""
    (docs,) = tables(spark, sf_dir, "documents")
    from ..ops.text import token_count
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    base = docs.select("doc_id", "lang",
                       token_count(F.col("text")).cast("long").alias("n_tokens"))
    cum = F.sum("n_tokens").over(w)
    return (base
            .withColumn("tok_offset", (cum - F.col("n_tokens")).cast("long"))
            .withColumn("pack_id",
                        F.expr(f"tok_offset div {_PACK_BUDGET}"))
            .orderBy("lang", "doc_id"))


@declared(
    "l6_train_test_split",
    oracle="""
    WITH labeled AS (
        SELECT lang, n_chars,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'valid'
                    ELSE 'test' END AS split
        FROM (
            SELECT lang, n_chars,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 100 AS bucket
            FROM documents
        )
    ),
    agg AS (
        SELECT lang, split, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM labeled GROUP BY lang, split
    )
    SELECT lang, split, n_docs, sum_chars,
           n_docs / SUM(n_docs) OVER (PARTITION BY lang) AS lang_frac
    FROM agg
    ORDER BY lang, split
    """,
    survey_ids=("L4", "A1", "W4"),
)
def l6_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-addressed train/valid/test split (80/10/10)
    with a per-language stratification report. The split key is the
    first 8 hex digits of ``md5(doc_id)`` mod 100 — the hash-bucket
    rule real pipelines use so that (a) membership is a pure row
    expression (map-side, no shuffle, no stored split table), (b) the
    assignment is stable under appends: new documents never move an
    existing doc's split, unlike ``ORDER BY random() LIMIT``-style
    splits. The only shuffle is the tiny (lang, split) aggregate;
    ``lang_frac`` is a single exact-int division (bit-identical across
    engines, never rounded — CLAUDE.md rule) exposing how far each
    language's realized split drifts from 80/10/10."""
    (docs,) = tables(spark, sf_dir, "documents")
    bucket = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                     16, 10).cast("bigint") % 100)
    split = (F.when(bucket < 80, "train")
             .when(bucket < 90, "valid").otherwise("test"))
    agg = (docs.select("lang", "n_chars", split.alias("split"))
           .groupBy("lang", "split")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n_chars").alias("sum_chars")))
    wl = Window.partitionBy("lang")
    return (agg.withColumn("lang_frac",
                           F.col("n_docs") / F.sum("n_docs").over(wl))
            .orderBy("lang", "split"))


@declared(
    "l6_shard_assign",
    oracle=f"""
    SELECT doc_id, shard,
           ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
    FROM (
        SELECT doc_id,
               (doc_id * {_SHARD_A} + {_SHARD_B}) % {_P} AS h,
               (doc_id * {_SHARD_A} + {_SHARD_B}) % {_P} % {_N_SHARDS} AS shard
        FROM documents
    )
    """,
    survey_ids=("L4", "O1", "W1"),
)
def l6_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    export: shard = universal hash mod N (decorrelates adjacent ids —
    the 'global shuffle' training wants), pos = rank within the shard
    by (hash, id). The plan is exactly the sharded-write shape: one
    hash-partition shuffle, an in-partition sort, no global sort — at
    100 TB each shard sorts independently and streams to its file."""
    (docs,) = tables(spark, sf_dir, "documents")
    h = F.pmod(F.col("doc_id") * _SHARD_A + _SHARD_B, F.lit(_P))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (docs.select("doc_id", h.alias("h"),
                        F.pmod(h, F.lit(_N_SHARDS)).alias("shard"))
            .withColumn("pos", F.row_number().over(w))
            .select("doc_id", "shard", "pos"))
