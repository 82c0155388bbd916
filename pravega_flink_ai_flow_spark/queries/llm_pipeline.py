"""End-to-end training-data pipeline composite (SURVEY.md L4/L2/L1):
the whole preprocessing chain a pretraining run executes — quality
gate → exact dedup → benchmark decontamination → export assignment —
declared as ONE query so the driver gate proves the *composition*, not
just the stages. Every stage reuses the per-stage op that is already
individually hash-green (ops.text.quality_frame, ops.dedup.exact_dedup
semantics, the broadcast gram semi-probe of contamination_report, the
llm_export packing/shard arithmetic), and the oracle chains the
corresponding proven SQL fragments through one CTE pipeline.

Reference parity: fyang86/pravega-flink-ai-flow's processor.py chains
read → transform → train/predict → sink as one workflow DAG; this is
the same end-to-end shape for the data-preparation half, expressed as
a single Catalyst plan (each stage is a narrow projection/filter or a
bounded single-shuffle step, so the optimizer sees — and pipelines —
the whole chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import declared, tables
from ..ops import dedup
from ..ops import text as T
from .llm_dedup import _GRAMS5_CTE
from .llm_export import _N_SHARDS, _P, _PACK_BUDGET, _SHARD_A, _SHARD_B

# Stopword list shared with l4_quality_filter's oracle (ops.text keeps
# the canonical copy for the Spark side).
_STOPWORDS_SQL = ("['the','a','an','and','or','of','to','in','is','it',"
                  "'for','on','with','as','at','by','be','this','that',"
                  "'are']")


@declared(
    "l6_pretrain_pipeline",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, text,
               list_filter(string_split_regex(trim(text), '\\s+'),
                           t -> t != '') AS toks
        FROM documents
    ),
    feat AS (
        SELECT doc_id, lang, text,
               CAST(len(toks) AS DOUBLE) AS n_tok,
               least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) AS len_score,
               least((CAST(len(list_filter(toks, t -> list_contains(
                   {_STOPWORDS_SQL},
                   lower(t)))) AS DOUBLE) / greatest(len(toks), 1)) * 4.0,
                   1.0) AS stop_score,
               CASE WHEN (CAST(list_sum(list_transform(toks, t -> len(t)))
                               AS DOUBLE)
                          / greatest(len(toks), 1)) BETWEEN 3.0 AND 10.0
                    THEN 1.0 ELSE 0.5 END AS wl_score
        FROM toks
    ),
    kept AS (
        SELECT doc_id, lang, text,
               (len_score + stop_score + wl_score) / 3.0 AS quality,
               CAST(n_tok AS BIGINT) AS n_tokens
        FROM feat
        WHERE (len_score + stop_score + wl_score) / 3.0 >= 0.6
          AND n_tok BETWEEN 20 AND 1000
    ),
    deduped AS (
        SELECT doc_id, lang, text, quality, n_tokens FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY text
                                         ORDER BY doc_id) AS rn
            FROM kept
        ) WHERE rn = 1
    ),
    train AS (SELECT * FROM deduped WHERE doc_id % 10 <> 0),
    {_GRAMS5_CTE},
    bench_grams AS (
        SELECT DISTINCT shingle FROM grams5 WHERE id % 10 = 0
    ),
    contaminated AS (
        SELECT DISTINCT g.id
        FROM grams5 g
        JOIN bench_grams b ON g.shingle = b.shingle
        WHERE g.id IN (SELECT doc_id FROM train)
    ),
    clean AS (
        SELECT * FROM train
        WHERE doc_id NOT IN (SELECT id FROM contaminated)
    )
    SELECT doc_id, lang, quality, n_tokens,
           CAST(cum - n_tokens AS BIGINT)                     AS tok_offset,
           CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST((doc_id * {_SHARD_A} + {_SHARD_B}) % {_P} % {_N_SHARDS}
                AS INTEGER)                                   AS shard
    FROM (
        SELECT doc_id, lang, quality, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM clean
    )
    ORDER BY doc_id
    """,
    survey_ids=("L4", "L2", "L1", "P4", "W4"),
)
def l6_pretrain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole pretraining data-prep chain as ONE declared plan:

    1. **Quality gate** — composite score ≥ 0.6 and 20 ≤ tokens ≤ 1000,
       features from the single ``mapInArrow`` pass of
       :func:`ops.text.quality_frame` (same doubles as the hash-green
       l4_quality_filter). Map-side; no shuffle.
    2. **Exact dedup** — keep the smallest doc_id per identical text
       via a window over ``sha2(text)`` (the :func:`ops.dedup.
       exact_dedup` digest-grouping semantics: rows shuffle once on a
       32-byte digest, never on raw text keys).
    3. **Benchmark decontamination** — drop any surviving training doc
       (doc_id % 10 ≠ 0) sharing a word-5-gram with the benchmark
       split (doc_id % 10 = 0, taken from the RAW corpus — the eval
       suite is external and not subject to the quality gate). The
       distinct benchmark gram set is **broadcast** (eval suites are
       broadcast-small by construction) and probed map-side — the
       training corpus never shuffles by gram
       (:func:`ops.dedup.contamination_report`'s scale shape).
    4. **Export assignment** — per-language pack offsets (one window
       cumsum per shard key, the parallel packing formulation of
       l6_sequence_packing) and the universal-hash shard of
       l6_shard_assign.

    Scale audit at 100 TB: stages 1 and 3 are map-side over the corpus;
    stage 2 is one digest-keyed shuffle; stage 4 is one lang-keyed
    window. Nothing quadratic, nothing driver-side, and Catalyst sees
    the entire chain as one plan (the quality filter prunes before the
    dedup shuffle — the composition is cheaper than running the four
    stages as separate jobs with interchange materialization)."""
    (docs,) = tables(spark, sf_dir, "documents")

    # stage 1: quality gate (Arrow featurization pass; emit_text=True
    # passes the raw text through the SAME Arrow column the pass
    # already reads — one payload crossing, not the doubled transfer
    # of an aliased pass-through id col)
    qf = T.quality_frame(docs, id_cols=("doc_id", "lang"),
                         emit_text=True)
    kept = (qf.filter((F.col("quality") >= 0.6) &
                      F.col("n_tok").cast("double").between(20, 1000))
            .select("doc_id", "lang", "text", "quality",
                    F.col("n_tok").cast("long").alias("n_tokens")))

    # stage 2: exact dedup — smallest id per digest (one narrow-key
    # shuffle; digest, not text, is the shuffle key)
    wd = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    deduped = (kept.withColumn("__rn", F.row_number().over(wd))
               .filter(F.col("__rn") == 1).drop("__rn"))
    train = deduped.filter(F.col("doc_id") % 10 != 0)

    # stage 3: decontamination — broadcast the distinct benchmark gram
    # set, map-side semi-probe, anti-join the hit ids back. The probe
    # side grams the RAW train-half of the corpus (doc_id % 10 != 0),
    # NOT the `train` frame: Catalyst does not share common subtrees,
    # so gramming `train` re-ran the whole quality featurize pass and
    # the digest-dedup shuffle a second time under the anti-join's
    # build side (r15 before-plan: 2 MapInArrow + 2 window exchanges).
    # Equivalent output: text is untouched by stages 1-2, and the
    # left_anti intersects the hit set with `train`, so extra hit ids
    # from gate-rejected/duplicate docs drop out identically.
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    bg = (dedup.shingle_table(bench, "doc_id", "text", k=5)
          .select("shingle").distinct())
    tg = dedup.shingle_table(docs.filter(F.col("doc_id") % 10 != 0),
                             "doc_id", "text", k=5)
    contaminated = (tg.join(F.broadcast(bg), "shingle", "left_semi")
                    .select(F.col("id").alias("doc_id")).distinct())
    clean = train.join(contaminated, "doc_id", "left_anti")

    # stage 4: export assignment (per-lang pack offsets + hash shard)
    wl = (Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(wl)
    h = F.pmod(F.col("doc_id") * _SHARD_A + _SHARD_B, F.lit(_P))
    return (clean
            .withColumn("tok_offset", (cum - F.col("n_tokens")).cast("long"))
            .withColumn("pack_id",
                        F.expr(f"tok_offset div {_PACK_BUDGET}"))
            .withColumn("shard", F.pmod(h, F.lit(_N_SHARDS)).cast("int"))
            .select("doc_id", "lang", "quality", "n_tokens",
                    "tok_offset", "pack_id", "shard")
            .orderBy("doc_id"))
