"""Similarity search over embedding columns (SURVEY.md L3).

Exact brute-force cosine top-k as the baseline (JVM higher-order
functions, no Python in the row path), plus an LSH-bucketed approximate
variant as the 100 TB scale path: random-hyperplane signatures prune the
candidate set to co-bucketed vectors before the exact rerank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .partitioning import spread


def _dot(a: Column, b: Column) -> Column:
    """JVM-side dot product: zip_with multiply → aggregate sum (doubles)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(queries: DataFrame, corpus: DataFrame, *,
                     query_id: str = "q_id", corpus_id: str = "c_id",
                     query_vec: str = "q_vec", corpus_vec: str = "c_vec",
                     k: int = 10) -> DataFrame:
    """Exact top-k cosine per query. The (small) query set is broadcast
    against the corpus — one pass over the corpus, no corpus shuffle; the
    per-query top-k is a WindowGroupLimit (each partition keeps ≤ k rows
    per query before the final merge). Norms are precomputed per side so
    each pair costs ONE dot product, not three."""
    q = queries.withColumn("__qn", _norm(F.col(query_vec)))
    # the per-pair dot products run on the corpus side's partitioning —
    # spread a small single-file corpus across the cluster first
    c = spread(corpus).withColumn("__cn", _norm(F.col(corpus_vec)))
    scored = (c.join(F.broadcast(q))
              .withColumn("cosine",
                          _dot(F.col(query_vec), F.col(corpus_vec))
                          / (F.col("__qn") * F.col("__cn"))))
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, corpus_id, "cosine", "rank"))


# Deterministic pseudo-random hyperplanes: component h of plane p is a
# fixed hash of (p, h) mapped to ±1. Fully reproducible, no RNG state.
def _hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    comps = F.zip_with(
        vec,
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda v, i: v.cast("double") *
        F.when(F.pmod(F.xxhash64(F.concat(F.lit(f"p{plane}_"), i)), 2) == 0, 1.0)
         .otherwise(-1.0))
    return (F.aggregate(comps, F.lit(0.0), lambda acc, v: acc + v) >= 0).cast("int")


def lsh_bucket_topk(queries: DataFrame, corpus: DataFrame, *,
                    query_id: str = "q_id", corpus_id: str = "c_id",
                    query_vec: str = "q_vec", corpus_vec: str = "c_vec",
                    k: int = 10, n_tables: int = 8, n_planes: int = 3,
                    dim: int = 64, exclude_self: bool = False) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH. A pair is a
    candidate if it collides in ANY of ``n_tables`` independent tables of
    ``n_planes`` sign bits (the standard OR-of-ANDs construction: per-table
    match P = (1−θ/π)^planes, overall 1−(1−P)^tables — tables buy recall,
    planes buy selectivity). Candidates get an exact cosine rerank.

    At scale the per-query corpus scan becomes an equi-join on
    (table, bucket): candidate count drops ~2^planes per table."""
    def table_rows(df: DataFrame, vec_col: str) -> DataFrame:
        tables = [
            F.struct(
                F.lit(t).alias("lsh_table"),
                F.concat_ws("", *[
                    _hyperplane_sign(F.col(vec_col), t * n_planes + p, dim)
                    .cast("string")
                    for p in range(n_planes)]).alias("bucket"))
            for t in range(n_tables)]
        return (df.withColumn("__tb", F.explode(F.array(*tables)))
                .withColumn("lsh_table", F.col("__tb.lsh_table"))
                .withColumn("bucket", F.col("__tb.bucket"))
                .drop("__tb"))

    qb = table_rows(queries, query_vec)
    cb = table_rows(spread(corpus), corpus_vec)
    cands = (cb.join(F.broadcast(qb), ["lsh_table", "bucket"])
             .select(query_id, corpus_id, query_vec, corpus_vec)
             .dropDuplicates([query_id, corpus_id]))
    if exclude_self:
        # when queries are drawn from the corpus, the query trivially
        # collides with itself (cosine 1.0) and would waste a top-k slot
        cands = cands.filter(F.col(query_id) != F.col(corpus_id))
    scored = cands.withColumn(
        "cosine", cosine(F.col(query_vec), F.col(corpus_vec)))
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, corpus_id, "cosine", "rank"))


def ivf_topk(queries: DataFrame, corpus: DataFrame, *,
             query_id: str = "q_id", corpus_id: str = "c_id",
             query_vec: str = "q_vec", corpus_vec: str = "c_vec",
             k: int = 10, centroid_stride: int = 50,
             nprobe: int = 4, exclude_self: bool = False) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index, the other
    standard ANN layout next to LSH: partition the corpus into cells
    around centroids, probe only the ``nprobe`` nearest cells per query.

    Centroids are a deterministic corpus subsample (every
    ``centroid_stride``-th id) instead of k-means — same index structure,
    reproducible without an iterative training job. All steps are
    DataFrame ops: cell assignment is a broadcast join + per-row min, the
    probe is an equi-join on cell id — no driver-side collect, so the
    build scales with the corpus."""
    cents = (corpus.filter(F.pmod(F.col(corpus_id), F.lit(centroid_stride)) == 0)
             .select(F.col(corpus_id).alias("cent_id"),
                     F.col(corpus_vec).alias("cent_vec")))

    def nearest_cells(df: DataFrame, row_id: str, vec: str,
                      n: int, out: str) -> DataFrame:
        scored = (df.join(F.broadcast(cents))
                  .withColumn("__sim", cosine(F.col(vec), F.col("cent_vec"))))
        w = Window.partitionBy(row_id).orderBy(
            F.col("__sim").desc(), F.col("cent_id").asc())
        return (scored.withColumn("__cr", F.row_number().over(w))
                .filter(F.col("__cr") <= n)
                .select(*df.columns, F.col("cent_id").alias(out)))

    # corpus side: each vector lives in exactly its nearest cell
    assigned = nearest_cells(spread(corpus), corpus_id, corpus_vec, 1, "cell")
    # query side: probe the nprobe nearest cells
    probes = nearest_cells(queries, query_id, query_vec, nprobe, "cell")
    cands = (assigned.join(F.broadcast(probes), "cell")
             .dropDuplicates([query_id, corpus_id]))
    if exclude_self:
        cands = cands.filter(F.col(query_id) != F.col(corpus_id))
    scored = cands.withColumn(
        "cosine", cosine(F.col(query_vec), F.col(corpus_vec)))
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, corpus_id, "cosine", "rank"))


def cosine_near_dup_pairs_blocked(df: DataFrame, *, id_col: str = "vec_id",
                                  vec_col: str = "embedding",
                                  threshold: float = 0.95,
                                  n_blocks: int = 8) -> DataFrame:
    """All-pairs cosine ≥ threshold via blocked GEMM — the scalable exact
    formulation: split the corpus into ``n_blocks`` deterministic blocks,
    ship each unordered block pair (i ≤ j) to one ``applyInPandas`` group,
    and compute the block×block similarity as ONE numpy matrix multiply
    over L2-normalized float64 rows.

    Shuffle volume is corpus × (n_blocks+1)/2 rows (each row joins every
    partner block) — tune n_blocks ≈ √cluster-parallelism; per-task
    memory is 2 blocks of vectors, independent of corpus size. Versus the
    row-at-a-time self-join this replaces |corpus|²/2 interpreted
    higher-order-function dot products with dense BLAS.

    Numerics: float64 matmul can differ from a sequential fold in the
    last ulp — equal under any ≥1e-9 tolerance (pytest-checked against
    :func:`cosine_near_dup_pairs`); use the fold version when bit-exact
    SQL parity matters."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    e = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
                  F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("blk"))
    block_pairs = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "ba int, bb int")
    # a row participates in pair (ba, bb) if its block matches either side
    tagged = e.join(F.broadcast(block_pairs),
                    (F.col("blk") == F.col("ba")) | (F.col("blk") == F.col("bb")))

    out_schema = "id_a long, id_b long, cosine double"

    def gemm(key, pdf: pd.DataFrame):
        ba, bb = key
        va = pdf[pdf["blk"] == ba]
        vb = pdf[pdf["blk"] == bb]
        if len(va) == 0 or len(vb) == 0:
            return pd.DataFrame(columns=["id_a", "id_b", "cosine"])
        A = np.stack(va["vec"].to_numpy()).astype(np.float64)
        B = np.stack(vb["vec"].to_numpy()).astype(np.float64)
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        B /= np.linalg.norm(B, axis=1, keepdims=True)
        sims = A @ B.T
        ia, ib = np.nonzero(sims >= threshold)
        id_a = va["vid"].to_numpy()[ia]
        id_b = vb["vid"].to_numpy()[ib]
        cos = sims[ia, ib]
        if ba == bb:
            # each unordered pair appears as (u,v) AND (v,u): keep one
            keep = id_a < id_b
            id_a, id_b, cos = id_a[keep], id_b[keep], cos[keep]
        else:
            # appears once — orient to (lo, hi)
            lo = np.minimum(id_a, id_b)
            hi = np.maximum(id_a, id_b)
            id_a, id_b = lo, hi
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cosine": cos})

    return (tagged.groupBy("ba", "bb")
            .applyInPandas(gemm, out_schema))


def cosine_near_dup_pairs(df: DataFrame, *, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup pairs (L2 embedding variant), exact:
    id-ordered self-join + cosine filter. This is the oracle-checkable
    baseline; at corpus scale use ``lsh_bucket_topk``-style hyperplane
    blocking first so the pair count stays near-linear."""
    df = spread(df)
    a = (df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
         .withColumn("__na", _norm(F.col("vec_a"))))
    b = (df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
         .withColumn("__nb", _norm(F.col("vec_b"))))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (pairs.withColumn("cosine",
                             _dot(F.col("vec_a"), F.col("vec_b"))
                             / (F.col("__na") * F.col("__nb")))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))
