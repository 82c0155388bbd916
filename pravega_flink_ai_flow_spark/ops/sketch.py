"""Mergeable frequency sketches (count-min) — the bounded-state answer
to "term frequencies over 100 TB / an unbounded stream".

A count-min sketch is a depth × width counter matrix; an item increments
one counter per row (independent hashes) and its estimate is the MIN of
those counters — always ≥ the true count, and ≤ true + (e/width)·N with
probability 1 − (1/e)^depth. The property that matters at scale is
**mergeability**: sketches of partitions sum elementwise, so the corpus
sketch is one map-side pass plus a shuffle of ≤ depth·width counters per
partition — state is O(depth·width) regardless of corpus or stream size
(this is also why it composes with the incremental-rollup partial store:
partial sketches append, readers merge).

The exact formulation (explode + groupBy) stays the oracle — the sketch
is for when the term universe itself is too large to shuffle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F


def _positions(term: str, width: int, depth: int) -> list[int]:
    """Row-d bucket for a term: sha256(d, term) mod width — deterministic
    across Python versions (no PYTHONHASHSEED dependence), identical in
    build and estimate."""
    return [int(hashlib.sha256(f"{d}_{term}".encode()).hexdigest()[:15], 16)
            % width for d in range(depth)]


def count_min_build(df: DataFrame, col: str = "text", *,
                    width: int = 2048, depth: int = 4) -> DataFrame:
    """Build the corpus term-frequency sketch as a sparse (pos, cnt)
    table, pos = d·width + bucket. Each partition emits its partial
    sketch's nonzero cells from one ``mapInPandas`` pass (vectorized
    token explode + per-unique-term hashing — vocabulary-sized python
    work, not corpus-sized); a groupBy(pos) sum merges partials. The
    merged table is ≤ depth·width rows however large the input."""
    import numpy as np
    import pandas as pd

    def partial(batches):
        sk = np.zeros(depth * width, dtype=np.int64)
        seen = False
        for pdf in batches:
            toks = pdf[col].str.strip().str.split().explode()
            counts = toks.value_counts()
            if not len(counts):
                continue
            seen = True
            for term, cnt in counts.items():
                for d, p in enumerate(_positions(term, width, depth)):
                    sk[d * width + p] += int(cnt)
        if seen:
            nz = np.nonzero(sk)[0]
            yield pd.DataFrame({"pos": nz, "cnt": sk[nz]})

    partials = df.mapInPandas(partial, "pos long, cnt long")
    return partials.groupBy("pos").agg(F.sum("cnt").alias("cnt"))


def count_min_estimate(sketch: DataFrame, terms: list[str], *,
                       width: int = 2048, depth: int = 4) -> DataFrame:
    """Point-estimate the given terms against a built sketch: join each
    term's depth positions (a broadcast-small literal table) to the
    sketch and take the per-term MIN. Missing positions mean a zero
    counter — impossible for a term the sketch actually saw, so the
    inner join is exact for present terms."""
    spark = sketch.sparkSession
    probes = spark.createDataFrame(
        [(t, d * width + p)
         for t in terms
         for d, p in enumerate(_positions(t, width, depth))],
        "term string, pos long")
    return (sketch.join(F.broadcast(probes), "pos")
            .groupBy("term").agg(F.min("cnt").alias("est")))
