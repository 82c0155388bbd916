#!/usr/bin/env python
"""Generate a ZIPFIAN-token documents corpus — the skew shape the flat
synthetic testdata deliberately lacks.

The containment/jaccard plan family's r8 decision (count-based inverted
index with post-aggregate size joins) was measured on the FLAT corpus
(shingle df median 9, max 25 at sf1); the docstrings defer the
prefix-filter plans to "Zipfian corpora" on an argument, not a number
(r8 verdict, next #2). This corpus makes the argument measurable:

- token frequencies follow Zipf(s=1.07) over a 30 k-word vocabulary, so
  head 3-gram shingles are shared by MANY documents (real web text);
- a fixed 12-word BOILERPLATE sentence is appended to a configurable
  fraction of docs (default 6 %) — the "same footer on every page"
  pathology that makes one shingle's inverted-index entry quadratic;
- deterministic (fixed numpy PCG seed), schema-identical to
  testdata documents.parquet (doc_id, text, lang, source, n_chars).

Near-dup structure: 2 % of docs are near-copies of an earlier doc
(90 % token overlap) so containment/jaccard queries return real pairs.

Usage: python tools/make_zipf_corpus.py [dst_dir] [n_docs] [vocab_size]
Default: <repo>/testdata_scale/zipf1  50000  30000

The optional vocab_size models HEAPS' LAW for larger tiers: real
corpora grow vocabulary ~n^0.75, which keeps tail-shingle document
frequencies bounded as the corpus grows — the property the prefix
plans' near-linear scaling rests on. A 500k-doc tier with the DEFAULT
30k vocabulary is the bounded-vocab adversary instead: every shingle's
df grows linearly with n, exact candidate generation is intrinsically
quadratic there, and the measured answer is the LSH path (see
tools/bench_zipf.py's huge tier).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VOCAB_SIZE = 30_000
ZIPF_S = 1.07
DOC_LEN_MIN, DOC_LEN_MAX = 60, 180
BOILERPLATE_FRAC = 0.06
NEAR_DUP_FRAC = 0.02
BOILERPLATE = ("this page is part of the example archive "
               "all rights reserved contact us").split()
LANGS = ["en", "zh", "de", "fr"]


def make(dst: str, n_docs: int, vocab_size: int = VOCAB_SIZE) -> None:
    rng = np.random.default_rng(20260815)
    # Zipf ranks via inverse-CDF over a truncated zeta distribution
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = ranks ** -ZIPF_S
    probs /= probs.sum()
    # Token draws via ONE precomputed CDF + searchsorted (r12): the old
    # per-doc `rng.choice(..., p=probs)` recomputed the vocab-sized
    # cumsum on every call — O(vocab) per DOCUMENT, ~40 minutes of pure
    # cumsum at the 5 M-doc × 949 k-vocab fourth decade. Same truncated
    # -zeta distribution, different (still fixed-seed deterministic)
    # draw sequence; the existing committed tiers stay as generated.
    cdf = np.cumsum(probs)
    cdf[-1] = 1.0

    def draw(k: int) -> np.ndarray:
        return np.searchsorted(cdf, rng.random(k), side="right")

    words = np.array([f"w{i}" for i in range(vocab_size)])

    lens = rng.integers(DOC_LEN_MIN, DOC_LEN_MAX + 1, size=n_docs)
    texts: list[str] = []
    for i in range(n_docs):
        if i > 0 and rng.random() < NEAR_DUP_FRAC:
            # near-copy of a random earlier doc: resample 10 % of tokens
            src = int(rng.integers(0, i))
            toks = texts[src].split()
            idx = rng.random(len(toks)) < 0.10
            repl = words[draw(int(idx.sum()))]
            toks = np.array(toks, dtype=object)
            toks[idx] = repl
            texts.append(" ".join(toks.tolist()))
            continue
        toks = words[draw(int(lens[i]))]
        body = " ".join(toks.tolist())
        if rng.random() < BOILERPLATE_FRAC:
            body = body + " " + " ".join(BOILERPLATE)
        texts.append(body)

    os.makedirs(dst, exist_ok=True)
    # chunked ParquetWriter (r12): one pa.table over 5 M documents
    # overflows Arrow's 2 GB 32-bit string column; 250 k-doc row groups
    # keep every chunk far under it and give the scan real parallelism
    chunk = 250_000
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string()), ("source", pa.string()),
                        ("n_chars", pa.int64())])
    with pq.ParquetWriter(os.path.join(dst, "documents.parquet"),
                          schema) as w:
        for lo in range(0, n_docs, chunk):
            hi = min(lo + chunk, n_docs)
            part = texts[lo:hi]
            w.write_table(pa.table({
                "doc_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "text": pa.array(part, type=pa.string()),
                "lang": pa.array([LANGS[i % len(LANGS)]
                                  for i in range(lo, hi)]),
                "source": pa.array([f"src{i % 7}" for i in range(lo, hi)]),
                "n_chars": pa.array(np.array([len(t) for t in part],
                                             dtype=np.int64)),
            }, schema=schema))
    print(f"wrote {dst}/documents.parquet: {n_docs} docs, "
          f"vocab {vocab_size}, zipf s={ZIPF_S}, "
          f"boilerplate {BOILERPLATE_FRAC:.0%}, near-dup {NEAR_DUP_FRAC:.0%}")


if __name__ == "__main__":
    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "testdata_scale", "zipf1")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    v = int(sys.argv[3]) if len(sys.argv) > 3 else VOCAB_SIZE
    make(dst, n, v)
