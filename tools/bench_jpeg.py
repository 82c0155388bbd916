#!/usr/bin/env python
"""JPEG codec throughput ceiling (r8 verdict, next #5).

ops/jpeg.py is a from-scratch pure-python/numpy baseline-JPEG codec;
the l5_* queries run it inside Arrow-batched ``mapInPandas``, so the
per-image Python cost is the hard per-core ceiling of the multimodal
decode path — this tool puts a NUMBER on it (no Spark involved; the
Spark overhead on top is the usual mapInPandas batch plumbing).

Measures, on a deterministic image set spanning the sizes the declared
queries use (8×8 … 64×64 grayscale + a 4:2:0 RGB case):

- encode/decode images/sec and pixel-MB/s per core;
- the per-block vs per-image cost split (the Huffman bit-reader is the
  per-BLOCK serial path; DCT/quant are vectorized per image).

Writes BENCH_jpeg.json at the repo root and asserts round-trip
exactness while timing (a wrong-but-fast codec must not pass).

Usage: python tools/bench_jpeg.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pravega_flink_ai_flow_spark.ops.jpeg import (  # noqa: E402
    decode_jpeg, encode_jpeg,
)


def _image(seed: int, bw: int, bh: int) -> np.ndarray:
    by, bx = np.mgrid[0:bh, 0:bw]
    blocks = ((seed * 37 + bx * 11 + by * 23) % 256).astype(np.uint8)
    return np.repeat(np.repeat(blocks, 8, 0), 8, 1)


def _bench(images, quality=100, exact=True, **enc_kw):
    encs = []
    t0 = time.perf_counter()
    for px in images:
        encs.append(encode_jpeg(px, quality, **enc_kw))
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for px, b in zip(images, encs):
        w, h, _c, arr = decode_jpeg(b)
        if exact:
            assert (arr.reshape(px.shape) == px).all()
    t_dec = time.perf_counter() - t0
    n_px = sum(px.size for px in images)
    return {
        "images": len(images), "pixels": n_px,
        "blocks": n_px // 64,
        "enc_sec": round(t_enc, 3), "dec_sec": round(t_dec, 3),
        "enc_img_per_sec": round(len(images) / t_enc, 1),
        "dec_img_per_sec": round(len(images) / t_dec, 1),
        "enc_px_mb_per_sec": round(n_px / t_enc / 1e6, 3),
        "dec_px_mb_per_sec": round(n_px / t_dec / 1e6, 3),
        "dec_us_per_block": round(t_dec / (n_px // 64) * 1e6, 1),
    }


def main() -> None:
    out = {}
    # the declared-query shape: tiny images (1-3 × 1-2 blocks), 500 docs
    tiny = [_image(i, i % 3 + 1, i % 2 + 1) for i in range(500)]
    out["tiny_query_shape"] = _bench(tiny)
    # medium: 64×64 (8×8 blocks) — per-image fixed costs amortized
    med = [_image(i, 8, 8) for i in range(100)]
    out["gray_64x64"] = _bench(med)
    # RGB 4:2:0 at quality 92 — the lossy path (no exactness check)
    rgb = []
    for i in range(20):
        y, x = np.mgrid[0:64, 0:64]
        rgb.append(np.stack([(x * 2 + i) % 256, (y * 3) % 256,
                             ((x + y) * 5) % 256], -1).astype(np.uint8))
    out["rgb_420_64x64_q92"] = _bench(rgb, quality=92, exact=False)

    # progressive (r10): same quantized coefficients over a 6-scan
    # SOF2 script — the honest multi-scan overhead vs the single-scan
    # baseline on the same images (exactness still asserted: the
    # block-constant q100 contract carries over to progressive)
    out["tiny_query_shape_progressive"] = _bench(tiny, progressive=True)
    out["gray_64x64_progressive"] = _bench(med, progressive=True)

    # per-block marginal cost: fit dec_sec across two sizes
    big = [_image(i, 16, 16) for i in range(25)]
    r_big = _bench(big)
    out["gray_128x128"] = r_big
    m = ((r_big["dec_sec"] / r_big["images"])
         - (out["gray_64x64"]["dec_sec"] / out["gray_64x64"]["images"]))
    blocks_delta = (r_big["blocks"] // r_big["images"]
                    - out["gray_64x64"]["blocks"]
                    // out["gray_64x64"]["images"])
    out["marginal_us_per_block"] = round(m / blocks_delta * 1e6, 1)

    path = os.path.join(REPO, "BENCH_jpeg.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1, sort_keys=True))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
