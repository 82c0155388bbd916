#!/usr/bin/env python
"""Scale an existing testdata dir by an integer factor K (default: sf0.1
→ sf1, K=10) via deterministic key-shifted replication — the sandbox
has no network (DuckDB's tpch extension cannot download), so sf1 is
derived from the driver's own sf0.1 distribution instead.

Construction (copy k = 0..K-1; copy 0 is byte-identical to the input):

- TPC-H-ish tables: every key column shifts by k * (max_key + 1) with
  FK consistency (orders.o_custkey shifts by the CUSTOMER offset, etc.),
  so join fan-outs, group cardinalities and skew all scale linearly and
  no cross-copy joins appear. region/nation stay fixed (real dimensions
  don't grow with fact data).
- events: ids/user_ids shift; timestamps stay — K× traffic in the same
  time range (wider windows, not more of them), the realistic shape.
- documents: doc_id shifts; every WORD in copy k>0 gets a `~k` tag —
  a per-copy bijection on the shingle alphabet, so within-copy
  exact/near-duplicate structure is EXACTLY preserved (pairs scale
  linearly) while cross-copy similarity drops to zero (no artificial
  quadratic pair blow-up). n_chars is recomputed.
- embeddings: vec_id shifts; component 0 gets a k-dependent epsilon so
  no exact cross-copy duplicate vectors exist.

Usage: python tools/make_sf_scale.py [src_dir] [dst_dir] [K] [tables...]
Defaults: /root/testdata/sf0.1  <repo>/testdata_scale/sf1  10  (all)

The optional table list generates a PARTIAL tier (r14: the sf100
shuffle-measurement tier only needs the tables tpch_q5/q21/j3/j9
touch — lineitem orders events customer supplier nation region —
~15 GB instead of ~20). Copies are streamed to the ParquetWriter one
k at a time, so peak memory is one source table + one copy, not the
whole K× output (lineitem sf10→sf100 would otherwise hold ~40 GB of
Arrow).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# key columns per table → which table's offset they shift by
KEY_SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
    "events": {"event_id": "events:event_id", "user_id": "events:user_id"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
PK = {"customer": "c_custkey", "orders": "o_orderkey", "part": "p_partkey",
      "supplier": "s_suppkey", "documents": "doc_id", "embeddings": "vec_id"}
FIXED = ("region", "nation")


def _offsets(src: str) -> dict[str, int]:
    off: dict[str, int] = {}
    for tbl, col in PK.items():
        t = pq.read_table(os.path.join(src, f"{tbl}.parquet"), columns=[col])
        off[tbl] = int(pc.max(t[col]).as_py()) + 1
    ev = pq.read_table(os.path.join(src, "events.parquet"),
                       columns=["event_id", "user_id"])
    off["events:event_id"] = int(pc.max(ev["event_id"]).as_py()) + 1
    off["events:user_id"] = int(pc.max(ev["user_id"]).as_py()) + 1
    return off


def _tag_words(texts: list, k: int) -> list:
    tag = f"~{k}"
    return [None if t is None
            else " ".join(w + tag for w in t.split(" "))
            for t in texts]


def _copy(tbl_name: str, t: pa.Table, k: int, off: dict[str, int]) -> pa.Table:
    if k == 0:
        return t
    cols = {}
    for name in t.column_names:
        col = t[name]
        shift_key = KEY_SHIFTS.get(tbl_name, {}).get(name)
        if shift_key is not None:
            cols[name] = pc.add(col, pa.scalar(k * off[shift_key],
                                               type=col.type))
        else:
            cols[name] = col
    if tbl_name == "documents":
        texts = _tag_words(t["text"].to_pylist(), k)
        cols["text"] = pa.array(texts, type=pa.string())
        cols["n_chars"] = pa.array(
            [None if s is None else len(s) for s in texts], type=pa.int64())
    if tbl_name == "embeddings":
        embs = t["embedding"].to_pylist()
        eps = np.float32(k * 1e-3)
        for e in embs:
            if e:
                e[0] = float(np.float32(e[0]) + eps)
        cols["embedding"] = pa.array(embs, type=t["embedding"].type)
    return pa.table(cols, schema=pa.schema(
        [(n, cols[n].type if isinstance(cols[n], pa.Array)
          else t.schema.field(n).type) for n in t.column_names]))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # default matches bench_scale.py's expectation (and the gitignored
    # testdata_scale/ prefix) — the tools previously disagreed, so the
    # documented default workflow generated into a dir the bench never
    # read (r7 ADVICE)
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "testdata_scale", "sf1")
    k_copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    only = set(sys.argv[4:])
    os.makedirs(dst, exist_ok=True)
    off = _offsets(src)

    for fname in sorted(os.listdir(src)):
        tbl = fname.removesuffix(".parquet")
        if only and tbl not in only:
            continue
        t = pq.read_table(os.path.join(src, fname))
        if tbl in FIXED:
            pq.write_table(t, os.path.join(dst, fname),
                           row_group_size=max(1, t.num_rows))
            print(f"{tbl:12s} {t.num_rows:>9,} -> {t.num_rows:>10,} rows")
            continue
        # stream copies to the writer: peak memory = source + one copy;
        # per-copy row groups (>= 32 per table at K=10) keep Spark's
        # byte-range splits mapping to real parallel work
        rg = max(1, t.num_rows // max(1, 32 // k_copies + 3))
        writer = None
        total = 0
        for k in range(k_copies):
            out = _copy(tbl, t, k, off)
            if writer is None:
                writer = pq.ParquetWriter(os.path.join(dst, fname),
                                          out.schema)
            for start in range(0, out.num_rows, rg):
                writer.write_table(out.slice(start, rg))
            total += out.num_rows
        if writer is not None:
            writer.close()
        print(f"{tbl:12s} {t.num_rows:>9,} -> {total:>10,} rows")


if __name__ == "__main__":
    main()
