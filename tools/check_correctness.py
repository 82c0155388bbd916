#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every declared
query via Spark AND its oracle via DuckDB on the same parquet tables,
canonicalize (FIXTURES.md rules), and diff.

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_value(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


# The driver's value hash runs over PANDAS frames, so it is sensitive to
# the type FAMILY a column lands in after conversion: DuckDB HUGEINT (an
# uncast integer SUM) and DECIMAL both surface as float64 in .df() while
# Spark LongType stays int64 — `3` vs `3.0` hash-mismatches even though
# canon_value collapses them (CORRECTNESS_r04: tpch_q12 /
# t5_session_window). Width within a family (int32 vs int64, us vs ns)
# does not change hashed values; DATE and TIMESTAMP both render as
# datetime64. Nullability degrades int→float64 SYMMETRICALLY on both
# engines (verified), so a schema-side mapping is exact and free.

def _spark_family(dt) -> str:
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s.startswith("decimal"):
        return "decimal"  # Spark toPandas keeps Decimal objects
    if s in ("date", "timestamp", "timestamp_ntz"):
        return "datetime"
    if s == "boolean":
        return "bool"
    if s == "string":
        return "str"
    if s == "binary":
        return "bytes"
    return s


def _duck_family(t) -> str:
    s = str(t).upper()
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s in ("HUGEINT", "UHUGEINT", "DOUBLE", "FLOAT") \
            or s.startswith("DECIMAL"):
        return "float"  # all land in float64 via .df()
    if s.startswith(("DATE", "TIMESTAMP")):
        return "datetime"
    if s == "BOOLEAN":
        return "bool"
    if s == "VARCHAR":
        return "str"
    if s == "BLOB":
        return "bytes"
    return s.lower()


def type_mismatches(sdf, rel):
    """[(col, spark_family, duck_family)] for driver-visible type diffs."""
    duck = dict(zip(rel.columns, rel.types))
    bad = []
    for f in sdf.schema.fields:
        if f.name not in duck:
            continue
        fs, fd = _spark_family(f.dataType), _duck_family(duck[f.name])
        if fs != fd:
            bad.append((f.name, fs, fd))
    return bad


def canon_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(canon_value(row[i]) for i in order))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [columns[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pravega_flink_ai_flow_spark.queries import load_all

    if os.environ.get("VANILLA"):
        # replicate the DRIVER'S session exactly: vanilla builder, no
        # engine configs — ANSI stays ON (Spark 4 default), timezone is
        # the JVM default. Queries must be correct here, not just under
        # the engine session's lenient settings.
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[32]")
                 .appName("correctness-check-vanilla").getOrCreate())
    else:
        from pravega_flink_ai_flow_spark.engine.session import get_spark
        spark = get_spark("correctness-check")
    registry = load_all()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    failures = []
    results = {}
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            results[name] = {"status": "FAIL", "err": f"spark: {type(e).__name__}"}
            continue
        # The driver's pandas-based canonicalizer crashes on array/map/
        # struct-typed cells ("unhashable type: 'list'"), and that crash
        # voids even a rows-only check (CORRECTNESS_r01). Mirror it: any
        # complex-typed output column is a hard FAIL here too.
        from pyspark.sql.types import ArrayType, MapType, StructType
        complex_cols = [f.name for f in sdf.schema.fields
                        if isinstance(f.dataType, (ArrayType, MapType, StructType))]
        if complex_cols:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: complex-typed output column(s) {complex_cols} "
                  "would crash the driver's canonicalizer — serialize to "
                  "string (to_json / array_join) or explode")
            results[name] = {"status": "FAIL", "err": "complex-typed output"}
            continue
        # A 0-row result makes any hash comparison vacuous (both engines
        # agree on "empty" no matter how wrong the query is) — fail unless
        # the query declared allow_empty (VERDICT r4 j13, r5 u4_except).
        # The GATE runs at sf0.01; at the fast-iteration sf0.001 a few
        # legitimately selective TPC-H filters (q7/q20/q21/q22) go empty,
        # so downgrade to a warning there.
        if not s_rows and not q.allow_empty:
            if "sf0.001" in sf_dir:
                print(f"warn  {name}: 0 rows at sf0.001 (vacuous here; "
                      "verify non-empty at sf0.01, the gate SF)")
            else:
                n_fail += 1
                failures.append(name)
                print(f"FAIL  {name}: 0 rows — vacuous hash; pick inputs "
                      "with real rows or declare allow_empty=True")
                results[name] = {"status": "FAIL", "err": "0 rows"}
                continue
        if q.oracle is None:
            n_rows_only += 1
            print(f"rows  {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            results[name] = {"status": "rows-only", "rows": len(s_rows),
                             "sec": round(time.time() - t0, 1)}
            continue
        try:
            rel = con.sql(q.oracle)
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            results[name] = {"status": "FAIL", "err": f"duckdb: {type(e).__name__}"}
            continue
        if sorted(s_cols) != sorted(d_cols):
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
            results[name] = {"status": "FAIL", "err": "columns differ"}
            continue
        bad_types = type_mismatches(sdf, rel)
        if bad_types:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: driver-visible TYPE mismatch "
                  + "; ".join(f"{c}: spark={a} duck={b}" for c, a, b in bad_types)
                  + "  (uncast integer SUM? cast the oracle to BIGINT)")
            results[name] = {"status": "FAIL", "err": "type mismatch"}
            continue
        _, cs = canon_rows(s_cols, s_rows)
        _, cd = canon_rows(d_cols, d_rows)
        if len(cs) != len(cd):
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: row count spark={len(cs)} duck={len(cd)}")
            results[name] = {"status": "FAIL", "err": "row count"}
            continue
        if cs != cd:
            n_fail += 1
            failures.append(name)
            bad = next(i for i, (a, b) in enumerate(zip(cs, cd)) if a != b)
            print(f"FAIL  {name}: values differ at canon row {bad}:")
            print(f"      spark: {cs[bad]}")
            print(f"      duck : {cd[bad]}")
            results[name] = {"status": "FAIL", "err": "values differ"}
        else:
            n_pass += 1
            print(f"ok    {name}: {len(cs)} rows ({time.time()-t0:.1f}s)")
            results[name] = {"status": "ok", "rows": len(cs),
                             "sec": round(time.time() - t0, 1)}

    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAILED"
          + (f": {failures}" if failures else ""))
    # CHECK_JSON=<path>: commit-able sweep artifact (r8 advice #3 — the
    # driver window only records 50 queries/round; this records ALL)
    out_json = os.environ.get("CHECK_JSON")
    if out_json:
        import json
        with open(out_json, "w") as f:
            json.dump({"sf_dir": sf_dir,
                       "session": "vanilla" if os.environ.get("VANILLA")
                                  else "engine",
                       "n_ok": n_pass, "n_rows_only": n_rows_only,
                       "n_fail": n_fail, "queries": results}, f,
                      indent=1, sort_keys=True)
        print(f"wrote {out_json}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
