"""Declared-query corpus — the SURVEY.md §2 contract.

Every implemented operator is declared here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
an equivalent ANSI-SQL string the DuckDB oracle runs on the same parquet
tables. The driver hash-compares both sides at sf0.01.

Conventions (see FIXTURES.md canonicalization rules):
- every computed column is aliased identically on both sides;
- sums over integer columns are cast to BIGINT in the oracle so types line
  up with Spark's LongType;
- approximate operators (approx_count_distinct, LSH paths) declare no
  oracle → the driver records a rows-only check.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class DeclaredQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ids: tuple[str, ...]   # SURVEY.md §2 rows this query covers
    allow_empty: bool = False     # 0 rows at small SF is by-design


REGISTRY: dict[str, DeclaredQuery] = {}


def declared(name: str, oracle: str | None, survey_ids: tuple[str, ...] = (),
             allow_empty: bool = False):
    """Register a declared query. ``oracle=None`` → rows-only check.
    ``allow_empty=True`` marks queries whose 0-row result at small SF is
    semantically expected; everything else FAILS the local checker on an
    empty result (a 0-row hash match proves nothing — VERDICT r4 j13,
    r5 u4_except)."""
    def deco(fn):
        prev = REGISTRY.get(name)
        # a silent overwrite would shadow a query out of the gate; compare
        # by origin rather than identity so importlib.reload of a query
        # module (new function objects, same definitions) stays legal
        if prev is not None and (prev.fn.__module__, prev.fn.__qualname__) \
                != (fn.__module__, fn.__qualname__):
            raise ValueError(f"duplicate declared query name {name!r}")
        REGISTRY[name] = DeclaredQuery(name, fn, oracle, survey_ids,
                                       allow_empty)
        return fn
    return deco


def load_all() -> dict[str, DeclaredQuery]:
    """Import every query module (side effect: fills REGISTRY)."""
    from . import (  # noqa: F401
        sources,
        projections,
        joins,
        aggregations,
        windows,
        sorts,
        setops,
        scalar_funcs,
        streaming_batch,
        tpch,
        tpch_full,
        llm_dedup,
        llm_export,
        llm_pipeline,
        llm_similarity,
        llm_text,
        ml_queries,
        multimodal,
    )
    return REGISTRY


# explicit raw-int64 ts schema — parquet hands back the physical stored
# integer for any timestamp unit, letting the reader convert exactly
_EVENTS_RAW_SCHEMA = ("event_id long, ts long, user_id long, "
                      "event_type string, value double, props string")


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """events.parquet has stored ``ts`` as TIMESTAMP(NANOS) in some data
    generations (which Spark's parquet reader rejects outright) and plain
    TIMESTAMP(MICROS) in others. Sniff the physical unit from the parquet
    footer (driver-side, one footer read) and branch: micros reads
    natively; nanos reads as raw int64 via an explicit schema and converts
    to a microsecond timestamp JVM-side. Never assume the unit — the
    wrong divisor silently lands every event in 1970."""
    from pyspark.sql import functions as F

    units: set[str | None] = set()
    try:
        import glob

        import pyarrow.parquet as pq
        files = sorted(glob.glob(os.path.join(path, "*.parquet"))) \
            if os.path.isdir(path) else [path]
        # sniff EVERY footer (cheap, driver-side): a mixed-unit dataset
        # read with one unit would silently corrupt the other parts
        for f in files:
            t = pq.read_schema(f).field("ts").type
            units.add(getattr(t, "unit", None))
    except Exception:
        units = set()
    if len(units) > 1:
        raise ValueError(
            f"events parquet at {path} has mixed ts units {units}; "
            "refusing to guess — regenerate the dataset with one unit")
    unit = next(iter(units)) if units else None
    if unit is None:
        # sniff failure: native read is the safe default — it raises
        # loudly on nanos instead of silently dividing, and a cast
        # normalizes Spark 4's inferred TIMESTAMP_NTZ (which forbids the
        # numeric casts downstream consumers rely on)
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    # Known unit → read the PHYSICAL int64 and convert with
    # timestamp_micros: preserves the stored instant independent of the
    # session/JVM timezone (an NTZ→TIMESTAMP cast would reinterpret
    # wall-clock in the session zone — off-UTC hosts shift vs the
    # DuckDB oracle's raw read). Integer `div`, not `/`: double division
    # of int64 nanos loses ~200ns, enough to flip a truncated micro.
    raw = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(path)
    divisor = {"ns": 1000, "us": 1, "ms": None, "s": None}[unit]
    if divisor is None:
        factor = 1000 if unit == "ms" else 1_000_000
        return raw.withColumn("ts", F.timestamp_micros(F.col("ts") * factor))
    return raw.withColumn(
        "ts", F.timestamp_micros(F.expr(f"ts div {divisor}")))


def _path_fingerprint(path: str) -> tuple:
    """(name, size, mtime_ns) identity of one parquet table — a plain
    file, or a directory layout (``events.parquet/part-*.parquet``,
    which :func:`_read_events` supports) fingerprinted by its INNER
    files: a part file overwritten in place keeps the directory's own
    stat unchanged, so the directory entry alone would lie (r10
    review #3).

    Known residual (r10 advice #4): on filesystems with coarse mtime
    granularity, a same-size in-place rewrite landing within one
    timestamp tick is indistinguishable — session_memo/_TABLE_CACHE
    would serve the stale result. Acceptable here because tier
    regeneration (parquet write of ≥thousands of rows) takes well
    over any real filesystem's tick; if sub-second rewrite tooling
    ever appears, add a content sentinel (parquet footer length or a
    generation file) to this tuple."""
    import os

    try:
        if os.path.isdir(path):
            with os.scandir(path) as it:
                return tuple(sorted(
                    (e.name, e.stat().st_size, e.stat().st_mtime_ns)
                    for e in it if e.is_file()))
        st = os.stat(path)
        return ((os.path.basename(path), st.st_size, st.st_mtime_ns),)
    except OSError:
        return ()


def _sf_dir_fingerprint(sf_dir: str) -> tuple:
    """Concatenated :func:`_path_fingerprint` of every parquet table
    under ``sf_dir`` — the data-identity component of
    :func:`session_memo` keys. Every session-scoped cache here stores
    results derived from the tables in ``sf_dir`` (collected models,
    centroid rows, query matrices — or persisted/checkpointed frames,
    see the eviction note in session_memo); a path alone identifies
    the plan, not the data, and a tier regenerated in place
    mid-session must miss (the same rule as
    ops.dedup._HOT_SHINGLE_CACHE, r10 review). One scandir of ≤10
    entries per lookup — driver-side noise."""
    import os

    try:
        with os.scandir(sf_dir) as it:
            names = sorted(e.name for e in it
                           if e.name.endswith(".parquet"))
    except OSError:
        return ()
    return tuple((n, _path_fingerprint(os.path.join(sf_dir, n)))
                 for n in names)


def session_memo(store: dict, spark: SparkSession, sf_dir: str, compute):
    """Get-or-compute memoization keyed by (applicationId, sf_dir,
    data fingerprint) — the shared pattern for fixed artifacts of a
    query definition (trained models, collected query matrices,
    quantizers, persisted shingle frames): repeated invocations in one
    session (bench loops, oracle sweeps, the plan-contract corpus
    sweep) must not re-pay their Spark jobs. Keyed by applicationId so
    a restarted SparkContext never sees a stale artifact, and by
    :func:`_sf_dir_fingerprint` so a tier rewritten at the same path
    never serves stale results. A superseded entry (same app +
    sf_dir, older fingerprint) is EVICTED when the new one is
    computed — some stores hold .persist()ed / localCheckpoint'd
    DataFrames (llm_dedup), and without eviction every in-place
    rewrite would pin another copy's executor storage for the session
    (the scale_session docstring's memo-thrash failure mode). ``None``
    is a cachable result (oversized-split sentinels), hence the
    explicit `in` check."""
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, _sf_dir_fingerprint(sf_dir))
    if key not in store:
        for old in [k for k in store if k[:2] == (app_id, sf_dir)]:
            try:
                unpersist = getattr(store[old], "unpersist", None)
                if callable(unpersist):
                    unpersist(False)
            except Exception:
                pass
            del store[old]
        store[key] = compute()
    return store[key]


# (appId, sf_dir, table, path fingerprint) -> DataFrame. A DataFrame is
# an immutable logical plan, so reuse across queries is safe; what it
# saves is the per-read driver-side work (file listing + parquet
# footer/schema resolution) that otherwise repeats for every query in a
# bench/gate run. Keyed by applicationId so a restarted SparkContext
# never sees stale plans, and by the path fingerprint so a table
# rewritten in place re-resolves its file index — without it the
# fingerprinted session_memo layer above would miss correctly but then
# recompute from THIS cache's stale listing (r10 review)."""
_TABLE_CACHE: dict[tuple, DataFrame] = {}


ALL_TABLES = ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings")


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = ALL_TABLES) -> None:
    """Register the test tables as temp views so raw ``spark.sql(...)``
    works as a first-class entry point (events gets the nanos-safe
    reader) — the SQL face of the same engine; every declared query is
    equally expressible this way."""
    for n in names:
        tables(spark, sf_dir, n)[0].createOrReplaceTempView(n)


def tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load driver test tables as DataFrames (plan-cached per session)."""
    app_id = spark.sparkContext.applicationId
    out = []
    for n in names:
        path = f"{sf_dir}/{n}.parquet"
        key = (app_id, sf_dir, n, _path_fingerprint(path))
        df = _TABLE_CACHE.get(key)
        if df is None:
            for old in [k for k in _TABLE_CACHE
                        if k[0] == app_id and k[1] == sf_dir and k[2] == n]:
                del _TABLE_CACHE[old]
            df = (_read_events(spark, path) if n == "events"
                  else spark.read.parquet(path))
            _TABLE_CACHE[key] = df
        out.append(df)
    return out


def one_sql(spark: SparkSession, sf_dir: str, names: "tuple[str, ...]",
            sql: str) -> DataFrame:
    """Build a query as ONE ``spark.sql`` call over just-registered temp
    views (r15 plan-build trim): a Column-DSL assembly of a multi-join
    query costs hundreds of py4j round trips (~0.1-0.2 s per build,
    bench `queries_plan_build`), while this path pays one
    ``createOrReplaceTempView`` per table plus one ``sql`` call —
    identical Catalyst plans, same session semantics (the SQL is parsed
    by the SAME session that the DSL would use, ANSI and timezone
    included). Views are (re-)registered on every build so a caller
    switching ``sf_dir`` mid-session can never read stale data; the
    returned DataFrame is analyzed eagerly, so later re-registration
    does not rebind it. SINGLE-THREADED-BUILD assumption (r15 advice):
    the views carry bare table names in the session catalog, so this
    clobbers any same-named user temp view, and two concurrent builds
    in one session with different ``sf_dir`` could race between the
    registration loop and ``spark.sql`` — eager analysis only protects
    sequential callers (every in-repo caller builds sequentially)."""
    for n, df in zip(names, tables(spark, sf_dir, *names)):
        df.createOrReplaceTempView(n)
    return spark.sql(sql)


def head_rows_fast(sf_dir: str, table: str, *, key_col: str, bound: int,
                   cols: "tuple[str, ...]") -> "list[tuple] | None":
    """Driver-side footer-pruned read of a broadcast-small key range —
    the fast path behind the collected query/test-split memos (r15,
    bench plan-build): the equivalent Spark collect schedules a real
    job (scan + filter + collect, ~0.3-0.4 s of per-session fixed cost
    on a busy box) for a few hundred rows that parquet row-group
    statistics prune to one footer read. Values are identical — both
    paths surface the file's float32 embeddings as Python floats.
    Returns None when the table layout isn't a plain parquet file/dir
    (callers fall back to the Spark collect)."""
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow is baked in
        return None
    p = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isfile(p):
            paths = [p]
        elif os.path.isdir(p):
            paths = sorted(os.path.join(p, f) for f in os.listdir(p)
                           if f.endswith(".parquet"))
        else:
            return None
        parts = [pq.read_table(f, columns=list(cols),
                               filters=[(key_col, "<", bound)])
                 for f in paths]
        t = pa.concat_tables(parts)
    except Exception:
        return None
    return list(zip(*[t.column(c).to_pylist() for c in cols])) \
        if t.num_rows else []
