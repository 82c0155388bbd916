"""Relational operators Spark lacks as single calls (SURVEY.md J9, O3,
T3-T5 batch equivalents), composed from DataFrame primitives so Catalyst
still optimizes them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k_per_group(df: DataFrame, partition_by: Sequence[str],
                    order_by: Sequence[Column], k: int,
                    rank_col: str = "rn") -> DataFrame:
    """Top-k per group (SURVEY.md O3) via row_number — Spark plans a
    WindowGroupLimit pushdown so each partition keeps only k rows before
    the final sort, which is what survives a 100× scale-up."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (df.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= k))


def salted_join(left: DataFrame, right: DataFrame, *,
                left_on: str, right_on: str, how: str = "inner",
                salt: int = 8, salt_source: str | None = None,
                hot_threshold: int | None = None,
                hot_rel_threshold: float | None = None,
                detect_sample: float | None = None,
                key_stats: DataFrame | None = None,
                max_hot_keys: int = 1024) -> DataFrame:
    """Equi-join with explicit key salting for skewed keys: the left
    (large, skewed) side gets a deterministic salt in [0, salt) derived
    from ``salt_source`` (any well-distributed left column; defaults to
    the whole row hash), the right side is replicated ``salt`` times, and
    the join runs on (key, salt) — splitting each hot key's rows across
    ``salt`` reducers instead of one straggler.

    Result is row-identical to the unsalted join (replication only
    multiplies the *matching opportunity*, each left row still matches
    its right rows exactly once). AQE's skew-join splitting does this
    adaptively; the explicit form is for engines/paths where AQE can't
    see the skew (e.g. streaming state, pre-partitioned writes).

    ``hot_threshold`` (r13 — the measured fix for the r12 sf10 tail):
    blanket salting replicates the ENTIRE dim side ``salt``× whether or
    not a key is hot, and that replication was 7.2× of the whole join's
    sf10 wall on uniform keys (9.88 s salted vs 1.38 s plain —
    tools/explain_r13_tails.py; events.user_id max/avg = 99/67, zero
    hot keys). With ``hot_threshold`` set, one map-combined count
    aggregate finds the left keys with more rows than the threshold and
    ONLY those keys get the salt treatment — each right row explodes to
    ``salt`` copies when hot, 1 copy otherwise, and left rows salt to 0
    unless hot. Uniform data degenerates to the plain join (empty hot
    set short-circuits before touching the plan); a genuinely hot key
    still fans across ``salt`` reducers (pytest-pinned on synthetic
    skew). The detection aggregate runs once at plan-construction time
    (driver collect guarded by ``max_hot_keys``: more hot keys than
    that → fall back to blanket salting, the distributed path, rather
    than grow the literal set) — the dispatch-signal pattern the dedup
    family already uses. At 100 TB the threshold is what you want
    anyway: a key is only worth salting when its row count would
    straggle one reducer.

    Detection is COST-BOUNDED and can be SCALE-RELATIVE (r14, from the
    r13 verdict's two scale-honesty notes):

    * The detection pass reads only the column-pruned KEY projection of
      ``left`` (never the full fact rows) with a map-side-combined
      count — measured at the sf10 tier it costs 0.72 s against the
      join's own 1.1 s wall (tools/explain_r13_tails.py detection),
      i.e. bounded under one narrow column scan, not a second full
      read. We MEASURED row-level Bernoulli sampling as the further
      remedy and it does NOT pay on parquet: ``sample(0.1)`` still
      decodes every key page and the per-row rand() costs what the
      smaller hash-aggregate saves (0.765 s sampled vs 0.719 s full at
      sf10) — so the default is the exact full pass and
      ``detect_sample`` stays available for CPU-bound inputs (wide
      string keys, row formats) where decode isn't the floor. Hotness
      only needs order-of-magnitude precision, so sampling is safe
      where it does pay: salting is row-identical by construction —
      a misclassified borderline key changes the plan, never the
      RESULT. Sampled absolute thresholds are noise-floored (the
      fraction is raised so the sampled threshold is ≥50 expected
      rows). Callers who already maintain key statistics — a table
      format's column stats, a prior round's counts — pass them via
      ``key_stats`` (first column = key, second = true row count) and
      skip the scan entirely: THAT is the 100 TB path, where any
      detection scan is a TB-scale read.
    * ``hot_rel_threshold`` expresses the threshold as a MULTIPLE OF
      THE MEAN rows-per-key measured by the same detection pass
      (mutually exclusive with the absolute ``hot_threshold``). An
      absolute count is scale-dishonest on data where rows-per-key
      grows with volume: every key eventually crosses it, the
      >``max_hot_keys`` branch silently reverts to blanket salting,
      and the measured 7.2× replication constant returns. "Hot" is
      relative by nature — a key only straggles a reducer when it
      holds a disproportionate share — so k×mean stays meaningful at
      every scale. (Sampling note: keys with zero sampled rows drop
      out of the mean, biasing it slightly upward at tiny fractions —
      on the safe, fewer-false-hots side.)

    Only inner/left shapes are valid: an unmatched right row would
    surface ``salt`` times under right/full outer."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"):
        raise ValueError(f"salted_join cannot preserve '{how}' semantics: "
                         "the replicated right side would emit unmatched "
                         "right rows once per salt")
    src = (F.xxhash64(*[F.col(c) for c in left.columns])
           if salt_source is None else F.xxhash64(F.col(salt_source)))
    if hot_threshold is not None and hot_rel_threshold is not None:
        raise ValueError("pass hot_threshold OR hot_rel_threshold, not both")
    if detect_sample is not None and not (0.0 < detect_sample <= 1.0):
        # f<=0 would make every sampled key "hot" (thr=0 → blanket-salt
        # fallback, the r9 regression mode); f>1 is an opaque Spark error
        raise ValueError(
            f"detect_sample must be in (0, 1], got {detect_sample}")
    if key_stats is not None and hot_threshold is None \
            and hot_rel_threshold is None:
        raise ValueError("key_stats needs a hot_threshold or "
                         "hot_rel_threshold to classify against")
    if hot_threshold is not None or hot_rel_threshold is not None:
        if key_stats is not None:
            kc, cc = key_stats.columns[:2]
            counts = key_stats.select(F.col(kc).alias("__k"),
                                      F.col(cc).alias("count"))
            f = 1.0
        else:
            f = detect_sample if detect_sample is not None else 1.0
            if hot_threshold is not None and f < 1.0:
                # noise floor: sampled threshold ≥ 50 expected rows so
                # Binomial noise at the boundary stays ~14% relative
                f = min(1.0, max(f, 50.0 / max(hot_threshold, 1)))
            keys = left.select(F.col(left_on).alias("__k"))
            if f < 1.0:
                keys = keys.sample(fraction=f, seed=42)
            counts = keys.groupBy("__k").count()
        if hot_rel_threshold is not None:
            mean = counts.agg(F.avg("count")).first()[0]
            thr = (mean or 0.0) * hot_rel_threshold
        else:
            thr = hot_threshold * f
        hot_rows = (counts.filter(F.col("count") > thr)
                    .limit(max_hot_keys + 1).collect())
        if len(hot_rows) <= max_hot_keys:
            hot = [r[0] for r in hot_rows]
            if not hot:
                return left.join(right, left[left_on] == right[right_on],
                                 how)
            l = left.withColumn(
                "__salt",
                F.when(F.col(left_on).isin(hot),
                       F.pmod(src, F.lit(salt))).otherwise(F.lit(0))
                .cast("int"))
            r = right.withColumn(
                "__salt",
                F.explode(F.when(
                    F.col(right_on).isin(hot),
                    F.array(*[F.lit(i) for i in range(salt)]))
                    .otherwise(F.array(F.lit(0)))))
            out = l.join(r, (l[left_on] == r[right_on])
                         & (l["__salt"] == r["__salt"]), how)
            return out.drop("__salt")
        # more hot keys than the literal-set budget: blanket salting is
        # the honest distributed fallback (falls through)
    l = left.withColumn("__salt", F.pmod(src, F.lit(salt)).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = l.join(r, (l[left_on] == r[right_on]) & (l["__salt"] == r["__salt"]),
                 how)
    return out.drop("__salt")


def asof_merge(left: DataFrame, right: DataFrame, *,
               left_on: str, right_on: str,
               left_time: str, right_time: str,
               tie_breakers: Sequence[str] = (),
               carry_cols: Sequence[str] | None = None) -> DataFrame:
    """Backward as-of join via the sort-merge formulation: union both
    sides tagged, sort per key by (time, side, tie_breakers) and carry the
    last-seen right row forward with ``last(..., ignorenulls)``.

    Cost is ONE shuffle of |L|+|R| rows (vs the join+reduce strategy,
    whose joined fan-out is |L| × avg-right-rows-per-key) — the right
    strategy when right is dense per key. Inner semantics: left rows with
    no right row at-or-before their time are dropped.

    Right rows sort *before* left rows at equal timestamps (`<=` is
    inclusive); ties among right rows resolve to the max ``tie_breakers``
    because ascending sort + last-wins.

    ``carry_cols`` (r15, guide §2.3 "project before the exchange"):
    the right columns to carry through — and return. Catalyst cannot
    prune fields INSIDE the ``last(struct)`` carry, so by default the
    shuffle and the window buffer haul every right column, join key and
    match time included, even when the caller consumes two of them.
    Pass the consumed subset to shrink the carried struct; the output
    then has lcols + carry_cols. Default (None) keeps the full-rcols
    contract.
    """
    lcols = list(left.columns)
    rcols = list(carry_cols) if carry_cols is not None \
        else list(right.columns)
    missing = [c for c in rcols if c not in right.columns]
    if missing:
        raise ValueError(f"carry_cols not in right frame: {missing}")
    if not rcols:
        # struct() of nothing produces `struct<>` DDL that fails at
        # parse with an opaque error (r15 advice) — reject it here
        raise ValueError("carry_cols must name at least one right column")
    # Plan assembly is selectExpr-based (r14): the Column-DSL form of
    # these wide projections cost ~900 py4j round trips per call —
    # j9's whole 0.19 s plan-build in BENCH_r13 — while selectExpr
    # ships each projection as ONE JVM call and parses identical
    # expression nodes. Null-struct cast targets come from the input
    # schemas python-side (no extra analysis pass), as explicitly
    # quoted struct DDL. simpleString() is NOT that DDL: it leaves
    # field names bare, so a name containing ',', ':' or '<>' would
    # parse as type syntax (r14 advice). Names the DDL parser cannot
    # round-trip even quoted (embedded newlines — the lexer treats a
    # quoted identifier as single-line) take the Column-DSL fallback
    # below: same plan, more py4j chatter, any name.
    from pyspark.sql.types import StructType

    def q(c: str) -> str:
        return "`" + c.replace("`", "``") + "`"

    def struct_ddl(schema, cols: Sequence[str]) -> str:
        return ("struct<" + ",".join(
            f"{q(c)}:{schema[c].dataType.simpleString()}" for c in cols)
            + ">")

    if any("\n" in c or "\r" in c for c in lcols + rcols):
        return _asof_merge_dsl(left, right, left_on=left_on,
                               right_on=right_on, left_time=left_time,
                               right_time=right_time,
                               tie_breakers=tie_breakers,
                               carry_cols=rcols)
    l_ddl = struct_ddl(left.schema, lcols)
    r_ddl = struct_ddl(right.schema, rcols)
    l = left.selectExpr(
        f"{q(left_on)} AS __k",
        f"CAST({q(left_time)} AS timestamp) AS __t",
        "1 AS __is_left",
        "struct(" + ", ".join(q(c) for c in lcols) + ") AS __l",
        f"CAST(NULL AS {r_ddl}) AS __r",
        *[f"CAST(NULL AS {right.schema[c].dataType.simpleString()}) "
          f"AS {q('__tb_' + c)}" for c in tie_breakers],
    )
    r = right.selectExpr(
        f"{q(right_on)} AS __k",
        f"CAST({q(right_time)} AS timestamp) AS __t",
        "0 AS __is_left",
        f"CAST(NULL AS {l_ddl}) AS __l",
        "struct(" + ", ".join(q(c) for c in rcols) + ") AS __r",
        *[f"{q(c)} AS {q('__tb_' + c)}" for c in tie_breakers],
    )
    order = ", ".join(["__t ASC", "__is_left ASC",
                       *[f"{q('__tb_' + c)} ASC" for c in tie_breakers]])
    merged = (l.unionByName(r)
              .selectExpr("*",
                          f"last(__r, true) OVER (PARTITION BY __k "
                          f"ORDER BY {order} ROWS BETWEEN UNBOUNDED "
                          f"PRECEDING AND CURRENT ROW) AS __carry")
              .filter("__is_left = 1 AND __carry IS NOT NULL"))
    return merged.selectExpr(*[f"__l.{q(c)} AS {q(c)}" for c in lcols],
                             *[f"__carry.{q(c)} AS {q(c)}" for c in rcols])


def _asof_merge_dsl(left: DataFrame, right: DataFrame, *,
                    left_on: str, right_on: str,
                    left_time: str, right_time: str,
                    tie_breakers: Sequence[str] = (),
                    carry_cols: Sequence[str] | None = None) -> DataFrame:
    """Column-DSL twin of :func:`asof_merge` for column names the SQL
    DDL/identifier lexer cannot express (embedded newlines). Identical
    plan nodes, built object-side — only plan-BUILD cost differs, so
    the fast path stays the default."""
    from pyspark.sql.types import StructType

    def qc(c: str) -> Column:
        # F.col() PARSES its argument as a (possibly multi-part)
        # attribute name — dots split, stray backticks error — so every
        # dynamic name must go in pre-quoted; parseAttributeName (unlike
        # the SQL lexer) accepts any character inside a quoted part,
        # newlines included
        return F.col("`" + c.replace("`", "``") + "`")

    lcols = list(left.columns)
    rcols = list(carry_cols) if carry_cols is not None \
        else list(right.columns)
    l_t = StructType([left.schema[c] for c in lcols])
    r_t = StructType([right.schema[c] for c in rcols])
    l = left.select(
        qc(left_on).alias("__k"),
        qc(left_time).cast("timestamp").alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[qc(c) for c in lcols]).alias("__l"),
        F.lit(None).cast(r_t).alias("__r"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__tb_{c}")
          for c in tie_breakers])
    r = right.select(
        qc(right_on).alias("__k"),
        qc(right_time).cast("timestamp").alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_t).alias("__l"),
        F.struct(*[qc(c) for c in rcols]).alias("__r"),
        *[qc(c).alias(f"__tb_{c}") for c in tie_breakers])
    w = (Window.partitionBy("__k")
         .orderBy(F.col("__t").asc(), F.col("__is_left").asc(),
                  *[qc(f"__tb_{c}").asc() for c in tie_breakers])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = (l.unionByName(r)
              .withColumn("__carry", F.last("__r", ignorenulls=True).over(w))
              .filter((F.col("__is_left") == 1)
                      & F.col("__carry").isNotNull()))
    return merged.select(*[F.col("__l").getField(c).alias(c) for c in lcols],
                         *[F.col("__carry").getField(c).alias(c)
                           for c in rcols])


def asof_join(left: DataFrame, right: DataFrame, *,
              left_on: str, right_on: str,
              left_time: str, right_time: str,
              left_id: str | Sequence[str] | None = None,
              tie_breakers: Sequence[str] = (),
              direction: str = "backward",
              tolerance_seconds: float | None = None) -> DataFrame:
    """As-of join (SURVEY.md J9): for each left row, the single right row
    with the latest ``right_time`` ≤ ``left_time`` (direction='backward')
    or earliest ≥ (direction='forward') within the same key.
    ``tolerance_seconds`` (pandas ``merge_asof(tolerance=...)`` parity)
    additionally bounds the match to |left_time − right_time| ≤
    tolerance — and doubles as a join-planning win: the band predicate
    caps the per-key fan-out the aggregate must reduce.

    Plan shape: equi-join on the key (shuffle both sides on the key — the
    scalable part), inequality filter on time, then per-left-row top-1 via
    ``max_by(struct(right_cols), struct(time, tie_breakers))`` — a hash
    aggregate with map-side partial combine, so the 1-row-per-left-row
    reduction happens *before* the shuffle of the joined fan-out.
    See :func:`asof_merge` for the |L|+|R| sort-merge strategy, which wins
    when right is dense per key.

    ``left_id``: column(s) uniquely identifying a left row (defaults to
    all left columns). ``tie_breakers``: right column names appended to
    the ordering struct for determinism.
    """
    lt, rt = F.col(left_time), F.col(right_time)
    cond = (F.col(left_on) == F.col(right_on)) & (
        (rt <= lt) if direction == "backward" else (rt >= lt))
    if tolerance_seconds is not None:
        # integer-micros band, not double-seconds: exact at boundaries
        gap = F.abs(F.unix_micros(lt) - F.unix_micros(rt))
        cond = cond & (gap <= int(tolerance_seconds * 1_000_000))
    joined = left.join(right, cond)

    if left_id is None:
        id_cols = list(left.columns)
    elif isinstance(left_id, str):
        id_cols = [left_id]
    else:
        id_cols = list(left_id)
    carry = [c for c in left.columns if c not in id_cols]
    right_cols = list(right.columns)

    order_key = F.struct(rt, *[F.col(c) for c in tie_breakers])
    if direction == "forward":
        # min_by == max_by on the negated ordering; use min_by directly
        pick = F.min_by(F.struct(*[F.col(c) for c in right_cols]), order_key)
    else:
        pick = F.max_by(F.struct(*[F.col(c) for c in right_cols]), order_key)

    agg = (joined.groupBy(*[left[c] for c in id_cols])
           .agg(*[F.first(left[c]).alias(c) for c in carry],
                pick.alias("__asof_pick")))
    return agg.select(*id_cols, *carry,
                      *[F.col(f"__asof_pick.{c}").alias(c) for c in right_cols])


def session_windows(df: DataFrame, *, key: str, ts: str,
                    gap_seconds: int) -> DataFrame:
    """Batch session windows (SURVEY.md T5 batch equivalent): a new
    session starts when the gap to the previous event for the same key
    exceeds ``gap_seconds``. lag → boundary flag → running sum = session
    id. One shuffle (partitionBy key), state is a running counter."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    prev_ts = F.lag(F.col(ts)).over(w)
    new_session = F.when(
        prev_ts.isNull() |
        (F.col(ts).cast("double") - prev_ts.cast("double") > gap_seconds),
        F.lit(1)).otherwise(F.lit(0))
    return (df.withColumn("__new_session", new_session)
            .withColumn("session_id",
                        F.sum("__new_session").over(
                            w.rowsBetween(Window.unboundedPreceding, 0)))
            .drop("__new_session"))


def resample_ffill(df: DataFrame, *, key: str, ts: str, value: str,
                   step_seconds: int) -> DataFrame:
    """Time-series resampling with gap fill (the hypertable/time-bucket
    rollup every metrics pipeline needs): bucket events onto a fixed
    grid per key, aggregate within each bucket (max — deterministic and
    accumulation-order-free, unlike sum/avg), then fill empty buckets by
    carrying the previous bucket's value forward.

    Plan shape at 100 TB: one groupBy (key, bucket) with map-side
    partial aggregation; the per-key grid comes from a per-key min/max +
    ``sequence``/``explode`` — no driver collect, no global grid
    materialization; the forward fill is one window per key
    (``last(ignorenulls)``). Output rows = keys × their own bucket
    span, never the cross product of all keys × all time.

    Bucketing uses INTEGER division of epoch micros — a double division
    rounds epsilon-below-integer at exact bucket boundaries and floors
    into the wrong bucket."""
    step_us = step_seconds * 1_000_000
    bucket = F.expr(f"unix_micros({ts}) div {step_us}")
    per = (df.groupBy(F.col(key), bucket.alias("bucket"))
           .agg(F.max(value).alias("__v")))
    rng = per.groupBy(key).agg(F.min("bucket").alias("__b0"),
                               F.max("bucket").alias("__b1"))
    grid = rng.select(key, F.explode(F.sequence("__b0", "__b1")).alias("bucket"))
    w = (Window.partitionBy(key).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(per, [key, "bucket"], "left")
            .select(key, "bucket",
                    F.last("__v", ignorenulls=True).over(w).alias("value_filled"),
                    F.col("__v").isNull().alias("was_gap")))


def resample_interpolate(df: DataFrame, *, key: str, ts: str, value: str,
                         step_seconds: int) -> DataFrame:
    """Time-series resampling with LINEAR interpolation across gaps
    (:func:`resample_ffill`'s smooth sibling): same per-key grid, but an
    empty bucket takes prev + (next − prev) · elapsed-fraction between
    its known neighbors; leading/trailing gaps fall back to the single
    available neighbor. Two windows per key (forward-carry and
    backward-carry, both ignorenulls) — still one shuffle."""
    step_us = step_seconds * 1_000_000
    bucket = F.expr(f"unix_micros({ts}) div {step_us}")
    per = (df.groupBy(F.col(key), bucket.alias("bucket"))
           .agg(F.max(value).alias("__v")))
    rng = per.groupBy(key).agg(F.min("bucket").alias("__b0"),
                               F.max("bucket").alias("__b1"))
    grid = rng.select(key, F.explode(F.sequence("__b0", "__b1")).alias("bucket"))
    fwd = (Window.partitionBy(key).orderBy("bucket")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    bwd = (Window.partitionBy(key).orderBy("bucket")
           .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    known_b = F.when(F.col("__v").isNotNull(), F.col("bucket"))
    joined = (grid.join(per, [key, "bucket"], "left")
              .withColumn("__pv", F.last("__v", ignorenulls=True).over(fwd))
              .withColumn("__pb", F.last(known_b, ignorenulls=True).over(fwd))
              .withColumn("__nv", F.first("__v", ignorenulls=True).over(bwd))
              .withColumn("__nb", F.first(known_b, ignorenulls=True).over(bwd)))
    frac = ((F.col("bucket") - F.col("__pb")).cast("double")
            / (F.col("__nb") - F.col("__pb")).cast("double"))
    interp = (F.when(F.col("__pb").isNull(), F.col("__nv"))
              .when(F.col("__nb").isNull(), F.col("__pv"))
              .when(F.col("__nb") == F.col("__pb"), F.col("__pv"))
              .otherwise(F.col("__pv")
                         + (F.col("__nv") - F.col("__pv")) * frac))
    return joined.select(key, "bucket", interp.alias("value_interp"),
                         F.col("__v").isNull().alias("was_gap"))


def exact_grouped_quantiles(df: DataFrame, group_by: Sequence[str],
                            value: Column | str,
                            qs: Sequence[tuple[float, str]],
                            extra_aggs: Sequence[Column] = ()) -> DataFrame:
    """Exact continuous quantiles per group (SQL ``quantile_cont`` /
    Spark ``percentile`` semantics: 1-based continuous rank
    ``1 + (n-1)*q``, linear interpolation between the bracketing order
    statistics), re-planned for scale as a VALUE HISTOGRAM:

    1. ``groupBy(group, value).count()`` — the only row-count-sized
       shuffle, with map-side combine, so a 100 TB group moves its
       distinct-value histogram, not its rows;
    2. cumulative counts over the DISTINCT values per group (a window
       bounded by value cardinality, not row count);
    3. each order statistic is the value whose cumulative range covers
       its rank — one conditional-max aggregate per quantile.

    Spark's built-in ``percentile`` aggregate instead buffers every
    (value, count) of a group inside ONE aggregation buffer and sorts it
    in the final reducer — a hot group concentrates on a single task and
    its update path is interpreted per row, which is exactly what this
    formulation keeps out of the plan (whole-stage codegen end to end).

    ``qs`` is ``[(q, out_name), ...]``; returns one row per group.
    NULL values are ignored (quantile_cont semantics); a group whose
    values are ALL NULL is absent from the output (Spark's
    ``percentile`` would emit it with a NULL result — left-join this
    op's output against the group list if that row matters).

    ``extra_aggs``: additional aggregate columns evaluated in the SAME
    final per-group aggregate, over the histogram columns ``__v``
    (distinct value) and ``__c`` (its row count) — e.g. weighted-sum
    moments. Lets a caller that needs quantiles AND moments make ONE
    pass over the data instead of a second scan + join (r15, a7_stats).
    """
    vcol = F.col(value) if isinstance(value, str) else value
    # NULL values are ignored, matching quantile_cont / Spark percentile
    hist = (df.filter(vcol.isNotNull())
            .groupBy(*group_by, vcol.alias("__v"))
            .agg(F.count(F.lit(1)).alias("__c")))
    w_cum = Window.partitionBy(*group_by).orderBy("__v")
    w_all = Window.partitionBy(*group_by)
    hist = (hist.withColumn("__cum", F.sum("__c").over(w_cum))
            .withColumn("__n", F.sum("__c").over(w_all)))
    start = F.col("__cum") - F.col("__c") + 1
    out_aggs = []
    for q, name in qs:
        pos = F.lit(1.0) + (F.col("__n") - 1).cast("double") * F.lit(q)
        k_lo, k_hi = F.floor(pos), F.ceil(pos)
        v_lo = F.max(F.when((k_lo >= start) & (k_lo <= F.col("__cum")),
                            F.col("__v")))
        v_hi = F.max(F.when((k_hi >= start) & (k_hi <= F.col("__cum")),
                            F.col("__v")))
        frac = F.max(pos - k_lo.cast("double"))
        out_aggs.append((v_lo + frac * (v_hi - v_lo)).alias(name))
    return hist.groupBy(*group_by).agg(*out_aggs, *extra_aggs)
