"""Analytic window-function queries (SURVEY.md §2.5, rows W1-W7).

All orderings are made tie-free (unique event_id / custkey tiebreakers)
so results are deterministic and hash-checkable — SURVEY.md §7 risk
register. Window partitions are user-level keys: state per partition is
bounded, so the same plans hold when events is 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import declared, tables


@declared(
    "w1_row_number",
    oracle="""
    SELECT event_id, user_id, value, rn FROM (
        SELECT event_id, user_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn <= 3
    ORDER BY user_id, rn, event_id
    """,
    survey_ids=("W1", "O3"),
)
def w1_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (events.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("event_id", "user_id", "value", "rn")
            .orderBy("user_id", "rn", "event_id"))


@declared(
    "w2_rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS bal_rank,
           DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS bal_dense_rank,
           NTILE(4)     OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS bal_quartile
    FROM customer
    ORDER BY c_custkey
    """,
    survey_ids=("W2",),
)
def w2_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = tables(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (customer.select(
        "c_custkey", "c_nationkey", "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    ).orderBy("c_custkey"))


@declared(
    "w3_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value)     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(value)    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           LAG(value, 2)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev2_value
    FROM events
    ORDER BY event_id
    """,
    survey_ids=("W3",),
)
def w3_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (events.select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2).over(w).alias("prev2_value"),
    ).orderBy("event_id"))


@declared(
    "w4_running_sum",
    oracle="""
    SELECT event_id, user_id, value,
           CAST(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_count
    FROM events
    """,
    survey_ids=("W4",),
)
def w4_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (events.select(
        "event_id", "user_id", "value",
        F.sum("value").over(w).cast("double").alias("running_total"),
        F.count("*").over(w).alias("running_count"),
    ))


@declared(
    "w5_moving_avg",
    oracle="""
    SELECT event_id, user_id, value,
           AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS moving_avg_5
    FROM events
    ORDER BY event_id
    """,
    survey_ids=("W5",),
)
def w5_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-4, Window.currentRow))
    return (events.select(
        "event_id", "user_id", "value",
        F.avg("value").over(w).alias("moving_avg_5"),
    ).orderBy("event_id"))


@declared(
    "w6_range_frame",
    oracle="""
    SELECT event_id, user_id, value,
           CAST(SUM(value) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_total
    FROM events
    ORDER BY event_id
    """,
    survey_ids=("W6",),
)
def w6_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range frame over event-time seconds: all events of the same user in
    the trailing hour."""
    (events,) = tables(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy(F.col("ts").cast("double"))
         .rangeBetween(-3600, Window.currentRow))
    return (events.select(
        "event_id", "user_id", "value",
        F.sum("value").over(w).cast("double").alias("hour_total"),
    ).orderBy("event_id"))


@declared(
    "w7_first_last_value",
    oracle="""
    SELECT event_id, user_id,
           FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_val,
           LAST_VALUE(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val
    FROM events
    ORDER BY event_id
    """,
    survey_ids=("W7",),
)
def w7_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return (events.select(
        "event_id", "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
    ).orderBy("event_id"))


@declared(
    "w8_percent_rank_cume_dist",
    oracle="""
    SELECT c_custkey, c_nationkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
    survey_ids=("W2",),
)
def w8_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position analytics: percent_rank + cume_dist per nation by
    account balance (ties broken by key for determinism).

    Deliberately NOT rounded on either side: both engines compute the
    same single IEEE division, so the raw doubles are bit-identical —
    while round() itself disagrees at shortest-repr half boundaries
    (Spark HALF_UPs the decimal string "0.0640625"; DuckDB rounds the
    binary value just below it — observed at sf0.1, c_custkey 12794)."""
    (customer,) = tables(spark, sf_dir, "customer")
    w = (Window.partitionBy("c_nationkey")
         .orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc()))
    return (customer.select(
        "c_custkey", "c_nationkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"))
        .orderBy("c_custkey"))


@declared(
    "w9_running_count_distinct",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               (ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id)) = 1 AS is_first
        FROM events
    )
    SELECT event_id, user_id,
           CAST(SUM(CASE WHEN is_first THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct_types
    FROM flagged
    ORDER BY event_id
    """,
    survey_ids=("W1", "W4", "A3"),
)
def w9_running_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — not natively expressible
    in Spark window functions; the scalable formulation flags each
    value's first occurrence per key (row_number over (key, value)) and
    running-sums the flags. Two window passes, both on the same key
    partitioning, no per-row set state — at 100 TB the state a naive
    collect_set-over-window would carry per row is the whole distinct
    set, this carries one bit."""
    (events,) = tables(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type") \
        .orderBy("ts", "event_id")
    w_run = (Window.partitionBy("user_id").orderBy("ts", "event_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    flagged = events.withColumn(
        "__is_first", F.row_number().over(w_first) == 1)
    return (flagged.select(
        "event_id", "user_id",
        F.sum(F.when(F.col("__is_first"), 1).otherwise(0)).over(w_run)
         .alias("n_distinct_types"))
        .orderBy("event_id"))


@declared(
    "w10_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS rolling_median
    FROM events
    ORDER BY event_id
    """,
    survey_ids=("W5", "A7"),
)
def w10_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over a 10-row trailing frame — the robust
    moving-average companion (outlier-resistant smoothing). Exact
    percentile per frame; both engines interpolate identically
    (continuous quantile over the sorted frame)."""
    (events,) = tables(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-9, Window.currentRow))
    return (events.select(
        "event_id", "user_id",
        F.percentile("value", F.lit(0.5)).over(w).alias("rolling_median"))
        .orderBy("event_id"))
