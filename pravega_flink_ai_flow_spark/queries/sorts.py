"""Sort / limit / top-k queries (SURVEY.md §2.6, rows O1-O3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import declared, tables
from ..ops.relational import top_k_per_group


@declared(
    "o1_multi_key_sort",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    ORDER BY c_mktsegment ASC, c_acctbal DESC NULLS LAST, c_custkey ASC
    """,
    survey_ids=("O1",),
)
def o1_multi_key_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total sort, multi-key with explicit null placement — Spark plans a
    range-partitioned global sort (sampling-based partitioner), the
    only sane global sort at scale."""
    (customer,) = tables(spark, sf_dir, "customer")
    return (customer.select("c_custkey", "c_mktsegment", "c_acctbal")
            .orderBy(F.col("c_mktsegment").asc(),
                     F.col("c_acctbal").desc_nulls_last(),
                     F.col("c_custkey").asc()))


@declared(
    "o2_top_n",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    survey_ids=("O2",),
)
def o2_top_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit → TakeOrderedAndProject: each partition keeps its own
    top-25, only 25×partitions rows reach the driver-side merge. The
    unique o_orderkey tiebreaker makes the 25 deterministic."""
    (orders,) = tables(spark, sf_dir, "orders")
    return (orders.select("o_orderkey", "o_totalprice")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
            .limit(25))


@declared(
    "o3_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    ) WHERE rn <= 5
    """,
    survey_ids=("O3",),
)
def o3_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 customers by balance per market segment via the engine's
    top_k_per_group (WindowGroupLimit pushdown — partial top-k before the
    shuffle)."""
    (customer,) = tables(spark, sf_dir, "customer")
    return (top_k_per_group(
        customer.select("c_mktsegment", "c_custkey", "c_acctbal"),
        partition_by=["c_mktsegment"],
        order_by=[F.col("c_acctbal").desc(), F.col("c_custkey")],
        k=5))


@declared(
    "o4_nulls_ordering",
    oracle="""
    SELECT event_id, user_id, v
    FROM (
        SELECT event_id, user_id,
               CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
        FROM events
    )
    ORDER BY v ASC NULLS FIRST, event_id DESC
    LIMIT 500
    """,
    survey_ids=("O1", "O2"),
)
def o4_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST placement with a descending tiebreak and a
    LIMIT — the null-ordering semantics every SQL port gets wrong once.
    A synthetic NULL every 7th row guarantees the ordering is actually
    exercised. Spark plans TakeOrderedAndProject (top-k without a full
    sort) — the at-scale shape for ORDER BY + LIMIT."""
    (events,) = tables(spark, sf_dir, "events")
    v = F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value"))
    return (events.select("event_id", "user_id", v.alias("v"))
            .orderBy(F.col("v").asc_nulls_first(), F.col("event_id").desc())
            .limit(500))
