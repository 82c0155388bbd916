"""Set-operation queries (SURVEY.md §2.7, rows U1-U5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import declared, tables


@declared(
    "u1_union_all",
    oracle="""
    SELECT k, name FROM (
        SELECT c_nationkey AS k, 'customer' AS name FROM customer
        UNION ALL
        SELECT s_nationkey AS k, 'supplier' AS name FROM supplier
    )
    ORDER BY name, k
    """,
    survey_ids=("U1",),
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, supplier = tables(spark, sf_dir, "customer", "supplier")
    a = customer.select(F.col("c_nationkey").alias("k"), F.lit("customer").alias("name"))
    b = supplier.select(F.col("s_nationkey").alias("k"), F.lit("supplier").alias("name"))
    return a.unionByName(b).orderBy("name", "k")


@declared(
    "u2_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    survey_ids=("U2",),
)
def u2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, supplier = tables(spark, sf_dir, "customer", "supplier")
    a = customer.select(F.col("c_nationkey").alias("nationkey"))
    b = supplier.select(F.col("s_nationkey").alias("nationkey"))
    return a.unionByName(b).distinct().orderBy("nationkey")


@declared(
    "u3_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    survey_ids=("U3",),
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, supplier = tables(spark, sf_dir, "customer", "supplier")
    a = customer.select(F.col("c_nationkey").alias("nationkey"))
    b = supplier.select(F.col("s_nationkey").alias("nationkey"))
    return a.intersect(b).orderBy("nationkey")


@declared(
    "u3_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY custkey
    """,
    survey_ids=("U3",),
)
def u3_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL — keeps min(multiplicity) occurrences."""
    (orders,) = tables(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersectAll(b).orderBy("custkey")


@declared(
    "u4_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY custkey
    """,
    survey_ids=("U4",),
)
def u4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct EXCEPT with real rows (customers with open but no finished
    orders — 5 rows at sf0.001). The r5 verdict flagged the old
    customer-nations EXCEPT supplier-nations form as vacuously empty, and
    in this synthetic datagen every custkey/partkey appears in
    orders/lineitem, so FK-gap forms are empty too; the status split is
    the asymmetry that survives every SF."""
    (orders,) = tables(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b).orderBy("custkey")


@declared(
    "u4_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY custkey
    """,
    survey_ids=("U4",),
)
def u4_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL — keeps surplus duplicate occurrences."""
    (orders,) = tables(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b).orderBy("custkey")


@declared(
    "u5_distinct_dropdup",
    oracle="""
    SELECT user_id, event_type FROM (
        SELECT DISTINCT user_id, event_type FROM events
    )
    ORDER BY user_id, event_type
    """,
    survey_ids=("U5",),
)
def u5_distinct_dropdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    return (events.select("user_id", "event_type")
            .dropDuplicates(["user_id", "event_type"])
            .orderBy("user_id", "event_type"))
