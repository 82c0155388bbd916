"""Projection / filter / expression queries (SURVEY.md §2.2, rows P1-P6).

Reference surface: string-expression projection incl. UDF call
(``table.select("mypred(sl,sw,pl,pw)")``, processor.py:258), the
pass-through stage (processor.py:62-64), pandas column split
(processor.py:125-126), and the implied SQL WHERE/expression surface
(processor.py:44). All stay inside whole-stage codegen — no Python in the
row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import declared, tables


@declared(
    "p1_expression_select",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_quantity * 2.0 + 1.0             AS qty_expr
    FROM lineitem
    WHERE l_linenumber = 1
    ORDER BY l_orderkey
    """,
    survey_ids=("P1", "P5"),
)
def p1_expression_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_linenumber") == 1)
        .selectExpr(
            "l_orderkey", "l_linenumber",
            "l_extendedprice * (1 - l_discount) AS disc_price",
            "l_quantity * 2.0 + 1.0 AS qty_expr",
        )
        .orderBy("l_orderkey")
    )


@declared(
    "p2_identity_stage",
    oracle="SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    survey_ids=("P2",),
)
def p2_identity_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pass-through pipeline stage — DatagenExecutor.process returns its
    input unchanged (processor.py:62-64)."""
    (region,) = tables(spark, sf_dir, "region")
    identity = lambda df: df  # noqa: E731
    return identity(region).orderBy("r_regionkey")


@declared(
    "p3_column_split",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey
    """,
    survey_ids=("P3",),
)
def p3_column_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature/label-style column split (train_data.pop(label),
    processor.py:125-126): drop some columns, keep the rest."""
    (customer,) = tables(spark, sf_dir, "customer")
    return customer.drop("c_nationkey", "c_mktsegment").orderBy("c_custkey")


@declared(
    "p4_filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus IN ('F', 'O'))
      AND o_totalprice BETWEEN 50000 AND 250000
      AND o_orderpriority LIKE '%URGENT%'
      AND NOT (o_custkey = 1)
      AND o_orderdate IS NOT NULL
    ORDER BY o_orderkey
    """,
    survey_ids=("P4",),
)
def p4_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/IN/BETWEEN/LIKE/NOT/IS NULL predicate surface."""
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.col("o_orderstatus").isin("F", "O")
            & F.col("o_totalprice").between(50000, 250000)
            & F.col("o_orderpriority").like("%URGENT%")
            & ~(F.col("o_custkey") == 1)
            & F.col("o_orderdate").isNotNull()
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@declared(
    "p5_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           o_totalprice % 1000 AS price_mod
    FROM orders
    ORDER BY o_orderkey
    """,
    survey_ids=("P5",),
)
def p5_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") >= 300000, "high")
             .when(F.col("o_totalprice") >= 100000, "mid")
             .otherwise("low").alias("price_band"),
            (F.col("o_totalprice") % 1000).alias("price_mod"),
        )
        .orderBy("o_orderkey")
    )


@declared(
    "p6_rename_alias",
    oracle="""
    SELECT s_suppkey AS supplier_id, s_name AS supplier_name,
           s_acctbal AS balance
    FROM supplier
    ORDER BY supplier_id
    """,
    survey_ids=("P6",),
)
def p6_rename_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    (supplier,) = tables(spark, sf_dir, "supplier")
    return (
        supplier
        .withColumnRenamed("s_suppkey", "supplier_id")
        .select("supplier_id",
                F.col("s_name").alias("supplier_name"),
                F.col("s_acctbal").alias("balance"))
        .orderBy("supplier_id")
    )


@declared(
    "p7_systematic_sample",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE o_orderkey % 20 = 7
    ORDER BY o_orderkey
    """,
    survey_ids=("P4",),
)
def p7_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic systematic sampling (key mod stride) — the
    reproducible alternative to TABLESAMPLE for cross-engine-checkable
    pipelines; the predicate pushes into the scan like any filter."""
    (orders,) = tables(spark, sf_dir, "orders")
    return (orders.filter(F.col("o_orderkey") % 20 == 7)
            .select("o_orderkey", "o_custkey",
                    F.col("o_totalprice").cast("double").alias("o_totalprice"))
            .orderBy("o_orderkey"))


@declared(
    "p8_stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn % 5 = 1
    ORDER BY doc_id
    """,
    survey_ids=("P4", "W1"),
)
def p8_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: every 5th row per language in
    doc_id order — the reproducible per-stratum alternative to
    ``sampleBy`` for pipelines whose samples must be replayable."""
    from pyspark.sql import Window
    (docs,) = tables(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    return (docs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") % 5 == 1)
            .select("doc_id", "lang")
            .orderBy("doc_id"))


@declared(
    "p9_hash_sample_per_group",
    oracle="""
    SELECT source, doc_id, n_chars FROM (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id * 2654435761 AS VARCHAR)),
                            doc_id) AS rn
        FROM documents
    ) WHERE rn <= 5
    ORDER BY source, doc_id
    """,
    survey_ids=("P7", "O3"),
)
def p9_hash_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group sampling (the reservoir-sampling shape
    training-data pipelines need reproducible): k docs per source,
    ranked by a salted-key hash — unbiased in expectation like a random
    reservoir, but replayable and cross-engine identical. One window
    shuffle on the group key; at 100 TB the same plan runs with a
    WindowGroupLimit (each partition keeps ≤ k rows per group before
    the merge). md5 of the decimal-rendered salted key is the portable
    hash both engines compute bit-identically."""
    from pyspark.sql import Window

    (docs,) = tables(spark, sf_dir, "documents")
    key = F.md5((F.col("doc_id") * F.lit(2654435761)).cast("string"))
    w = Window.partitionBy("source").orderBy(key, "doc_id")
    return (docs.select("source", "doc_id", "n_chars")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("source", "doc_id", "n_chars")
            .orderBy("source", "doc_id"))
