"""Property tests (SURVEY.md §5.5): join/set-op algebraic identities of
the Spark plans checked against DuckDB on random small frames."""

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

rows_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-3, 3)), min_size=0, max_size=25)


def _to_spark(spark, rows, name):
    pdf = pd.DataFrame(rows or [(0, 0)][:0], columns=["k", "v"])
    if not rows:
        return spark.createDataFrame([], "k long, v long")
    return spark.createDataFrame(pdf.astype("int64"))


@settings(max_examples=15, deadline=None)
@given(a=rows_strategy, b=rows_strategy)
def test_inner_join_matches_duckdb(spark, a, b):
    da, db = _to_spark(spark, a, "a"), _to_spark(spark, b, "b")
    got = sorted((r[0], r[1], r[2]) for r in
                 da.join(db.withColumnRenamed("k", "k2").withColumnRenamed("v", "v2"),
                         F.col("k") == F.col("k2"))
                 .select("k", "v", "v2").collect())
    con = duckdb.connect()
    pa = pd.DataFrame(a, columns=["k", "v"])
    pb = pd.DataFrame(b, columns=["k", "v"])
    con.register("ta", pa)
    con.register("tb", pb)
    want = sorted(tuple(r) for r in con.sql(
        "SELECT ta.k, ta.v, tb.v FROM ta JOIN tb ON ta.k = tb.k").fetchall())
    assert got == want


@settings(max_examples=15, deadline=None)
@given(a=rows_strategy, b=rows_strategy)
def test_except_all_union_all_partition(spark, a, b):
    """A = (A exceptAll B) ∪all (A intersectAll B) — multiset identity."""
    da, db = _to_spark(spark, a, "a"), _to_spark(spark, b, "b")
    lhs = sorted(tuple(r) for r in da.collect())
    rhs = sorted(tuple(r) for r in
                 da.exceptAll(db).unionAll(da.intersectAll(db)).collect())
    assert lhs == rhs


@settings(max_examples=15, deadline=None)
@given(a=rows_strategy)
def test_groupby_sum_matches_duckdb(spark, a):
    da = _to_spark(spark, a, "a")
    got = sorted(tuple(r) for r in
                 da.groupBy("k").agg(F.sum("v").alias("s"),
                                     F.count("*").alias("n")).collect())
    con = duckdb.connect()
    pa = pd.DataFrame(a, columns=["k", "v"])
    con.register("ta", pa)
    want = sorted(tuple(r) for r in con.sql(
        "SELECT k, CAST(SUM(v) AS BIGINT), COUNT(*) FROM ta GROUP BY k").fetchall())
    assert got == want


@settings(max_examples=10, deadline=None)
@given(a=rows_strategy, b=rows_strategy)
def test_semi_plus_anti_partition_left(spark, a, b):
    """left = semi(left,b) ∪all anti(left,b) — row-level partition."""
    da, db = _to_spark(spark, a, "a"), _to_spark(spark, b, "b")
    semi = da.join(db, "k", "left_semi")
    anti = da.join(db, "k", "left_anti")
    assert sorted(map(tuple, da.collect())) == \
        sorted(map(tuple, semi.unionAll(anti).collect()))
