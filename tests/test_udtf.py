"""Python UDTF surface (ops/udtf.py): SQL-callable table functions with
LATERAL correlation — SURVEY.md §2.10."""

from pravega_flink_ai_flow_spark.ops.udtf import register_udtfs


def test_udtf_direct_table_factor(spark):
    register_udtfs(spark)
    rows = [tuple(r) for r in spark.sql(
        "SELECT * FROM split_sentences('One two. Three! Four five six?')"
    ).collect()]
    assert rows == [(0, "One two", 2), (1, "Three", 1), (2, "Four five six", 3)]


def test_udtf_lateral_correlation(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "A b. C!"), (2, ""), (3, None)],
        "doc_id long, text string").createOrReplaceTempView("udtf_docs")
    rows = sorted(tuple(r) for r in spark.sql("""
        SELECT d.doc_id, s.idx, s.sentence
        FROM udtf_docs d, LATERAL split_sentences(d.text) s
    """).collect())
    # empty/null texts fan out to zero rows (inner lateral semantics)
    assert rows == [(1, 0, "A b"), (1, 1, "C")]


def test_match_terms_udtf_spans(spark):
    register_udtfs(spark)
    rows = [tuple(r) for r in spark.sql(r"""
        SELECT m.term, m.start, m.length
        FROM VALUES ('call 555-1234 or 555-9999') AS t(x),
             LATERAL match_terms(t.x, '\\d{3}-\\d{4}') m
    """).collect()]
    assert rows == [("555-1234", 5, 8), ("555-9999", 17, 8)]
