"""Scalar-function queries (SURVEY.md §2.8) — one declared query per
family: string, date/time, math, conditional/null, cast, array, map,
JSON, vector. Every expression is a built-in ``pyspark.sql.functions``
call (JVM-side, whole-stage codegen) — the engine's standing rule that
the hot path never drops into Python.

Oracle notes (DuckDB 1.0 parity, verified):
- length/instr return BIGINT in DuckDB → cast to match Spark's INT;
- date_trunc returns DATE → cast to TIMESTAMP;
- dayofweek is 0=Sunday in DuckDB, 1=Sunday in Spark → +1;
- floor/ceil return DOUBLE in DuckDB, BIGINT in Spark → cast;
- map extraction returns a single-element LIST → [1];
- CAST(double AS INT) rounds in DuckDB but truncates in Spark → trunc().
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import declared, tables
from ..ops.similarity import cosine


@declared(
    "f_string",
    oracle="""
    SELECT p_partkey,
           concat(p_brand, '#', p_type)                    AS brand_type,
           concat_ws('|', p_brand, p_name)                 AS joined,
           upper(p_name)                                   AS uname,
           lower(p_brand)                                  AS lbrand,
           trim(concat('  ', p_name, '  '))                AS trimmed,
           CAST(length(p_name) AS INTEGER)                 AS name_len,
           substring(p_name, 1, 8)                         AS name_prefix,
           lpad(p_brand, 12, '*')                          AS padded,
           rpad(p_brand, 12, '-')                          AS rpadded,
           replace(p_type, ' ', '_')                       AS type_us,
           regexp_extract(p_name, '([a-z]+)', 1)           AS first_word,
           regexp_replace(p_name, '[aeiou]', '', 'g')      AS no_vowels,
           CAST(instr(p_name, 'a') AS INTEGER)             AS a_pos,
           repeat(p_brand, 2)                              AS brand2,
           reverse(p_brand)                                AS brand_rev,
           starts_with(p_name, 'a')                        AS starts_a,
           p_name LIKE '%er%'                              AS has_er
    FROM part
    ORDER BY p_partkey
    """,
    survey_ids=("§2.8-string",),
)
def f_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = tables(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.concat_ws("|", "p_brand", "p_name").alias("joined"),
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.rpad("p_brand", 12, "-").alias("rpadded"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        F.instr("p_name", "a").alias("a_pos"),
        F.repeat("p_brand", 2).alias("brand2"),
        F.reverse("p_brand").alias("brand_rev"),
        F.startswith(F.col("p_name"), F.lit("a")).alias("starts_a"),
        F.col("p_name").like("%er%").alias("has_er"),
    ).orderBy("p_partkey")


@declared(
    "f_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)                         AS o_year,
           CAST(month(o_orderdate) AS INTEGER)                        AS o_month,
           CAST(dayofmonth(o_orderdate) AS INTEGER)                   AS o_day,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER)                AS o_dow,
           CAST(hour(o_orderdate) AS INTEGER)                         AS o_hour,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)        AS month_start,
           CAST(o_orderdate AS DATE)                                  AS o_date,
           CAST(o_orderdate AS DATE) + 30                             AS plus_30d,
           CAST(o_orderdate AS DATE) - 7                              AS minus_7d,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
           CAST(floor(epoch(o_orderdate)) AS BIGINT)                  AS unix_ts,
           strftime(make_timestamp(CAST(floor(epoch(o_orderdate)) AS BIGINT) * 1000000),
                    '%Y-%m-%d %H:%M:%S')                              AS ts_str
    FROM orders
    ORDER BY o_orderkey
    """,
    survey_ids=("§2.8-datetime",),
)
def f_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sort-then-project (r15, f_json rationale): range-sample and
    # shuffle the two raw columns, evaluate the datetime battery once
    (orders,) = tables(spark, sf_dir, "orders")
    orders = (orders.select("o_orderkey", "o_orderdate")
              .orderBy("o_orderkey"))
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("o_year"),
        F.month(d).alias("o_month"),
        F.dayofmonth(d).alias("o_day"),
        F.dayofweek(d).alias("o_dow"),
        F.hour(d).alias("o_hour"),
        F.date_trunc("month", d).alias("month_start"),
        F.to_date(d).alias("o_date"),
        F.date_add(F.to_date(d), 30).alias("plus_30d"),
        F.date_sub(F.to_date(d), 7).alias("minus_7d"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.to_date(d)).alias("days_to_y2k"),
        F.unix_timestamp(d).alias("unix_ts"),
        F.from_unixtime(F.unix_timestamp(d)).alias("ts_str"),
    )


@declared(
    "f_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05)                          AS abs_v,
           round(l_extendedprice, 1)                       AS rounded,
           CAST(floor(l_extendedprice) AS BIGINT)          AS floored,
           CAST(ceil(l_extendedprice) AS BIGINT)           AS ceiled,
           sqrt(l_quantity)                                AS sqrt_qty,
           pow(l_quantity, 2)                              AS qty_sq,
           exp(l_discount)                                 AS exp_disc,
           ln(l_extendedprice)                             AS ln_price,
           log10(l_extendedprice)                          AS log10_price,
           sin(l_discount)                                 AS sin_disc,
           cos(l_discount)                                 AS cos_disc,
           CAST(sign(l_discount - 0.05) AS DOUBLE)         AS sign_v,
           greatest(l_quantity, 25.0)                      AS gq,
           least(l_quantity, 25.0)                         AS lq,
           CAST(((CAST(l_linenumber AS BIGINT) - 3) % 4 + 4) % 4 AS BIGINT) AS pmod_v
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
    survey_ids=("§2.8-math",),
)
def f_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-then-project (r15, same rationale as f_json): the range
    exchange now moves the 5 raw input columns instead of 18 computed
    ones, and the partitioner's sampling pass no longer re-evaluates
    the math battery (the sort key is the unique (l_orderkey,
    l_linenumber) pair, so row order is unchanged)."""
    (li,) = tables(spark, sf_dir, "lineitem")
    li = (li.select("l_orderkey", "l_linenumber", "l_discount",
                    "l_extendedprice", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber"))
    return li.select(
        "l_orderkey", "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_v"),
        F.round("l_extendedprice", 1).alias("rounded"),
        F.floor("l_extendedprice").alias("floored"),
        F.ceil("l_extendedprice").alias("ceiled"),
        F.sqrt("l_quantity").alias("sqrt_qty"),
        F.pow("l_quantity", 2).alias("qty_sq"),
        F.exp("l_discount").alias("exp_disc"),
        F.log(F.col("l_extendedprice")).alias("ln_price"),
        F.log10("l_extendedprice").alias("log10_price"),
        F.sin("l_discount").alias("sin_disc"),
        F.cos("l_discount").alias("cos_disc"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_v"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("gq"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("lq"),
        F.pmod(F.col("l_linenumber").cast("long") - 3, F.lit(4).cast("long")).alias("pmod_v"),
    )


@declared(
    "f_conditional",
    oracle="""
    SELECT s_suppkey,
           CASE WHEN s_acctbal > 5000 THEN 'rich'
                WHEN s_acctbal > 0 THEN 'ok'
                ELSE 'debt' END                             AS wealth,
           coalesce(nullif(s_nationkey, 0), -1)             AS nation_or_neg1,
           nullif(s_acctbal, 0.0)                           AS bal_nullif,
           (nullif(s_nationkey, 0) IS NULL)                 AS is_nation0,
           coalesce(CAST(NULL AS DOUBLE), s_acctbal, 0.0)   AS nvl_bal
    FROM supplier
    ORDER BY s_suppkey
    """,
    survey_ids=("§2.8-conditional",),
)
def f_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    (supplier,) = tables(spark, sf_dir, "supplier")
    return supplier.select(
        "s_suppkey",
        F.when(F.col("s_acctbal") > 5000, "rich")
         .when(F.col("s_acctbal") > 0, "ok")
         .otherwise("debt").alias("wealth"),
        F.coalesce(F.nullif(F.col("s_nationkey"), F.lit(0)), F.lit(-1)).alias("nation_or_neg1"),
        F.nullif(F.col("s_acctbal"), F.lit(0.0)).alias("bal_nullif"),
        F.isnull(F.nullif(F.col("s_nationkey"), F.lit(0))).alias("is_nation0"),
        F.coalesce(F.lit(None).cast("double"), F.col("s_acctbal"), F.lit(0.0)).alias("nvl_bal"),
    ).orderBy("s_suppkey")


@declared(
    "f_cast",
    oracle="""
    SELECT p_partkey,
           CAST(p_size AS DOUBLE)                  AS size_d,
           CAST(p_size AS VARCHAR)                 AS size_s,
           CAST(trunc(p_retailprice) AS INTEGER)   AS price_int,
           CAST(CAST(p_size AS VARCHAR) AS INTEGER) AS size_roundtrip,
           CAST(p_size AS BIGINT)                  AS size_l,
           CAST(p_partkey % 2 AS BOOLEAN)          AS odd_key
    FROM part
    ORDER BY p_partkey
    """,
    survey_ids=("§2.8-cast",),
)
def f_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = tables(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size_d"),
        F.col("p_size").cast("string").alias("size_s"),
        F.col("p_retailprice").cast("int").alias("price_int"),
        F.col("p_size").cast("string").cast("int").alias("size_roundtrip"),
        F.col("p_size").cast("long").alias("size_l"),
        (F.col("p_partkey") % 2).cast("boolean").alias("odd_key"),
    ).orderBy("p_partkey")


@declared(
    "f_array",
    oracle="""
    SELECT doc_id,
           CAST(len(toks) AS INTEGER)                             AS n_tokens,
           list_contains(toks, 'data')                            AS has_data,
           toks[1]                                                AS first_tok,
           array_to_string(list_slice(toks, 1, 3), ',')           AS first3,
           array_to_string(list_sort(list_distinct(toks)), ',')   AS vocab,
           CAST(len(list_distinct(toks)) AS INTEGER)              AS n_vocab,
           array_to_string(list_sort(list_transform(list_distinct(toks), t -> upper(t))), ',') AS vocab_upper,
           array_to_string(list_sort(list_filter(list_distinct(toks), t -> len(t) > 4)), ',')  AS long_toks,
           CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE)   AS total_chars
    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
          FROM documents)
    ORDER BY doc_id
    """,
    survey_ids=("§2.8-array",),
)
def f_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function battery. List-valued results are serialized to CSV
    strings (array_join) — the gate's canonicalizer requires scalar
    columns; the array ops themselves still run JVM-side."""
    # sort-then-project (r15, f_json rationale): the array battery is
    # the expensive part; keep it above the range exchange so the
    # sampler never runs it and the shuffle moves raw text only
    (docs,) = tables(spark, sf_dir, "documents")
    docs = docs.select("doc_id", "text").orderBy("doc_id")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "data").alias("has_data"),
        F.element_at(toks, 1).alias("first_tok"),
        F.array_join(F.slice(toks, 1, 3), ",").alias("first3"),
        F.array_join(F.sort_array(F.array_distinct(toks)), ",").alias("vocab"),
        F.size(F.array_distinct(toks)).alias("n_vocab"),
        F.array_join(F.sort_array(F.transform(F.array_distinct(toks), lambda t: F.upper(t))), ",").alias("vocab_upper"),
        F.array_join(F.sort_array(F.filter(F.array_distinct(toks), lambda t: F.length(t) > 4)), ",").alias("long_toks"),
        F.aggregate(toks, F.lit(0.0),
                    lambda acc, t: acc + F.length(t).cast("double")).alias("total_chars"),
    )


@declared(
    "f_explode_wordcount",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
          FROM documents)
    GROUP BY word
    """,
    survey_ids=("§2.8-array", "F6"),
)
def f_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode → groupBy word count — the canonical row-expanding op."""
    (docs,) = tables(spark, sf_dir, "documents")
    return (docs
            .select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"))
            .groupBy("word").agg(F.count("*").alias("n")))


@declared(
    "f_map",
    oracle="""
    SELECT n_nationkey,
           map_extract(m, 'name')[1]                 AS m_name,
           map_extract(m, 'region')[1]               AS m_region,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted
    FROM (SELECT n_nationkey,
                 map(['name', 'region'], [n_name, CAST(n_regionkey AS VARCHAR)]) AS m
          FROM nation)
    ORDER BY n_nationkey
    """,
    survey_ids=("§2.8-map",),
)
def f_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    (nation,) = tables(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"))
    return nation.select(
        "n_nationkey",
        F.element_at(m, "name").alias("m_name"),
        F.element_at(m, "region").alias("m_region"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
    ).orderBy("n_nationkey")


@declared(
    "f_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                  AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           to_json(struct_pack(event_id := event_id,
                               event_type := event_type))::VARCHAR AS as_json
    FROM events
    ORDER BY event_id
    """,
    survey_ids=("§2.8-json", "S6"),
)
def f_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-then-project (r15): the final ORDER BY is a range exchange
    whose partitioner SAMPLES its child — with the JSON expressions
    below the sort, every parse ran twice (sampling + exchange) and the
    exchange carried the computed columns. Sorting the three raw
    columns first runs each parse exactly once, post-shuffle (measured
    1.65 -> 0.84 s at sf0.1; same rows, same order — event_id is
    unique)."""
    (events,) = tables(spark, sf_dir, "events")
    return events.select("event_id", "props", "event_type") \
        .orderBy("event_id").select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.from_json("props", "k INT").getField("k").alias("k_int"),
            F.to_json(F.struct("event_id", "event_type")).alias("as_json"),
        )


@declared(
    "f_vector_dot",
    oracle="""
    SELECT vec_id,
           list_dot_product(CAST(embedding AS DOUBLE[]),
                            CAST(embedding AS DOUBLE[]))          AS self_dot,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[])))    AS norm
    FROM embeddings
    ORDER BY vec_id
    """,
    survey_ids=("§2.8-vector",),
)
def f_vector_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dot product / norm via higher-order functions (zip_with +
    aggregate) — the JVM-side vector primitive under L3."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    dot = F.aggregate(
        F.zip_with(vec, vec, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    return emb.select(
        "vec_id",
        dot.alias("self_dot"),
        F.sqrt(dot).alias("norm"),
    ).orderBy("vec_id")


@declared(
    "f_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255                   AS low_byte,
           event_id | 4096                  AS with_flag,
           xor(event_id, 1365)              AS xored,
           event_id << 2                    AS shifted_l,
           event_id >> 3                    AS shifted_r,
           CAST(bit_count(event_id) AS INTEGER) AS n_bits
    FROM events
    WHERE event_id < 100
    ORDER BY event_id
    """,
    survey_ids=(),
)
def f_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator family — masks, flags, shifts, popcount."""
    (events,) = tables(spark, sf_dir, "events")
    e = F.col("event_id")
    return (events.filter(e < 100)
            .select("event_id",
                    e.bitwiseAND(F.lit(255)).alias("low_byte"),
                    e.bitwiseOR(F.lit(4096)).alias("with_flag"),
                    e.bitwiseXOR(F.lit(1365)).alias("xored"),
                    F.shiftleft(e, 2).alias("shifted_l"),
                    F.shiftright(e, 3).alias("shifted_r"),
                    F.bit_count(e).alias("n_bits"))
            .orderBy("event_id"))


@declared(
    "f_pandas_udf_normalize",
    oracle="""
    SELECT doc_id,
           lower(trim(text))[1:40] AS norm_prefix,
           CAST(len(trim(text)) AS INTEGER) AS trimmed_len
    FROM documents
    ORDER BY doc_id
    """,
    survey_ids=("F1", "F6"),
)
def f_pandas_udf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas UDF in the oracle-checked corpus: vectorized
    string normalization (the engine-standard replacement for the
    reference's row-at-a-time ScalarFunction.eval, processor.py:246-250).
    The UDF computes with pandas str ops; the oracle reproduces them in
    SQL — so the Arrow transfer itself is under hash test."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def norm_prefix(s: pd.Series) -> pd.Series:
        return s.str.strip().str.lower().str.slice(0, 40)

    @pandas_udf("int")
    def trimmed_len(s: pd.Series) -> pd.Series:
        return s.str.strip().str.len().astype("int32")

    # sort-then-project (r15, f_json rationale) — doubly important for
    # a Python-boundary op: with the UDFs below the sort, the range
    # partitioner's sampling pass executed the ArrowEvalPython stage a
    # second time; above the sort each batch crosses to Python once
    (docs,) = tables(spark, sf_dir, "documents")
    return (docs.select("doc_id", "text").orderBy("doc_id")
            .select("doc_id",
                    norm_prefix(F.col("text")).alias("norm_prefix"),
                    trimmed_len(F.col("text")).alias("trimmed_len")))


@declared(
    "f_regex",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '[A-Za-z]{6,}', 0)          AS first_long_word,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_number_runs,
           regexp_matches(text, '(?i)\\bthe\\b')            AS has_the,
           sha256(regexp_replace(text, '[aeiou]', '_', 'g')) AS devoweled_sha
    FROM documents
    ORDER BY doc_id
    """,
    survey_ids=("F-str",),
)
def f_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function family — extract / extract_all / match-test /
    global replace (patterns restricted to the syntax Java regex and
    RE2 interpret identically; the replace output is sha256'd so every
    byte of the rewrite is hash-checked)."""
    # sort-then-project (r15, f_json rationale): regex battery above
    # the range exchange, evaluated once, never by the sampler
    (docs,) = tables(spark, sf_dir, "documents")
    docs = docs.select("doc_id", "text").orderBy("doc_id")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.regexp_extract(t, r"[A-Za-z]{6,}", 0).alias("first_long_word"),
        F.size(F.regexp_extract_all(t, F.lit(r"[0-9]+"), F.lit(0)))
         .alias("n_number_runs"),
        t.rlike(r"(?i)\bthe\b").alias("has_the"),
        F.sha2(F.regexp_replace(t, r"[aeiou]", "_").cast("binary"), 256)
         .alias("devoweled_sha"),
    )
