"""Text-analysis operators (SURVEY.md L4): token counting, quality
scoring, language-ID heuristic, document fingerprinting. All pure JVM
expressions (whole-stage codegen) — deliberately no Python UDFs, so the
same plan runs unchanged over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# A tiny embedded English stopword list — enough for ratio features.
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are",
]


def tokens(text: Column) -> Column:
    """Whitespace tokenization; filters empty tokens from leading/trailing
    space."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_ngrams(text: Column, n: int = 2) -> Column:
    toks = tokens(text)
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.when(cnt >= n, grams).otherwise(F.array())


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, F.lower(t))))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]]", ""))
    return n_punct / F.greatest(F.length(text), F.lit(1))


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(F.transform(toks, lambda t: F.length(t).cast("double")),
                        F.lit(0.0), lambda a, v: a + v)
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards stopword presence and
    moderate word length, penalizes very short docs — the standard cheap
    pre-filter before expensive model-based scoring."""
    n_tok = token_count(text).cast("double")
    len_score = F.least(n_tok / 50.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    wl = mean_word_length(text)
    wl_score = F.when((wl >= 3.0) & (wl <= 10.0), 1.0).otherwise(0.5)
    return F.round((len_score + stop_score + wl_score) / 3.0, 6)


def language_id(text: Column) -> Column:
    """Heuristic language ID from stopword hits (SURVEY.md: n-gram
    heuristic). Real systems use character n-gram profiles; the structure
    — per-language evidence columns, argmax — is identical."""
    en = F.array(*[F.lit(s) for s in ["the", "and", "of", "to", "is"]])
    es = F.array(*[F.lit(s) for s in ["el", "la", "de", "que", "y"]])
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    n_en = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    n_es = F.size(F.filter(toks, lambda t: F.array_contains(es, t)))
    return (F.when(n_en > n_es, "en")
            .when(n_es > n_en, "es")
            .otherwise("und"))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercase text — the canonical-form hash used for exact dedup across
    formatting variants."""
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.md5(normalized)


def profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis feature set to a documents frame."""
    t = F.col(text_col)
    return (df
            .withColumn("n_tokens", token_count(t))
            .withColumn("stopword_ratio", F.round(stopword_ratio(t), 6))
            .withColumn("punct_ratio", F.round(punct_ratio(t), 6))
            .withColumn("mean_word_len", F.round(mean_word_length(t), 6))
            .withColumn("quality", quality_score(t))
            .withColumn("lang_guess", language_id(t))
            .withColumn("fingerprint", fingerprint(t)))
