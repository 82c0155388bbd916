"""Text-analysis operators (SURVEY.md L4): token counting, quality
scoring, language-ID heuristic, document fingerprinting. Column-level
ops are pure JVM expressions (whole-stage codegen) — deliberately no
Python UDFs, so the same plan runs unchanged over 100 TB of documents.
The per-token × per-language scoring additionally has an Arrow-batched
frame-level form (:func:`language_id_frame`) because Catalyst evaluates
higher-order-function lambdas interpreted per element (CLAUDE.md rule).
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
    # run pattern, not per-char: with an EMPTY replacement, deleting
    # maximal non-punct RUNS leaves the identical punct-only string,
    # and regexp_replace wall is dominated by replacement-cycle count
    # (the normalize_text 28× lesson, r11); the oracle keeps the
    # per-char form — same output either way
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]]+", ""))
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
    # raw double, deliberately NOT rounded: every term is exact integer
    # arithmetic + single IEEE divisions in fixed order, so Spark and the
    # DuckDB oracle produce bit-identical doubles — while round() itself
    # DISAGREES between engines at shortest-repr half boundaries (Spark
    # HALF_UPs the decimal string, DuckDB rounds the binary value; bit
    # w8 at sf0.1). Rounding here would also make the >= 0.6 quality
    # gate flip row membership at such boundaries.
    # NULL text → NULL (without the guard, F.least SKIPS the null
    # sub-scores and the when-chain's otherwise(0.5) leaks a 0.83
    # "quality" for absent text).
    return F.when(text.isNull(), F.lit(None).cast("double")) \
            .otherwise((len_score + stop_score + wl_score) / 3.0)


# Per-language marker-token profiles for the language-ID heuristic.
# Alphabetical language order is the deterministic tie-break.
LANG_MARKERS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "für"],
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "on"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "una", "es"],
    "fr": ["le", "la", "les", "et", "est", "des", "un", "une", "dans", "que"],
}


def language_scores(text: Column) -> dict[str, Column]:
    """Marker-token hit count per language — the evidence columns behind
    :func:`language_id` (SURVEY.md: n-gram heuristic; real systems use
    char n-gram profiles, the argmax structure is identical)."""
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def language_id_frame(df: DataFrame, id_cols: tuple[str, ...] = ("doc_id",),
                      text_col: str = "text") -> DataFrame:
    """Frame-level language ID: one ``mapInArrow`` pass computing every
    language's marker score plus the argmax guess, columns
    ``(*id_cols, lang_guess, s_de, s_en, s_es, s_fr)``.

    Token-identical to :func:`language_id` / :func:`language_scores`
    (split on ``\\s+``, lowercase, exact marker membership — empty edge
    tokens can't be markers so the empty-filter is a no-op for counts),
    but the per-token work runs as Arrow/numpy kernels instead of
    Catalyst higher-order-function lambdas, whose per-element eval is
    INTERPRETED: 40 marker comparisons per token × interpreted
    dispatch dominated l4_language_id's wall (1.33 s → ~0.4 s at
    sf0.1). NULL text propagates as NULL outputs — the same semantics
    as the Catalyst column forms (``F.split(NULL)`` → NULL sizes), so
    the frame- and column-backed declared queries agree on nullable
    corpora (r5 advice: the old coalesce-to-'' scored nulls 0/'und').
    The split pattern is the EXPLICIT Java ``\\s`` class
    ``[ \\t\\n\\x0B\\f\\r]+`` because RE2's ``\\s`` (Arrow) excludes
    vertical tab while Java's (Catalyst) includes it."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    langs = sorted(LANG_MARKERS)
    id_fields = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}"
                          for c in id_cols)
    out_schema = (f"{id_fields}, lang_guess string, "
                  + ", ".join(f"s_{lg} int" for lg in langs))

    def score_batches(batches):
        for rb in batches:
            n = rb.num_rows
            nulls = pc.is_null(rb.column(text_col)).to_numpy(
                zero_copy_only=False)
            texts = pc.coalesce(rb.column(text_col), "")
            lists = pc.split_pattern_regex(texts,
                                           pattern=r"[ \t\n\x0B\f\r]+")
            flat = pc.utf8_lower(pc.list_flatten(lists))
            lengths = pc.list_value_length(lists).to_numpy(
                zero_copy_only=False)
            parents = np.repeat(np.arange(n), lengths)
            scores = {}
            for lg in langs:
                hit = pc.is_in(flat, value_set=pa.array(LANG_MARKERS[lg]))
                scores[lg] = np.bincount(
                    parents, weights=hit.to_numpy(zero_copy_only=False),
                    minlength=n).astype(np.int32)
            de, en, es, fr = (scores[lg] for lg in ("de", "en", "es", "fr"))
            guess = np.where(
                (de == 0) & (en == 0) & (es == 0) & (fr == 0), "und",
                np.where((de >= en) & (de >= es) & (de >= fr), "de",
                         np.where((en >= es) & (en >= fr), "en",
                                  np.where(es >= fr, "es", "fr"))))
            cols = ([rb.column(c) for c in id_cols]
                    + [pa.array(guess, pa.string(), mask=nulls)]
                    + [pa.array(scores[lg], pa.int32(), mask=nulls)
                       for lg in langs])
            yield pa.record_batch(
                cols, names=[*id_cols, "lang_guess",
                             *[f"s_{lg}" for lg in langs]])

    return df.select(*id_cols, text_col).mapInArrow(
        score_batches, out_schema)


def quality_frame(df: DataFrame, id_cols: tuple[str, ...] = ("doc_id",),
                  text_col: str = "text", *,
                  emit_text: bool = False) -> DataFrame:
    """Frame-level quality featurization: one ``mapInArrow`` pass
    computing ``(*id_cols, n_tok, stopword_ratio, punct_ratio,
    mean_word_len, quality)`` — the Arrow-kernel twin of
    :func:`quality_score` and friends (same CLAUDE.md rationale as
    :func:`language_id_frame`: per-token HOF lambdas evaluate
    interpreted).

    ``emit_text=True`` appends ``text_col`` itself to the output —
    the pass already reads it, so downstream stages that need the raw
    text (the pretrain pipeline's dedup/decontam stages) get it for
    zero extra Arrow transfer, instead of shipping the payload twice
    via an aliased pass-through id column (r10 review).

    Bit-identical doubles by construction: every ratio is an exact
    integer count divided once in IEEE double, every sum is a sum of
    integers (< 2^53, order-free), and the composite keeps the column
    op's exact operation order ``(len + stop + wl) / 3.0``. NULL text
    propagates as NULL features, and tokenization uses the explicit
    Java-``\\s`` class — both per the language_id_frame notes."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    id_fields = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}"
                          for c in id_cols)
    out_schema = (f"{id_fields}, n_tok int, stopword_ratio double, "
                  "punct_ratio double, mean_word_len double, "
                  "quality double")
    if emit_text:
        out_schema += (f", {text_col} "
                       f"{df.schema[text_col].dataType.simpleString()}")
    punct_re = r"[.,;:!?'\"()\[\]]"

    def featurize(batches):
        for rb in batches:
            n = rb.num_rows
            nulls = pc.is_null(rb.column(text_col)).to_numpy(
                zero_copy_only=False)
            texts = pc.coalesce(rb.column(text_col), "")
            # explicit Java-\s class: RE2 \s lacks \x0B (see
            # language_id_frame docstring)
            lists = pc.split_pattern_regex(texts,
                                           pattern=r"[ \t\n\x0B\f\r]+")
            flat = pc.list_flatten(lists)
            lengths = pc.list_value_length(lists).to_numpy(
                zero_copy_only=False)
            parents = np.repeat(np.arange(n), lengths)
            flat_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
            n_empty = np.bincount(parents, weights=flat_len == 0,
                                  minlength=n)
            n_tok = (lengths - n_empty).astype(np.int64)
            stop_hit = pc.is_in(pc.utf8_lower(flat),
                                value_set=pa.array(STOPWORDS))
            n_stop = np.bincount(
                parents, weights=stop_hit.to_numpy(zero_copy_only=False),
                minlength=n)
            sum_len = np.bincount(parents, weights=flat_len, minlength=n)
            denom = np.maximum(n_tok, 1).astype(np.float64)
            stop_ratio = n_stop / denom
            n_punct = pc.count_substring_regex(
                texts, punct_re).to_numpy(zero_copy_only=False)
            text_len = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
            punct_ratio = n_punct / np.maximum(text_len, 1)
            wl = sum_len / denom
            len_score = np.minimum(n_tok / 50.0, 1.0)
            stop_score = np.minimum(stop_ratio * 4.0, 1.0)
            wl_score = np.where((wl >= 3.0) & (wl <= 10.0), 1.0, 0.5)
            quality = (len_score + stop_score + wl_score) / 3.0
            # NULL text → NULL features (column-form semantics; r5 advice)
            cols = ([rb.column(c) for c in id_cols]
                    + [pa.array(n_tok, pa.int32(), mask=nulls),
                       pa.array(stop_ratio, pa.float64(), mask=nulls),
                       pa.array(punct_ratio, pa.float64(), mask=nulls),
                       pa.array(wl, pa.float64(), mask=nulls),
                       pa.array(quality, pa.float64(), mask=nulls)])
            names = [*id_cols, "n_tok", "stopword_ratio",
                     "punct_ratio", "mean_word_len", "quality"]
            if emit_text:
                cols.append(rb.column(text_col))
                names.append(text_col)
            yield pa.record_batch(cols, names=names)

    return df.select(*id_cols, text_col).mapInArrow(featurize, out_schema)


def language_id(text: Column) -> Column:
    """Argmax over the per-language marker scores; ties go to the
    alphabetically-first language; all-zero → 'und'; NULL text → NULL
    (without the explicit guard every comparison in the chain is NULL
    and the when-chain would fall through to the accidental
    ``otherwise('fr')``)."""
    s = language_scores(text)
    return (F.when(text.isNull(), F.lit(None).cast("string"))
            .when((s["de"] == 0) & (s["en"] == 0) & (s["es"] == 0) & (s["fr"] == 0),
                  "und")
            .when((s["de"] >= s["en"]) & (s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
            .when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
            .when(s["es"] >= s["fr"], "es")
            .otherwise("fr"))


# BPE-ish pre-tokenization: letter runs | digit runs | single non-space
# symbol — the shape of a GPT-2-style pre-tokenizer, minus the merges.
BPE_PIECE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_piece_count(text: Column) -> Column:
    """Count of BPE-ish pieces (whitespace-token counting's companion —
    the cheap proxy for LLM token budgets)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PIECE_PATTERN), F.lit(0)))


_RH_P = (1 << 31) - 1   # Mersenne modulus; values stay < 2^31 → no overflow
_RH_M = 1000003


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash over the token stream (Karp-Rabin shape):
    H = fold(H * m + v(tok)) mod p, with a per-token value derived from
    length + first/last code points. Order-sensitive (unlike a bag hash)
    and pure JVM arithmetic."""
    toks = tokens(text)
    def tok_val(t: Column) -> Column:
        return (131 * F.length(t)
                + 7 * F.ascii(t)
                + F.ascii(F.substring(t, -1, 1))).cast("long")
    return F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * _RH_M + tok_val(t), F.lit(_RH_P)))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercase text — the canonical-form hash used for exact dedup across
    formatting variants."""
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.md5(normalized)


# PII patterns: deliberately lookaround-free so the same regex runs
# identically under Java regex (Spark) and RE2 (DuckDB oracle).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_pii(text: Column) -> Column:
    """PII scrub for training-data release: emails → <EMAIL>, IPv4
    addresses → <IP>. Pure row expression (regexp_replace chains) —
    map-side at any corpus size. Real deployments extend the pattern
    table; the plan shape doesn't change."""
    out = F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(out, IPV4_PATTERN, "<IP>")


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_ipv4) found in the text — the audit metric emitted
    alongside redaction."""
    return (F.size(F.regexp_extract_all(text, F.lit(EMAIL_PATTERN), F.lit(0))),
            F.size(F.regexp_extract_all(text, F.lit(IPV4_PATTERN), F.lit(0))))


def normalize_text(text: Column) -> Column:
    """Canonical text normalization (the step before exact dedup /
    fingerprinting): lowercase, strip everything but [a-z0-9 ],
    collapse whitespace runs, trim. In-row, zero shuffle.

    ONE regex pass (r11): any run of [^a-z0-9] — which includes the
    space — collapses to a single space, provably identical to the
    previous strip-then-collapse two-pass form (each bad char became a
    space, then space runs collapsed: the union of both is exactly "a
    maximal run of non-alphanumerics → one space"); trim handles the
    edge runs. MEASURED same-session A/B (sf10 tier, 500 k docs):
    two-pass 50.9 s → one-pass 1.8 s (28×), sf1 6.9 s → 1.0 s — far
    beyond "half the passes", because the per-CHAR pattern
    ``[^a-z0-9 ]`` makes java.util.regex perform one find/replace
    cycle per bad character while the run pattern does one per run;
    replacement-cycle count, not scan count, dominates
    ``regexp_replace``. Equivalence is pytest-pinned on adversarial
    strings and the oracle (which still states the two-pass form)
    stays hash-green in both sessions."""
    return F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))


def sentences(text: Column) -> Column:
    """Non-empty trimmed sentence segments (split on .!?).

    The transform lambda must take exactly one arg: passing ``F.trim``
    directly would receive (element, index) and silently hit the
    two-parameter TRIM overload — trimming index digits off segments."""
    segs = F.split(text, r"[.!?]")
    return F.filter(F.transform(segs, lambda s: F.trim(s)), lambda s: s != "")


def dup_sentence_ratio(text: Column) -> Column:
    """Repetition signal: fraction of sentences that are duplicates of
    an earlier sentence in the SAME document (1 − distinct/total).
    High values mark boilerplate/spam for quality filtering. Array ops
    in-row — no explode, no shuffle."""
    segs = sentences(text)
    n = F.size(segs)
    return F.when(n > 0,
                  1.0 - F.size(F.array_distinct(segs)) / n.cast("double")) \
        .otherwise(F.lit(0.0))


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


def hashed_bow_features(df: DataFrame, *, id_col: str, text_col: str,
                        dim: int = 256,
                        label_col: str | None = None) -> DataFrame:
    """Hashed bag-of-words featurization (the fasttext-style front end
    of a corpus quality classifier): every token hashes to one of
    ``dim`` buckets and the document becomes its bucket-count vector.

    Scale shape: token hashing stays JVM-side (``xxhash64`` per element
    inside one higher-order expression); the per-document bincount runs
    vectorized in ``mapInArrow`` — one ``np.add.at`` over the flattened
    (row, bucket) index per Arrow batch. Zero shuffle at any corpus
    size, and the output is ``dim`` doubles/doc regardless of document
    length — the fixed-width representation the downstream distributed
    trainer needs. ``label_col`` (integer) rides through the pass so
    the trainer's (features, label) source needs no join back — rows
    are never reordered. Output: (id_col[, label_col], features)."""
    import numpy as np
    import pyarrow as pa

    carry = [F.col(label_col).cast("int")] if label_col else []
    hashed = df.select(
        F.col(id_col), *carry,
        F.transform(tokens(F.col(text_col)),
                    lambda t: F.pmod(F.xxhash64(t), F.lit(dim))).alias("__h"))

    def featurize(batches):
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            passthrough = [rb.column(i) for i in range(rb.num_columns - 1)]
            harr = rb.column(rb.num_columns - 1)
            offs = harr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            flat = harr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            lens = offs[1:] - offs[:-1]
            row_idx = np.repeat(np.arange(n), lens)
            M = np.zeros((n, dim))
            np.add.at(M, (row_idx, flat), 1.0)
            yield pa.RecordBatch.from_arrays(
                passthrough +
                [pa.ListArray.from_arrays(
                    pa.array(np.arange(n + 1) * dim, type=pa.int32()),
                    pa.array(M.ravel(), type=pa.float64()))],
                names=([id_col] + ([label_col] if label_col else [])
                       + ["features"]))

    out_schema = (f"{id_col} long, "
                  + (f"{label_col} int, " if label_col else "")
                  + "features array<double>")
    return hashed.mapInArrow(featurize, out_schema)


def char_entropy_frame(df: DataFrame, id_cols: tuple[str, ...] = ("doc_id",),
                       text_col: str = "text") -> DataFrame:
    """Per-document character (codepoint) Shannon entropy in ONE
    ``mapInArrow`` pass: ``(*id_cols, n_chars_total, n_unique_chars,
    char_entropy)``. Low entropy flags keyboard-mash / repeated-char /
    boilerplate documents; the measure is standard in LLM corpus QC.

    The per-row x per-char work (count every codepoint of every doc)
    is exactly the shape CLAUDE.md routes to Arrow: the whole batch is
    decoded to one uint32 codepoint vector (``utf-32-le`` view, zero
    Python-level loops over chars), doc membership is an ``np.repeat``
    parent index, and the (doc, codepoint) histogram is a single
    ``np.unique`` over a packed 64-bit key (codepoint < 2^21). Entropy
    uses the count form H = log2(n) - sum(c*log2 c)/n so only one
    divide happens per doc. Rows with NULL/empty text must be filtered
    upstream (codepoint count 0 has no entropy); callers keep Catalyst
    filter pushdown by filtering before the Arrow pass. The weighted
    log2 sum is order-dependent -> callers round before hashing."""
    import numpy as np
    import pyarrow as pa

    id_fields = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}"
                          for c in id_cols)
    out_schema = (f"{id_fields}, n_chars_total bigint, "
                  "n_unique_chars bigint, char_entropy double")

    def entropy_batches(batches):
        for rb in batches:
            n = rb.num_rows
            texts = rb.column(text_col).to_pylist()
            lens = np.array([len(t) for t in texts], dtype=np.int64)
            cps = np.frombuffer("".join(texts).encode("utf-32-le"),
                                dtype=np.uint32).astype(np.int64)
            parents = np.repeat(np.arange(n, dtype=np.int64), lens)
            keys, counts = np.unique((parents << 21) | cps,
                                     return_counts=True)
            owner = (keys >> 21).astype(np.int64)
            c = counts.astype(np.float64)
            wsum = np.bincount(owner, weights=c * np.log2(c), minlength=n)
            uniq = np.bincount(owner, minlength=n).astype(np.int64)
            with np.errstate(divide="ignore", invalid="ignore"):
                ent = np.log2(lens.astype(np.float64)) - wsum / lens
            cols = ([rb.column(cc) for cc in id_cols]
                    + [pa.array(lens, pa.int64()),
                       pa.array(uniq, pa.int64()),
                       pa.array(ent, pa.float64())])
            yield pa.record_batch(
                cols, names=[*id_cols, "n_chars_total", "n_unique_chars",
                             "char_entropy"])

    return df.select(*id_cols, text_col).mapInArrow(
        entropy_batches, out_schema)


def word_ngram_hash_frame(df: DataFrame, *, id_col: str = "doc_id",
                          text_col: str = "text", n: int = 8,
                          with_len: bool = False) -> DataFrame:
    """Positional word n-grams collapsed to 64-bit hashes in ONE
    ``mapInArrow`` pass — columns ``(id_col, pos, gh)``, one row per
    n-gram start position per document.

    Built for :func:`~..queries.llm_dedup.l6_duplicate_spans`, the r7
    measured scale-killer (13.9×–17× wall at 10× data): the Catalyst
    plan (``posexplode(word_ngrams(text, 8))`` → ``xxhash64``) runs the
    per-gram ``slice``/``concat_ws`` HOF lambdas INTERPRETED per
    element — per doc that is ~tokens × n interpreted calls, and it
    dominated the sf1 wall. Here tokenization is one Arrow
    ``split_pattern_regex`` kernel (the explicit Java ``\\s`` class,
    same as :func:`language_id_frame`), empty edge tokens are dropped
    (``tokens()``'s filter), per-token 64-bit hashes come from pandas'
    vectorized siphash (fixed key — deterministic across executors),
    and each n-gram hash is n shifted multiply-adds over the flat token
    array with distinct odd uint64 multipliers (wraparound arithmetic,
    position-sensitive, bijective per term).

    The hash REPLACES the gram string entirely: downstream only ever
    groups/flags by gram equality, so shuffles move 8-byte longs and
    the ~60-char string never leaves the Arrow batch. Two distinct
    grams colliding requires a 64-bit birthday hit (~n_grams²/2⁶⁵ —
    negligible at any tested SF). NULL/empty text yields no rows, same
    as ``posexplode`` of an empty/NULL gram array.

    ``with_len=True`` appends a ``glen int`` column — the CHARACTER
    length of the (never materialized) gram string, i.e. the sliding
    sum of token utf8 lengths plus the n−1 joining spaces — so
    repetition metrics stated in "fraction of characters" terms
    (Gopher-style) can be computed without ever shuffling the string."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, pos int, gh long"
    if with_len:
        out_schema += ", glen int"
    # distinct odd multipliers (odd powers of the 64-bit golden ratio)
    mults = np.array([pow(0x9E3779B97F4A7C15, j + 1, 1 << 64)
                      for j in range(n)], dtype=np.uint64)

    def gram_batches(batches):
        for rb in batches:
            nrows = rb.num_rows
            if nrows == 0:
                continue
            texts = pc.coalesce(rb.column(text_col), "")
            lists = pc.split_pattern_regex(texts,
                                           pattern=r"[ \t\n\x0B\f\r]+")
            flat = pc.list_flatten(lists)
            lengths = pc.list_value_length(lists).to_numpy(
                zero_copy_only=False)
            parents = np.repeat(np.arange(nrows), lengths)
            keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            toks = flat.to_numpy(zero_copy_only=False)[keep]
            parents = parents[keep]
            total = len(toks)
            if total < n:
                continue
            th = pd.util.hash_array(toks)            # uint64, fixed key
            counts = np.bincount(parents, minlength=nrows)
            starts = np.zeros(nrows + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            m = total - n + 1
            gh = np.zeros(m, dtype=np.uint64)
            for j in range(n):
                gh += th[j:m + j] * mults[j]
            valid = parents[:m] == parents[n - 1:]   # window within one doc
            pos = (np.arange(m) - starts[parents[:m]])[valid]
            ids = rb.column(id_col).take(pa.array(parents[:m][valid]))
            arrays = [ids, pa.array(pos.astype(np.int32), pa.int32()),
                      pa.array(gh[valid].view(np.int64), pa.int64())]
            names = [id_col, "pos", "gh"]
            if with_len:
                # char length of the joined gram: sliding sum of token
                # utf8 lengths + (n-1) single-space joiners
                tlen = pc.utf8_length(flat).to_numpy(
                    zero_copy_only=False)[keep].astype(np.int64)
                csum = np.zeros(total + 1, dtype=np.int64)
                np.cumsum(tlen, out=csum[1:])
                glen = (csum[n:] - csum[:m]) + (n - 1)
                arrays.append(pa.array(glen[valid].astype(np.int32),
                                       pa.int32()))
                names.append("glen")
            yield pa.record_batch(arrays, names=names)

    return df.select(id_col, text_col).mapInArrow(gram_batches, out_schema)


def gopher_repetition_frame(df: DataFrame, *, id_col: str = "doc_id",
                            chars_col: str = "n_chars",
                            text_col: str = "text") -> DataFrame:
    """Gopher repetition covers (Rae et al. 2021 §A1.1) in ONE
    ``mapInArrow`` pass — per input row, ``top2_cover`` (count × char
    length of the most frequent word 2-gram) and ``dup5_cover`` (summed
    count × char length of word 5-grams seen ≥ 2×).

    Both signals are ROW-LOCAL: every gram of a document lives in that
    document, so the per-(doc, gram) counting the old plan did with two
    corpus-wide ``groupBy(doc_id, gh, glen)`` shuffles (one per n) plus
    two per-doc aggregates and two joins back needs no shuffle at all.
    Here tokenization/hashing reuses :func:`word_ngram_hash_frame`'s
    vectorized kernels (same fixed-key siphash + positional multiply-
    add gram hashes, same utf8 char-length glen), and the per-doc
    count/max/sum collapse is a lexsort + run-length ``reduceat`` over
    the batch — no per-row Python. Emits EVERY input row (docs with
    fewer than n tokens, or NULL text, get cover 0, matching the
    oracle's COALESCE over the left joins), as
    ``(id_col, chars_col, top2_cover long, dup5_cover long)``."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    id_type = df.schema[id_col].dataType.simpleString()
    chars_type = df.schema[chars_col].dataType.simpleString()
    out_schema = (f"{id_col} {id_type}, {chars_col} {chars_type}, "
                  "top2_cover long, dup5_cover long")
    mults = np.array([pow(0x9E3779B97F4A7C15, j + 1, 1 << 64)
                      for j in range(5)], dtype=np.uint64)

    def rep_batches(batches):
        for rb in batches:
            nrows = rb.num_rows
            if nrows == 0:
                continue
            texts = pc.coalesce(rb.column(text_col), "")
            lists = pc.split_pattern_regex(texts,
                                           pattern=r"[ \t\n\x0B\f\r]+")
            flat = pc.list_flatten(lists)
            lengths = pc.list_value_length(lists).to_numpy(
                zero_copy_only=False)
            parents = np.repeat(np.arange(nrows), lengths)
            keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            parents = parents[keep]
            total = len(parents)
            top2 = np.zeros(nrows, dtype=np.int64)
            dup5 = np.zeros(nrows, dtype=np.int64)
            if total:
                th = pd.util.hash_array(
                    flat.to_numpy(zero_copy_only=False)[keep])
                tlen = (pc.utf8_length(flat).to_numpy(zero_copy_only=False)
                        [keep].astype(np.int64))
                csum = np.zeros(total + 1, dtype=np.int64)
                np.cumsum(tlen, out=csum[1:])
                for n, out, dup_only in ((2, top2, False), (5, dup5, True)):
                    m = total - n + 1
                    if m <= 0:
                        continue
                    gh = np.zeros(m, dtype=np.uint64)
                    for j in range(n):
                        gh += th[j:m + j] * mults[j]
                    valid = parents[:m] == parents[n - 1:]
                    gdoc = parents[:m][valid]
                    if len(gdoc) == 0:
                        continue
                    gh = gh[valid]
                    glen = ((csum[n:] - csum[:m]) + (n - 1))[valid]
                    order = np.lexsort((gh, gdoc))
                    gdoc, gh, glen = gdoc[order], gh[order], glen[order]
                    # run starts of equal (doc, gram-hash) spans
                    new_run = np.empty(len(gh), dtype=bool)
                    new_run[0] = True
                    np.not_equal(gh[1:], gh[:-1], out=new_run[1:])
                    new_run[1:] |= gdoc[1:] != gdoc[:-1]
                    starts = np.nonzero(new_run)[0]
                    cnt = np.diff(np.append(starts, len(gh)))
                    rdoc, rlen = gdoc[starts], glen[starts]
                    cover = cnt * rlen
                    doc_new = np.empty(len(starts), dtype=bool)
                    doc_new[0] = True
                    np.not_equal(rdoc[1:], rdoc[:-1], out=doc_new[1:])
                    dstarts = np.nonzero(doc_new)[0]
                    if dup_only:
                        out[rdoc[dstarts]] = np.add.reduceat(
                            np.where(cnt >= 2, cover, 0), dstarts)
                    else:
                        out[rdoc[dstarts]] = np.maximum.reduceat(
                            cover, dstarts)
            yield pa.record_batch(
                [rb.column(id_col), rb.column(chars_col),
                 pa.array(top2), pa.array(dup5)],
                names=[id_col, chars_col, "top2_cover", "dup5_cover"])

    return df.select(id_col, chars_col, text_col).mapInArrow(
        rep_batches, out_schema)
