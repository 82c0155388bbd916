"""Python UDTF surface (SURVEY.md §2.10 F6 extension): true SQL-callable
table functions, beyond the ``mapInPandas`` iterator idiom.

The reference's richest UDF shape is a scalar ``ScalarFunction.eval``
registered by name and called from SQL (processor.py:246-258). Spark 4
adds genuine Python UDTFs — ``@udtf`` classes registered with
``spark.udtf.register`` and invoked as table factors, including LATERAL
correlation against another table:

    SELECT d.doc_id, s.sentence
    FROM documents d, LATERAL split_sentences(d.text) s

Rows stream through Arrow; the UDTF is the right tool when one input
row fans out to a variable number of typed output rows and the call
site is SQL (engine-side ``explode(split(...))`` stays preferable when
a builtin can express the same thing — these exist for user extensions
the builtin vocabulary can't cover).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="idx int, sentence string, n_words int")
class SplitSentences:
    """text → one row per non-empty sentence with its index and word
    count. The canonical fan-out UDTF."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        idx = 0
        for seg in re.split(r"[.!?]", text or ""):
            seg = seg.strip()
            if seg:
                yield idx, seg, len(seg.split())
                idx += 1


@udtf(returnType="term string, start int, length int")
class MatchTerms:
    """(text, pattern) → one row per regex match with its span — the
    grep-as-a-table-function shape (pattern compiled once per instance,
    reused across rows)."""

    def __init__(self):
        self._cache: dict[str, re.Pattern] = {}

    def eval(self, text: str, pattern: str):
        if text is None or pattern is None:
            return
        pat = self._cache.get(pattern)
        if pat is None:
            pat = self._cache[pattern] = re.compile(pattern)
        for m in pat.finditer(text):
            yield m.group(0), m.start(), m.end() - m.start()


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTFs by name for SQL call sites (the
    ``register_function`` analog, processor.py:256-258)."""
    spark.udtf.register("split_sentences", SplitSentences)
    spark.udtf.register("match_terms", MatchTerms)
