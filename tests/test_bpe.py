"""Corpus-trained BPE (ops/bpe.py): the Sennrich worked example,
determinism, and frame-vs-replica equality."""

import hashlib

from pravega_flink_ai_flow_spark.ops import bpe


def _freq_df(spark, d):
    return spark.createDataFrame(list(d.items()), "word string, freq long")


def test_worked_example_merges(spark):
    """The classic low/lower/newest/widest vocabulary must learn the
    published merge sequence (ties broken by lexicographically smallest
    pair: es before st before t</w> at count 9)."""
    freq = _freq_df(spark, {"low": 5, "lower": 2, "newest": 6,
                            "widest": 3})
    merges = bpe.train_bpe(freq, n_merges=5)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"),
                      ("l", "o"), ("lo", "w")]


def test_encode_unseen_word_greedy_rank(spark):
    freq = _freq_df(spark, {"low": 5, "lower": 2, "newest": 6,
                            "widest": 3})
    ranks = {p: i for i, p in enumerate(bpe.train_bpe(freq, n_merges=5))}
    assert bpe.encode_word("lowest", ranks) == ["low", "est</w>"]
    assert bpe.encode_word("low", ranks) == ["low", "</w>"]


def test_train_is_deterministic_across_runs(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the cat sat", "the cat", "a cat sat here", "the the the"])],
        "doc_id long, text string")
    m1 = bpe.train_bpe(bpe.word_freq(docs), n_merges=10)
    m2 = bpe.train_bpe(bpe.word_freq(docs.repartition(3)), n_merges=10)
    assert m1 == m2


def test_frame_matches_per_row_replica(spark):
    docs = spark.createDataFrame(
        [(0, "lower newest"), (1, "low widest lowest"), (2, ""),
         (3, "unseen zq")],
        "doc_id long, text string")
    merges = bpe.train_bpe(
        _freq_df(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3}),
        n_merges=5)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r.doc_id: r for r in bpe.encode_frame(docs, merges).collect()}
    for doc_id, text in [(0, "lower newest"), (1, "low widest lowest"),
                         (2, ""), (3, "unseen zq")]:
        words = text.split()
        pieces = []
        for w in words:
            pieces.extend(bpe.encode_word(w, ranks))
        r = got[doc_id]
        assert r.n_words == len(words)
        assert r.n_pieces == len(pieces)
        assert r.pieces_sha == hashlib.sha256(
            "\x1f".join(pieces).encode()).hexdigest()


def test_dict_guard_raises_then_truncates(spark):
    import pytest

    freq = _freq_df(spark, {f"w{i}": 1 for i in range(30)})
    with pytest.raises(ValueError, match="truncate=True"):
        bpe.train_bpe(freq, n_merges=2, max_dict_rows=10)
    # explicit truncation trains on the head without raising
    assert bpe.train_bpe(freq, n_merges=2, max_dict_rows=10,
                         truncate=True)
