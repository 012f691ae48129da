"""BPE merge training / segmentation (operators/bpe.py)."""

from __future__ import annotations

from kafka_streams_plumber_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
    word_counts,
)


def test_word_counts_collapses_corpus(spark):
    df = spark.createDataFrame(
        [(1, "ab ab cd"), (2, "ab cd cd")], ["doc_id", "text"]
    )
    wc = {r["word"]: r["cnt"] for r in word_counts(df, "text").collect()}
    assert wc == {"ab": 3, "cd": 3}


def test_bpe_train_learns_expected_merges(spark):
    # 'low' x3 + 'lower' x2: round 1 must merge (l, o) with count 5,
    # round 2 (lo, w) with count 5 — the classic Sennrich toy example.
    df = spark.createDataFrame(
        [(1, "low low low lower lower")], ["doc_id", "text"]
    )
    out = {
        r["merge_round"]: r for r in bpe_train(df, "text", n_merges=2).collect()
    }
    assert (out[1]["lhs"], out[1]["rhs"], out[1]["pair_count"]) == ("l", "o", 5)
    assert (out[2]["lhs"], out[2]["rhs"], out[2]["pair_count"]) == ("lo", "w", 5)


def test_bpe_tiebreak_is_lexicographic(spark):
    # 'ba' and 'bc' each once: pairs (b,a) and (b,c) tie at 1 — the
    # winner must be the lexicographically smaller (b, a).
    df = spark.createDataFrame([(1, "ba bc")], ["doc_id", "text"])
    r = bpe_train(df, "text", n_merges=1).collect()[0]
    # candidates are (b,a) and (b,c), tied at 1: lexicographically
    # smaller pair (b,a) must win
    assert (r["lhs"], r["rhs"]) == ("b", "a")
    assert r["pair_count"] == 1


def test_bpe_overlapping_merge_is_leftmost_first(spark):
    # 'aaa': pair (a,a) occurs twice positionally but merges leftmost
    # first -> 'aa a', never 'a aa'.
    df = spark.createDataFrame([(1, "aaa aaa")], ["doc_id", "text"])
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_train(df, "text", n_merges=1).collect()
    ]
    seg = bpe_segment(df, "text", merges).collect()
    toks = seg[0]["bpe_tokens"]
    assert toks == ["aa", "a"]


def test_bpe_train_is_partitioning_invariant(spark):
    rows = [(i, "spark spark plan plans scan scans") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = bpe_train(df, "text", n_merges=4).collect()
    b = bpe_train(df.repartition(7), "text", n_merges=4).collect()
    key = lambda r: r["merge_round"]
    assert sorted(a, key=key) == sorted(b, key=key)


def test_bpe_segment_applies_merges_in_order(spark):
    df = spark.createDataFrame([(1, "lowest low")], ["doc_id", "text"])
    seg = bpe_segment(df, "text", [("l", "o"), ("lo", "w")]).collect()
    assert ["low"] in [r["bpe_tokens"] for r in seg]
    assert ["low", "e", "s", "t"] in [r["bpe_tokens"] for r in seg]


def test_apply_merge_never_crosses_symbol_boundaries(spark):
    """A learned pair whose lhs is the SUFFIX of an existing multi-char
    symbol must not match: after merging (a,b) in 'abc', the symbols
    are [ab, c] — applying (b,c) must leave them untouched (a string
    replace on the joined form would spuriously produce [abc])."""
    from kafka_streams_plumber_spark.operators.bpe import bpe_segment

    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    seg = bpe_segment(df, "text", [("a", "b"), ("b", "c")]).collect()
    assert seg[0]["bpe_tokens"] == ["ab", "c"]
    # and the pair DOES apply where the symbols really are (b, c)
    df2 = spark.createDataFrame([(1, "xbc")], ["doc_id", "text"])
    seg2 = bpe_segment(df2, "text", [("b", "c")]).collect()
    assert seg2[0]["bpe_tokens"] == ["x", "bc"]


def test_bpe_words_split_on_all_whitespace(spark):
    """Embedded newlines/tabs break words (never become symbols)."""
    from kafka_streams_plumber_spark.operators.bpe import word_counts

    df = spark.createDataFrame([(1, "ab\ncd\tab")], ["doc_id", "text"])
    wc = {r["word"]: r["cnt"] for r in word_counts(df, "text").collect()}
    assert wc == {"ab": 2, "cd": 1}
