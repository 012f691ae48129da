"""Bigram LM train/score (operators/lm.py): hand-computed smoothed
probabilities; sf0.01 oracle equivalence is the q_lm_ppl contract."""

from __future__ import annotations

import math

from kafka_streams_plumber_spark.operators.lm import lm_score, lm_train


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lm_train_counts_adjacent_bigrams(spark):
    model = lm_train(_docs(spark, [(1, "a b a"), (2, "a b")]))
    got = {(r["w1"], r["w2"]): r["pairs"] for r in model.collect()}
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_lm_score_hand_computed(spark):
    # model: (a,b):2, (b,a):1; ctx a=2, b=1; V=2; k=0.5
    train = _docs(spark, [(1, "a b a"), (2, "a b")])
    model = lm_train(train)
    score = lm_score(
        _docs(spark, [(10, "a b"), (11, "b b"), (12, "a")]),
        model,
        add_k=0.5,
    )
    got = {r["doc_id"]: r for r in score.collect()}
    # doc 10: one seen bigram, p = (2+.5)/(2+.5*2) = 2.5/3
    assert got[10]["n_bigrams"] == 1
    assert got[10]["avg_logp"] == round(
        round(math.log(2.5 / 3) * 1e6) / 1e6, 6
    )
    assert abs(got[10]["perplexity"] - 1.2) < 1e-5
    # doc 11: unseen bigram (b,b), p = (0+.5)/(1+.5*2) = 0.25 -> ppl 4
    assert abs(got[11]["perplexity"] - 4.0) < 1e-5
    # doc 12: single token -> no bigram evidence, NULL scores
    assert got[12]["n_bigrams"] == 0
    assert got[12]["avg_logp"] is None and got[12]["perplexity"] is None


def test_lm_min_count_prunes_but_smoothing_covers(spark):
    train = _docs(spark, [(1, "a b a b a b"), (2, "c d")])
    model = lm_train(train, min_count=3)  # (c,d)x1 and (b,a)x2 pruned
    pairs = {(r["w1"], r["w2"]) for r in model.collect()}
    assert pairs == {("a", "b")}
    # pruned bigram still scores via the smoothed fallback (no crash,
    # finite perplexity)
    [row] = lm_score(_docs(spark, [(1, "c d")]), model).collect()
    assert row["perplexity"] is not None and row["perplexity"] > 1.0


def test_lm_score_gated_broadcast_regimes_agree(spark):
    train = _docs(spark, [(1, "a b c a b")])
    model = lm_train(train)
    docs = _docs(spark, [(1, "a b"), (2, "b c a")])
    bc = lm_score(docs, model).collect()
    shuffled = lm_score(docs, model, broadcast_threshold=None).collect()
    norm = lambda rows: sorted(
        (r["doc_id"], r["n_bigrams"], r["avg_logp"], r["perplexity"])
        for r in rows
    )
    assert norm(bc) == norm(shuffled)


def test_lm_score_empty_model_degrades_gracefully(spark):
    # min_count prunes EVERYTHING: scoring must fall back to uniform
    # smoothing (finite perplexity), never divide by a zero vocabulary
    train = _docs(spark, [(1, "a b")])
    model = lm_train(train, min_count=99)
    assert model.count() == 0
    [row] = lm_score(_docs(spark, [(1, "x y")]), model).collect()
    # p = k / (0 + k*1) = 1 -> logp 0 -> perplexity 1
    assert row["perplexity"] == 1.0 and row["avg_logp"] == 0.0


def test_min_k_prob_separates_seen_tail(spark):
    from kafka_streams_plumber_spark.operators.lm import (
        lm_score,
        lm_train,
        min_k_prob,
    )

    # corpus: a dominant repeated pattern + one doc with a rare tail
    common = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(i, common) for i in range(1, 9)]
        + [(9, common + " zq xv qqq")],  # rare bigrams form its tail
        "doc_id long, text string",
    )
    model = lm_train(docs, min_count=1)
    mk = {r["doc_id"]: r for r in min_k_prob(docs, model, k_frac=0.3).collect()}
    # fully-seen docs: even the lowest-30% bigrams are frequent
    assert mk[1]["min_k_avg_logp"] > mk[9]["min_k_avg_logp"]
    # tail mean separates harder than the whole-doc mean
    ppl = {r["doc_id"]: r["avg_logp"] for r in lm_score(docs, model).collect()}
    gap_tail = mk[1]["min_k_avg_logp"] - mk[9]["min_k_avg_logp"]
    gap_mean = ppl[1] - ppl[9]
    assert gap_tail > gap_mean

    # bookkeeping: n_lowest = ceil(k * n_bigrams), at least 1
    for r in mk.values():
        import math
        assert r["n_lowest"] == max(1, math.ceil(0.3 * r["n_bigrams"]))


def test_min_k_prob_short_docs_absent(spark):
    from kafka_streams_plumber_spark.operators.lm import (
        lm_train,
        min_k_prob,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "single"), (3, "")],
        "doc_id long, text string",
    )
    model = lm_train(docs, min_count=1)
    out = {r["doc_id"] for r in min_k_prob(docs, model).collect()}
    assert out == {1}  # <2 tokens -> no bigram evidence -> absent
