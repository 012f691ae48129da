"""Naive Bayes classifier operators (operators/classify.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.classify import nb_score, nb_train


def _fit_and_score(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    model = nb_train(df, "text", "y")
    return model, {r["doc_id"]: r for r in nb_score(df, model, "text", "doc_id").collect()}


def test_nb_separates_disjoint_vocabularies(spark):
    rows = [
        (1, "spam spam offer money", 1),
        (2, "offer money spam", 1),
        (3, "meeting agenda notes", 0),
        (4, "notes agenda meeting meeting", 0),
    ]
    _, scored = _fit_and_score(spark, rows)
    assert scored[1]["pred"] and scored[2]["pred"]
    assert not scored[3]["pred"] and not scored[4]["pred"]
    assert scored[1]["score"] > 0 > scored[3]["score"]


def test_nb_model_has_prior_row_and_vocab_rows(spark):
    rows = [(1, "a b", 1), (2, "c d", 0)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    model = nb_train(df, "text", "y").collect()
    tokens = {r["token"] for r in model}
    assert tokens == {"a", "b", "c", "d", None}
    prior = [r["weight"] for r in model if r["token"] is None]
    assert prior == [0]  # balanced classes -> log(1) = 0


def test_nb_oov_tokens_score_zero_contribution(spark):
    rows = [(1, "x y", 1), (2, "z w", 0)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    model = nb_train(df, "text", "y")
    unseen = spark.createDataFrame([(9, "qq rr ss")], ["doc_id", "text"])
    out = nb_score(unseen, model, "text", "doc_id").collect()[0]
    assert out["n_tokens"] == 3 and out["score"] == 0.0


def test_nb_score_is_partitioning_invariant(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} common", i % 2) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    model = nb_train(df, "text", "y")
    a = nb_score(df, model, "text", "doc_id").collect()
    b = nb_score(df.repartition(13), model, "text", "doc_id").collect()
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)
