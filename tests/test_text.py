"""Unit tests for text-analysis operators on hand-computed fixtures
(the contract queries cover them against the DuckDB oracle at corpus
scale; these pin the edge-case semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators import text as TX


def _rep(spark, s):
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(TX.repetition_stats("text").alias("r")).collect()[0]["r"].asDict()


def test_repetition_all_unique(spark):
    r = _rep(spark, "a b c d")
    assert r == {"dup_1gram_frac": 0.0, "dup_2gram_frac": 0.0, "dup_3gram_frac": 0.0}


def test_repetition_fully_repeated(spark):
    # "x x x x": 4 words 1 distinct -> 0.75; 3 bigrams 1 distinct -> 2/3;
    # 2 trigrams 1 distinct -> 0.5
    r = _rep(spark, "x x x x")
    assert r["dup_1gram_frac"] == 0.75
    assert r["dup_2gram_frac"] == round(2 / 3, 6)
    assert r["dup_3gram_frac"] == 0.5


def test_repetition_short_docs_score_zero(spark):
    assert _rep(spark, "a b")["dup_3gram_frac"] == 0.0
    assert _rep(spark, "a")["dup_2gram_frac"] == 0.0


def test_repetition_case_folds(spark):
    # "The the" is one distinct unigram after lowering
    assert _rep(spark, "The the")["dup_1gram_frac"] == 0.5


def test_quality_and_langid_shapes(spark):
    df = spark.createDataFrame(
        [("the cat and the dog is in the house for it",),
         ("der hund ist nicht ein und das zu der die",)],
        "text string",
    )
    out = df.select(
        TX.lang_id("text").alias("lang"), TX.quality_score("text").alias("q")
    ).collect()
    assert out[0]["lang"] == "en"
    assert out[1]["lang"] == "de"
    assert all(0.0 <= r["q"] <= 1.0 for r in out)


def test_redact_pii_all_three_patterns(spark):
    df = spark.createDataFrame(
        [("mail a@b.com call +1 555-123-4567 ip 10.0.0.1 end",)], "text string"
    )
    out = df.select(TX.redact_pii("text").alias("t")).collect()[0]["t"]
    assert "a@b.com" not in out and "555" not in out and "10.0.0.1" not in out
    assert out.count("[REDACTED]") == 3
