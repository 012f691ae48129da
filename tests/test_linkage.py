"""Blocked fuzzy join (operators/linkage.py)."""

from __future__ import annotations

from kafka_streams_plumber_spark.operators.linkage import fuzzy_join, prefix_block


def test_fuzzy_join_finds_typos_within_block(spark):
    l = spark.createDataFrame(
        [("alpha widget",), ("beta gizmo",), ("gamma bolt",)], "a string"
    )
    r = spark.createDataFrame(
        [("alpha widgat",), ("beta gizmos",), ("delta bolt",)], "b string"
    )
    out = {(r_["a"], r_["b"]): r_["distance"] for r_ in fuzzy_join(l, r, "a", "b").collect()}
    assert out[("alpha widget", "alpha widgat")] == 1
    assert out[("beta gizmo", "beta gizmos")] == 1
    # "gamma bolt" vs "delta bolt": different block (prefix) -> no pair
    assert len(out) == 2


def test_fuzzy_join_respects_max_distance(spark):
    l = spark.createDataFrame([("abcdef",)], "a string")
    # same 4-char block, Levenshtein distance 3
    r = spark.createDataFrame([("abcdxyz",)], "b string")
    assert fuzzy_join(l, r, "a", "b", max_distance=2).count() == 0
    assert fuzzy_join(l, r, "a", "b", max_distance=3).count() == 1


def test_fuzzy_join_similarity_value(spark):
    l = spark.createDataFrame([("abcde",)], "a string")
    r = spark.createDataFrame([("abcdf",)], "b string")
    row = fuzzy_join(l, r, "a", "b").first()
    assert row["distance"] == 1 and abs(row["similarity"] - 0.8) < 1e-9


def test_fuzzy_join_block_cap_drops_degenerate_blocks(spark):
    # 50 left x 50 right rows all in one block: cap 10 skips the block
    l = spark.createDataFrame([(f"aaaa{i:02d}",) for i in range(50)], "a string")
    r = spark.createDataFrame([(f"aaaa{i:02d}",) for i in range(50)], "b string")
    assert fuzzy_join(l, r, "a", "b", block_cap=10).count() == 0
    assert fuzzy_join(l, r, "a", "b", block_cap=100).count() > 0


def test_fuzzy_join_null_never_matches(spark):
    l = spark.createDataFrame([(None,), ("ab",)], "a string")
    r = spark.createDataFrame([(None,), ("ab",)], "b string")
    rows = fuzzy_join(l, r, "a", "b").collect()
    assert [(r_["a"], r_["b"]) for r_ in rows] == [("ab", "ab")]
