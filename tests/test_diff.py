"""snapshot_diff: classification, null-safety of the row digest,
digest-before-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.diff import row_digest, snapshot_diff


def _classes(df):
    return {r["key"]: r["change"] for r in df.collect()}


def test_added_removed_changed_unchanged(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, s string, v long"
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 99), (4, "d", 40)], "id long, s string, v long"
    )
    got = _classes(snapshot_diff(new, old, "id"))
    # key 2 unchanged -> absent
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_null_vs_empty_string_differ(spark):
    old = spark.createDataFrame([(1, None)], "id long, s string")
    new = spark.createDataFrame([(1, "")], "id long, s string")
    assert _classes(snapshot_diff(new, old, "id")) == {1: "changed"}


def test_compare_cols_subset_ignores_other_columns(spark):
    old = spark.createDataFrame([(1, "x", 5)], "id long, s string, v long")
    new = spark.createDataFrame([(1, "y", 5)], "id long, s string, v long")
    assert _classes(snapshot_diff(new, old, "id", compare_cols=["v"])) == {}


def test_digest_not_field_order_ambiguous(spark):
    # ("ab", "c") must not collide with ("a", "bc")
    df = spark.createDataFrame(
        [("ab", "c"), ("a", "bc")], "x string, y string"
    )
    digests = [
        r["d"] for r in df.select(row_digest(df, ["x", "y"]).alias("d")).collect()
    ]
    assert digests[0] != digests[1]


def test_join_carries_digest_not_wide_row(spark):
    wide = spark.range(10).select(
        F.col("id"), *[(F.col("id") + i).cast("string").alias(f"c{i}") for i in range(8)]
    )
    out = snapshot_diff(wide, wide, "id")
    assert out.columns == ["key", "change"]
    opt = (
        out._jdf.queryExecution().optimizedPlan().toString()
    )
    join_idx = opt.find("Join FullOuter")
    assert join_idx >= 0
    # below the join each side is already reduced to (key, digest): the
    # wide columns feed md5 inside a Project, never cross the join as
    # standalone attributes
    join_cond_line = opt[join_idx : opt.index("\n", join_idx)]
    assert "c3" not in join_cond_line
