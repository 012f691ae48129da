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


def test_profile_columns_single_pass_stats(spark):
    from kafka_streams_plumber_spark.operators.diff import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], ["id", "v"]
    )
    p = {r["column"]: r for r in profile_columns(df).collect()}
    assert p["id"]["n_rows"] == 3 and p["id"]["n_nulls"] == 0
    assert p["v"]["n_nulls"] == 1
    assert p["id"]["min_str"] == "1" and p["id"]["max_str"] == "3"


def test_audit_schema_drift_reports_each_issue_kind(spark):
    from kafka_streams_plumber_spark.operators.diff import audit_schema_drift

    old = spark.createDataFrame([(1, "x", 2.0)], ["id", "a", "b"])
    new = spark.createDataFrame([(1, 5, "y")], ["id", "a", "c"])
    issues = {
        (r["column"], r["issue"]) for r in audit_schema_drift(old, new).collect()
    }
    assert ("b", "removed") in issues
    assert ("c", "added") in issues
    assert ("a", "type_changed") in issues


def test_audit_schema_drift_null_rate_jump_threshold(spark):
    from pyspark.sql import functions as F

    from kafka_streams_plumber_spark.operators.diff import audit_schema_drift

    old = spark.range(100).select("id", F.lit("v").alias("a"))
    new = spark.range(100).select(
        "id", F.when(F.col("id") < 30, None).otherwise(F.lit("v")).alias("a")
    )
    got = audit_schema_drift(old, new, null_rate_jump=0.10).collect()
    assert [(r["column"], r["issue"]) for r in got] == [("a", "null_rate_jump")]
    assert audit_schema_drift(old, new, null_rate_jump=0.50).count() == 0


def test_psi_zero_for_identical_distributions(spark):
    from kafka_streams_plumber_spark.operators.diff import population_stability

    df = spark.range(1000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    r = population_stability(df, df, "v", bins=10, lo=0.0, hi=100.0).collect()[0]
    assert r["psi"] == 0.0


def test_psi_grows_with_shift(spark):
    from pyspark.sql import functions as F

    from kafka_streams_plumber_spark.operators.diff import population_stability

    old = spark.range(2000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    mild = old.select((F.col("v") + 5).alias("v"))
    wild = old.select((F.col("v") * 3).alias("v"))
    p_mild = population_stability(old, mild, "v", bins=10, lo=0.0, hi=100.0).collect()[0]["psi"]
    p_wild = population_stability(old, wild, "v", bins=10, lo=0.0, hi=100.0).collect()[0]["psi"]
    assert 0 < p_mild < p_wild
    assert p_wild > 0.25  # "investigate" territory


def test_categorical_psi_detects_new_category(spark):
    from pyspark.sql import functions as F

    from kafka_streams_plumber_spark.operators.diff import categorical_stability

    old = spark.range(1000).select((F.col("id") % 4).cast("string").alias("c"))
    same = categorical_stability(old, old, "c").collect()[0]
    assert same["psi"] == 0.0 and same["n_categories"] == 4
    new = spark.range(1000).select(
        F.when(F.col("id") % 10 == 0, "NEW")
        .otherwise((F.col("id") % 4).cast("string"))
        .alias("c")
    )
    drift = categorical_stability(old, new, "c").collect()[0]
    assert drift["psi"] > 0.25 and drift["n_categories"] == 5
