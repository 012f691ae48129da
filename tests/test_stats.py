"""exact_percentiles: bit-parity with the builtin percentile aggregate,
edge cases (integral index, single row, nulls, multi-group-col)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.stats import exact_percentiles


def test_matches_builtin_percentile(spark):
    df = spark.range(0, 10007).select(
        (F.col("id") % 3).alias("g"),
        (F.sin(F.col("id")) * 1000).alias("v"),
    )
    builtin = {
        r["g"]: (r["p25"], r["p50"], r["p999"])
        for r in df.groupBy("g")
        .agg(
            F.percentile("v", 0.25).alias("p25"),
            F.percentile("v", 0.5).alias("p50"),
            F.percentile("v", 0.999).alias("p999"),
        )
        .collect()
    }
    ours = {
        r["g"]: (r["p25"], r["p50"], r["p999"])
        for r in exact_percentiles(
            df, "g", "v", {"p25": 0.25, "p50": 0.5, "p999": 0.999}
        ).collect()
    }
    assert ours == builtin  # bit-for-bit


def test_integral_index_and_single_row(spark):
    # 5 rows: p=0.5 lands exactly on index 2 (integral — no interpolation)
    df = spark.createDataFrame([(1, float(v)) for v in (10, 20, 30, 40, 50)], "g int, v double")
    out = exact_percentiles(df, "g", "v", {"p50": 0.5}).collect()[0]
    assert out["p50"] == 30.0
    one = spark.createDataFrame([(1, 42.0)], "g int, v double")
    assert exact_percentiles(one, "g", "v", {"p50": 0.5}).collect()[0]["p50"] == 42.0


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1, None), (1, 1.0), (1, 3.0)], "g int, v double"
    )
    out = exact_percentiles(df, "g", "v", {"p50": 0.5}).collect()[0]
    assert out["p50"] == 2.0  # interpolated over the 2 non-null rows


def test_multiple_group_cols(spark):
    df = spark.createDataFrame(
        [(1, "x", 1.0), (1, "x", 3.0), (1, "y", 10.0)], "a int, b string, v double"
    )
    rows = {
        (r["a"], r["b"]): r["p50"]
        for r in exact_percentiles(df, ["a", "b"], "v", {"p50": 0.5}).collect()
    }
    assert rows == {(1, "x"): 2.0, (1, "y"): 10.0}


def test_topk_per_group_matches_single_window(spark):
    from kafka_streams_plumber_spark.operators.stats import topk_per_group
    from pyspark.sql import Window
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(g, v) for g in ("a", "b") for v in (5, 3, 9, 9, 1, 7)], "g string, v int"
    ).repartition(4)
    got = sorted(
        (r["g"], r["v"], r["rnk"])
        for r in topk_per_group(df, "g", [F.desc("v")], 2).collect()
    )
    w = Window.partitionBy("g").orderBy(F.desc("v"))
    want = sorted(
        (r["g"], r["v"], r["rnk"])
        for r in df.withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 2).collect()
    )
    assert got == want
    # ties at the boundary survive (two 9 rows at rank 1 per group)
    assert sum(1 for g, v, r in got if g == "a" and r == 1) == 2
