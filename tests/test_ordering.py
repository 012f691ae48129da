"""operators/ordering.py — deterministic global permutation + sharding."""

from __future__ import annotations

from kafka_streams_plumber_spark.operators.ordering import (
    epoch_shards,
    global_order,
)


def test_global_order_is_a_permutation(spark):
    df = spark.range(500).withColumnRenamed("id", "doc_id").repartition(7)
    out = global_order(df, "doc_id", seed=1, pos_col="pos")
    pos = sorted(r["pos"] for r in out.collect())
    assert pos == list(range(500))


def test_global_order_deterministic_across_partitionings(spark):
    df1 = spark.range(300).withColumnRenamed("id", "doc_id").repartition(3)
    df2 = spark.range(300).withColumnRenamed("id", "doc_id").repartition(11)
    a = {r["doc_id"]: r["pos"] for r in global_order(df1, "doc_id", seed=9).collect()}
    b = {r["doc_id"]: r["pos"] for r in global_order(df2, "doc_id", seed=9).collect()}
    assert a == b


def test_global_order_seed_changes_permutation(spark):
    df = spark.range(300).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["pos"] for r in global_order(df, "doc_id", seed=1).collect()}
    b = {r["doc_id"]: r["pos"] for r in global_order(df, "doc_id", seed=2).collect()}
    assert a != b
    assert sorted(a.values()) == sorted(b.values())


def test_epoch_shards_balanced_and_consistent(spark):
    df = spark.range(501).withColumnRenamed("id", "doc_id").repartition(5)
    out = epoch_shards(df, "doc_id", n_shards=8, seed=3).collect()
    sizes = {}
    for r in out:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
    # 501 rows over 8 round-robin shards: sizes differ by at most 1
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sum(sizes.values()) == 501
    # interleaving shards by (pos_in_shard, shard) reconstructs the
    # global permutation
    glob = {
        r["doc_id"]: r["pos"]
        for r in global_order(df, "doc_id", seed=3, pos_col="pos").collect()
    }
    for r in out:
        assert glob[r["doc_id"]] == r["pos_in_shard"] * 8 + r["shard"]


def test_rank_by_matches_row_number(spark):
    from pyspark.sql import functions as F

    from kafka_streams_plumber_spark.operators.ordering import rank_by

    df = spark.createDataFrame(
        [(i, (i * 37) % 50) for i in range(200)], ["id", "v"]
    )
    got = {r["id"]: r["pos"] for r in rank_by(df, ["v", "id"]).collect()}
    expect = {
        r["id"]: r["rn"]
        for r in df.selectExpr(
            "id", "row_number() OVER (ORDER BY v, id) - 1 AS rn"
        ).collect()
    }
    assert got == expect


def test_rank_normalize_bounds_and_mean(spark):
    from kafka_streams_plumber_spark.operators.ordering import rank_normalize

    df = spark.createDataFrame(
        [(i, float(i), float(100 - i)) for i in range(101)], ["id", "a", "b"]
    )
    out = {r["id"]: r for r in rank_normalize(df, "id", ["a", "b"]).collect()}
    # a and b are perfectly anti-correlated: every composite is 0.5
    assert all(abs(r["quality"] - 0.5) < 1e-12 for r in out.values())
    assert out[0]["a_rank"] == 0 and out[0]["b_rank"] == 100
    assert out[100]["a_rank"] == 100 and out[100]["b_rank"] == 0
