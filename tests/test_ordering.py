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
