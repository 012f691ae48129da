"""Streaming CDC-upsert sink (streaming/upsert.py): fold semantics,
version chain, replay idempotence, time travel, streaming end-to-end."""

from __future__ import annotations

from kafka_streams_plumber_spark.streaming.sinks import start_foreach_batch
from kafka_streams_plumber_spark.streaming.upsert import (
    prune_versions,
    read_snapshot,
    upsert_batch_fn,
)

SCHEMA = "id long, v long, op string, name string"


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _snap(spark, path):
    return sorted(
        (r["id"], r["name"]) for r in read_snapshot(spark, str(path)).collect()
    )


def test_fold_chain_across_batches(spark, tmp_path):
    p = tmp_path / "snap"
    fn = upsert_batch_fn(str(p), "id", "v")
    fn(_batch(spark, [(1, 1, "U", "a"), (2, 1, "U", "b")]), 0)
    assert _snap(spark, p) == [(1, "a"), (2, "b")]
    # batch 1: update 1, delete 2, insert 3
    fn(
        _batch(spark, [(1, 2, "U", "a2"), (2, 2, "D", None), (3, 1, "U", "c")]),
        1,
    )
    assert _snap(spark, p) == [(1, "a2"), (3, "c")]


def test_latest_wins_within_one_batch(spark, tmp_path):
    p = tmp_path / "snap"
    fn = upsert_batch_fn(str(p), "id", "v")
    fn(_batch(spark, [(1, 1, "U", "old"), (1, 5, "U", "new"), (1, 3, "U", "mid")]), 0)
    assert _snap(spark, p) == [(1, "new")]


def test_replay_is_idempotent(spark, tmp_path):
    p = tmp_path / "snap"
    fn = upsert_batch_fn(str(p), "id", "v")
    fn(_batch(spark, [(1, 1, "U", "a")]), 0)
    b1 = [(1, 2, "U", "a2"), (4, 1, "U", "d")]
    fn(_batch(spark, b1), 1)
    before = _snap(spark, p)
    fn(_batch(spark, b1), 1)  # crash/replay of batch 1
    assert _snap(spark, p) == before == [(1, "a2"), (4, "d")]


def test_time_travel_and_prune(spark, tmp_path):
    p = tmp_path / "snap"
    fn = upsert_batch_fn(str(p), "id", "v")
    fn(_batch(spark, [(1, 1, "U", "a")]), 0)
    fn(_batch(spark, [(1, 2, "U", "a2")]), 1)
    fn(_batch(spark, [(1, 3, "D", None)]), 2)
    # as-of batch 1
    old = spark.read.parquet(f"{p}/v=1")
    assert [(r["id"], r["name"]) for r in old.collect()] == [(1, "a2")]
    assert _snap(spark, p) == []
    pruned = prune_versions(str(p), keep_last=1)
    assert pruned == [0, 1]
    assert _snap(spark, p) == []  # latest survives pruning


def test_streaming_end_to_end(spark, tmp_path):
    src, p, ckpt = tmp_path / "src", tmp_path / "snap", tmp_path / "ckpt"
    _batch(spark, [(1, 1, "U", "a"), (2, 1, "U", "b"), (2, 2, "D", None)]).write.parquet(
        str(src)
    )
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = start_foreach_batch(
        stream,
        upsert_batch_fn(str(p), "id", "v"),
        checkpoint=str(ckpt),
        trigger_once=True,
    )
    q.awaitTermination(120)
    assert _snap(spark, p) == [(1, "a")]
