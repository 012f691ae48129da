"""Continual aggregate maintenance (streaming/aggregates.py):
exactly-once partials, replay safety, compaction invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.streaming.aggregates import (
    aggregate_batch_fn,
    compact_aggregates,
    read_aggregates,
)

def _aggs():
    return {
        "n_docs": F.count(F.lit(1)),
        "total_chars": F.sum("n_chars"),
        "max_chars": F.max("n_chars"),
    }


def _batch(spark, rows):
    return spark.createDataFrame(rows, ["source", "n_chars"])


def _totals(spark, path):
    return {
        r["source"]: r
        for r in read_aggregates(
            spark,
            path,
            ["source"],
            sums=["n_docs", "total_chars"],
            maxs=["max_chars"],
        ).collect()
    }


def test_partials_accumulate_across_batches(spark, tmp_path):
    path = str(tmp_path / "agg")
    fn = aggregate_batch_fn(path, ["source"], _aggs())
    fn(_batch(spark, [("a", 10), ("a", 20), ("b", 5)]), 0)
    fn(_batch(spark, [("a", 30), ("c", 1)]), 1)
    t = _totals(spark, path)
    assert t["a"]["n_docs"] == 3 and t["a"]["total_chars"] == 60
    assert t["a"]["max_chars"] == 30
    assert t["b"]["n_docs"] == 1 and t["c"]["total_chars"] == 1


def test_replayed_batch_does_not_double_count(spark, tmp_path):
    path = str(tmp_path / "agg")
    fn = aggregate_batch_fn(path, ["source"], _aggs())
    fn(_batch(spark, [("a", 10)]), 0)
    fn(_batch(spark, [("a", 99), ("b", 7)]), 1)
    fn(_batch(spark, [("a", 99), ("b", 7)]), 1)  # replay of batch 1
    t = _totals(spark, path)
    assert t["a"]["n_docs"] == 2 and t["a"]["total_chars"] == 109
    assert t["b"]["n_docs"] == 1


def test_compaction_preserves_totals(spark, tmp_path):
    import glob

    path = str(tmp_path / "agg")
    fn = aggregate_batch_fn(path, ["source"], _aggs())
    for i in range(5):
        fn(_batch(spark, [("a", i), ("b", 2 * i)]), i)
    before = _totals(spark, path)
    compact_aggregates(
        spark,
        path,
        ["source"],
        sums=["n_docs", "total_chars"],
        maxs=["max_chars"],
    )
    after = _totals(spark, path)
    for k in before:
        for c in ["n_docs", "total_chars", "max_chars"]:
            assert before[k][c] == after[k][c], (k, c)
    # merged partial + the keep_last=1 replay-guard tail partial
    assert sorted(glob.glob(f"{path}/batch_id=*")) == [
        f"{path}/batch_id=-1",
        f"{path}/batch_id=4",
    ]
    # a post-compaction batch keeps accumulating
    fn(_batch(spark, [("a", 100)]), 5)
    t = _totals(spark, path)
    assert t["a"]["n_docs"] == before["a"]["n_docs"] + 1


def test_compaction_keeps_replay_idempotent_for_tail_batch(spark, tmp_path):
    path = str(tmp_path / "agg")
    fn = aggregate_batch_fn(path, ["source"], _aggs())
    fn(_batch(spark, [("a", 1)]), 0)
    fn(_batch(spark, [("a", 2)]), 1)  # latest batch: may be replayed
    compact_aggregates(
        spark, path, ["source"],
        sums=["n_docs", "total_chars"], maxs=["max_chars"],
    )
    fn(_batch(spark, [("a", 2)]), 1)  # crash-replay of batch 1
    t = _totals(spark, path)
    assert t["a"]["n_docs"] == 2 and t["a"]["total_chars"] == 3
