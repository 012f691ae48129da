"""Continual-ingestion dedup (streaming/ingest.py): cross-batch index
growth, in-batch dedup, replay safety, streaming end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.streaming.ingest import ingest_batch_fn
from kafka_streams_plumber_spark.streaming.sinks import start_foreach_batch

TXT = "the quick brown fox jumps over the lazy dog wearing number %d"


def _batch(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "doc_id long, text string")


def _corpus_ids(spark, corpus):
    return sorted(
        r["doc_id"] for r in spark.read.parquet(str(corpus)).collect()
    )


def test_batches_dedup_against_grown_index(spark, tmp_path):
    corpus, index = tmp_path / "corpus", tmp_path / "index"
    fn = ingest_batch_fn(str(corpus), str(index), threshold=0.9)

    fn(_batch(spark, [(1, TXT % 1), (2, TXT % 2)]), 0)
    # batch 1: doc 3 copies doc 1 (indexed) -> dropped; doc 4 new
    fn(_batch(spark, [(3, TXT % 1), (4, TXT % 4)]), 1)
    # batch 2: doc 5 copies doc 4 (indexed by batch 1) -> dropped
    fn(_batch(spark, [(5, TXT % 4), (6, TXT % 6)]), 2)

    assert _corpus_ids(spark, corpus) == [1, 2, 4, 6]
    idx = spark.read.parquet(str(index))
    assert sorted(r["id"] for r in idx.collect()) == [1, 2, 4, 6]


def test_in_batch_duplicates_collapse_before_index_check(spark, tmp_path):
    corpus, index = tmp_path / "corpus", tmp_path / "index"
    fn = ingest_batch_fn(str(corpus), str(index), threshold=0.9)
    # two copies arriving in the same batch: exactly one survives
    fn(_batch(spark, [(7, TXT % 7), (8, TXT % 7)]), 0)
    assert _corpus_ids(spark, corpus) == [7]


def test_replay_is_idempotent(spark, tmp_path):
    corpus, index = tmp_path / "corpus", tmp_path / "index"
    fn = ingest_batch_fn(str(corpus), str(index), threshold=0.9)
    fn(_batch(spark, [(1, TXT % 1)]), 0)
    fn(_batch(spark, [(2, TXT % 2)]), 1)
    # crash-replay of batch 1 with the same data: its own signatures are
    # already in the index, but the batch_id guard hides them -> doc 2
    # survives again, corpus/index unchanged (not emptied, not doubled)
    fn(_batch(spark, [(2, TXT % 2)]), 1)
    assert _corpus_ids(spark, corpus) == [1, 2]
    assert spark.read.parquet(str(index)).count() == 2


def test_streaming_end_to_end(spark, tmp_path):
    src = tmp_path / "in"
    corpus, index = tmp_path / "corpus", tmp_path / "index"
    _batch(spark, [(1, TXT % 1), (2, TXT % 1)]).write.parquet(
        str(src / "a"), mode="overwrite"
    )
    q = start_foreach_batch(
        spark.readStream.schema("doc_id long, text string").parquet(
            str(src / "*")
        ),
        ingest_batch_fn(str(corpus), str(index), threshold=0.9),
        checkpoint=str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(120)
    assert _corpus_ids(spark, corpus) == [1]

    # second file arrives; a restarted availableNow run picks it up and
    # dedups against the on-disk index from the first run
    _batch(spark, [(3, TXT % 1), (4, TXT % 4)]).write.parquet(
        str(src / "b"), mode="overwrite"
    )
    q2 = start_foreach_batch(
        spark.readStream.schema("doc_id long, text string").parquet(
            str(src / "*")
        ),
        ingest_batch_fn(str(corpus), str(index), threshold=0.9),
        checkpoint=str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q2.awaitTermination(120)
    assert _corpus_ids(spark, corpus) == [1, 4]
