"""Continual-ingestion dedup: a streaming front door for the corpus.

Combines the batch machinery into the shape a production training-data
pipeline actually runs: documents arrive as a stream; each micro-batch
is near-dup-checked against the PERSISTED signature index
(operators/dedup.py:build_minhash_index), survivors append to the corpus
and their signatures append to the index — so the next batch (and the
next run, after restarts) dedups against everything accepted so far.

Exactly-once story: both writes land under ``batch_id=N`` directories
with per-batch overwrite (sinks.partitioned_parquet_sink's idempotency
pattern), so a replayed batch rewrites its own output instead of
double-appending. Within one batch, new-vs-new duplicates are removed
first (minhash_dedup), then new-vs-index (incremental_minhash_dedup).

State lives entirely in parquet — no driver memory grows with corpus
size, restarts resume from the checkpoint + on-disk index, and the
index is the same table batch jobs build, so batch bootstrap + streaming
tail is one index.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame

from kafka_streams_plumber_spark.operators.dedup import (
    build_minhash_index,
    incremental_minhash_dedup,
    minhash_dedup,
)


def ingest_batch_fn(
    corpus_path: str,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **minhash_kwargs,
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch function. Also directly usable for batch
    backfill (call it with a static DataFrame and a manual batch id)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        # in-batch dedup first: two copies arriving together must not
        # both pass the (not-yet-updated) index check
        fresh = minhash_dedup(batch_df, text_col, id_col, **minhash_kwargs)
        if os.path.isdir(index_path) and any(
            f.startswith("batch_id=") for f in os.listdir(index_path)
        ):
            # batch_id partition filter is the replay guard: a restarted
            # batch N must not see the signatures its crashed attempt
            # already wrote (it would flag its own docs as duplicates),
            # so only strictly-older batches participate.
            index = (
                spark.read.parquet(index_path)
                .filter(F.col("batch_id") < batch_id)
                .select("id", "sig")
            )
            fresh = incremental_minhash_dedup(
                fresh, index, text_col, id_col, **minhash_kwargs
            )
        # freeze survivors once: both writes below and the index build
        # must see the same rows
        fresh = fresh.localCheckpoint(eager=True)
        fresh.write.mode("overwrite").parquet(
            f"{corpus_path}/batch_id={batch_id}"
        )
        sigs = build_minhash_index(
            fresh,
            text_col,
            id_col,
            **{
                k: v
                for k, v in minhash_kwargs.items()
                if k in ("num_perm", "shingle_k", "seed")
            },
        )
        sigs.write.mode("overwrite").parquet(
            f"{index_path}/batch_id={batch_id}"
        )

    return write
