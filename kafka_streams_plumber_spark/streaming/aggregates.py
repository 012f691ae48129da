"""Continual aggregate maintenance: exactly-once per-key rollups that
survive restarts — the streaming twin of a materialized GROUP BY.

An ingestion pipeline needs running per-key totals (docs and tokens
per source, events per user, bytes per domain) that (a) persist across
job restarts, (b) never double-count a replayed micro-batch, and
(c) stay mergeable so any batch job can read one small table. The
Structured-Streaming-native answer for parquet-only storage:

- each micro-batch computes its OWN partial aggregate (map-side
  combine collapses the batch to O(keys) rows),
- the partials land under ``batch_id=N`` partition directories with
  per-batch dynamic overwrite — a replayed batch rewrites its own
  partial instead of double-appending (the sinks.py idempotency
  pattern, checked by test_incremental.py's replay tests),
- readers merge partials with one SUM over the partial table — which
  is O(batches x keys) rows, compacted on demand by rewriting old
  partials into one (``compact_aggregates``).

Only algebraic aggregates (count/sum/min/max, and anything built from
them, e.g. mean = sum/count) fit this shape; holistic aggregates
(exact distinct) need the CMS/HLL sketches from operators/sketches.py,
which are also mergeable and slot into the same partial table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def aggregate_batch_fn(
    path: str,
    group_cols: list[str],
    aggs: dict[str, Column],
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function maintaining per-key partial aggregates at
    ``path``. ``aggs`` maps output column name -> aggregate expression
    (must be algebraic: count/sum/min/max family). Also directly
    callable with a static frame + manual batch id for backfill.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partial = batch_df.groupBy(*group_cols).agg(
            *[e.alias(n) for n, e in aggs.items()]
        )
        (
            partial.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    return write


def read_aggregates(
    spark,
    path: str,
    group_cols: list[str],
    *,
    sums: list[str] | None = None,
    mins: list[str] | None = None,
    maxs: list[str] | None = None,
) -> DataFrame:
    """Merge the partial table into current totals: one SUM/MIN/MAX
    over O(batches x keys) rows. Column lists say how each partial
    column merges (counts and sums both merge by SUM)."""
    df = spark.read.parquet(path)
    merged = [F.sum(c).alias(c) for c in (sums or [])]
    merged += [F.min(c).alias(c) for c in (mins or [])]
    merged += [F.max(c).alias(c) for c in (maxs or [])]
    return df.groupBy(*group_cols).agg(*merged)


def compact_aggregates(
    spark,
    path: str,
    group_cols: list[str],
    *,
    sums: list[str] | None = None,
    mins: list[str] | None = None,
    maxs: list[str] | None = None,
    into_batch_id: int = -1,
    keep_last: int = 1,
) -> None:
    """Merge old partials into ONE under ``batch_id=into_batch_id``
    (default -1, below any real batch id). Run periodically when the
    partial count grows; totals are unaffected because merge is
    associative.

    Replay safety: the newest ``keep_last`` batch partials are kept
    AS-IS, not folded into the merge — Structured Streaming may replay
    the latest uncommitted batch after a crash, and a replay is only
    idempotent while the partial it rewrites still exists as its own
    partition. Folding the tail in would double-count a replayed
    batch; keep_last=1 covers the single uncommitted batch a restart
    can redeliver (raise it if the checkpoint can lag further). Set
    keep_last=0 ONLY against a cleanly stopped stream.

    Run from the stream's maintenance window (the foreachBatch
    callback between batches, or while stopped): the rewrite is a
    read-then-overwrite of the same directory.
    """
    df = spark.read.parquet(path)
    ids = sorted(
        r["batch_id"] for r in df.select("batch_id").distinct().collect()
    )
    tail = set(i for i in ids if i >= 0)
    tail = set(sorted(tail)[len(tail) - keep_last :]) if keep_last else set()
    old = df.filter(~F.col("batch_id").isin(*tail) if tail else F.lit(True))
    merged = [F.sum(c).alias(c) for c in (sums or [])]
    merged += [F.min(c).alias(c) for c in (mins or [])]
    merged += [F.max(c).alias(c) for c in (maxs or [])]
    staged = (
        old.groupBy(*group_cols)
        .agg(*merged)
        .withColumn("batch_id", F.lit(int(into_batch_id)))
    )
    if tail:
        staged = staged.unionByName(df.filter(F.col("batch_id").isin(*tail)))
    # localCheckpoint SEVERS lineage from the source files before the
    # overwrite (a cache could still recompute a lost partition from
    # the path being overwritten — checkpointed blocks cannot)
    staged = staged.localCheckpoint(eager=True)
    (
        staged.write.mode("overwrite")
        # STATIC overwrite replaces the whole directory: under a
        # session-level dynamic partitionOverwriteMode only the
        # batch_id=-1 partition would be replaced and every old
        # partial would survive to be double-counted on read
        .option("partitionOverwriteMode", "static")
        .partitionBy("batch_id")
        .parquet(path)
    )
