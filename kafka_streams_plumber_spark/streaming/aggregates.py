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
) -> None:
    """Rewrite all existing partials as ONE merged partial under
    ``batch_id=into_batch_id`` (default -1, below any real batch id so
    it never collides with a replay). Run periodically when the
    partial count grows; readers are unaffected before/after because
    merge is associative."""
    merged = read_aggregates(
        spark, path, group_cols, sums=sums, mins=mins, maxs=maxs
    )
    staged = merged.withColumn("batch_id", F.lit(int(into_batch_id)))
    # localCheckpoint SEVERS lineage from the source files before the
    # overwrite (a cache could still recompute a lost partition from
    # the path being overwritten — checkpointed blocks cannot)
    staged = staged.localCheckpoint(eager=True)
    staged.write.mode("overwrite").partitionBy("batch_id").parquet(path)
