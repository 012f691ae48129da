"""Streaming deduplication — exact dedup over an unbounded stream with
bounded state.

Batch exact dedup (operators/dedup.py:exact_dedup) has no state problem;
on a stream, "have I seen this key" state grows forever unless bounded.
``streaming_dedup`` uses the event-time watermark to expire state: a
duplicate arriving within ``delay`` of the original is dropped, one
arriving later than the watermark may reappear — the standard
correctness/state tradeoff, stated explicitly instead of OOMing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    *,
    ts_col: str | None = None,
    delay: str | None = None,
) -> DataFrame:
    """Drop duplicate records by ``keys``.

    With ``ts_col`` + ``delay`` (streaming): watermark-bounded state via
    ``dropDuplicatesWithinWatermark`` — duplicates within the delay
    window are suppressed, state for keys older than the watermark is
    dropped. Without them (batch, or streams where keys are globally
    unique after a bounded horizon): plain ``dropDuplicates`` —
    unbounded state on a stream, so prefer the bounded form there.
    """
    if ts_col is not None and delay is not None:
        bounded = df.withWatermark(ts_col, delay)
        if bounded.isStreaming:
            return bounded.dropDuplicatesWithinWatermark(keys)
        return bounded.dropDuplicates(keys)
    return df.dropDuplicates(keys)
