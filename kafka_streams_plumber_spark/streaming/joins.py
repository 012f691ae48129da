"""Stream-stream interval join — correlating two unbounded streams with
bounded state.

The reference is stateless one-topic-in/one-topic-out (SURVEY §2.6); a
Spark-native engine should expose the canonical Structured Streaming
join: key equality + an event-time interval condition, with watermarks
on BOTH sides so the state store can expire rows once no future match
can arrive. Without the time bound (or with only one watermark) the
streaming planner either rejects the join or must keep one side's state
forever — the interval is what makes the state O(watermark window), not
O(stream length).

The same call works on batch frames (watermarks are skipped, the plan is
an ordinary equi+range join), so batch backfills and golden tests use
identical code — the engine's source-agnostic-plan principle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str,
    watermark: str | tuple[str, str] | None = None,
    prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join left rows to right rows with equal keys whose timestamp lies
    in ``[left_ts - lower, left_ts + upper]``.

    ``watermark``: max lateness for state expiry — one string for both
    sides or a (left, right) pair; REQUIRED for streaming inputs (the
    planner needs it to bound state), skipped on batch frames. ``how``
    supports inner and left/right outer (outer emits nulls only after
    the watermark proves no match can arrive — standard semantics).

    Output: all left columns plus right non-key columns as
    ``{prefix}{name}`` (right key columns are redundant post-join).

    Scale: state per key is the rows inside the interval+watermark
    horizon; the join itself shuffles both streams on the key exactly
    like a batch equi-join — no nested loop, no cross product.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if isinstance(watermark, tuple):
        wl, wr = watermark
    else:
        wl = wr = watermark

    la = left
    ra = right
    if la.isStreaming or ra.isStreaming:
        if wl is None or wr is None:
            raise ValueError(
                "stream-stream interval join requires watermarks on both "
                "sides (state cannot be bounded without them)"
            )
    if la.isStreaming and wl:
        la = la.withWatermark(left_ts, wl)
    if ra.isStreaming and wr:
        ra = ra.withWatermark(right_ts, wr)

    la = la.alias("_sj_l")
    ra = ra.alias("_sj_r")
    cond = None
    for k in keys:
        c = F.col(f"_sj_l.{k}") == F.col(f"_sj_r.{k}")
        cond = c if cond is None else (cond & c)
    lo = F.col(f"_sj_l.{left_ts}") - F.expr(f"INTERVAL {lower}")
    hi = F.col(f"_sj_l.{left_ts}") + F.expr(f"INTERVAL {upper}")
    rts = F.col(f"_sj_r.{right_ts}")
    cond = cond & (rts >= lo) & (rts <= hi)

    joined = la.join(ra, cond, how)
    rpayload = [c for c in right.columns if c not in keys]
    return joined.select(
        *[F.col(f"_sj_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_sj_r.{c}").alias(f"{prefix}{c}") for c in rpayload],
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    *,
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Enrich a stream with a static/batch dimension table (the lookup
    side of almost every production pipeline: events x user profile,
    clicks x catalog).

    Stream-static joins need no watermark and keep NO state: every
    micro-batch plans a fresh join against the dim frame's CURRENT
    snapshot, so slowly-changing dimensions backed by a file source pick
    up updates between batches for free.

    ``broadcast=True`` (default) pins the dim side as a broadcast hash
    join: without it Spark may shuffle the STREAM side on the key —
    at production rates that re-keys the whole firehose every batch. Set
    False only when the dim is too large to broadcast (then pre-bucket
    it on the key instead — plans/scale.py:write_bucketed).
    """
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, on, how)
