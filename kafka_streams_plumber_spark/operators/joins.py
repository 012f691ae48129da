"""Temporal join operators the reference lacks but a Spark-native engine
should ship: as-of join and range (interval) join.

The reference (rollulus/kafka-streams-plumber) has no joins at all — its
operator vocabulary is filter/map/mapValues
(StreamProcessOperations.scala:18-20). These exist for the
training-data-pipeline surface: aligning events to the latest prior
state snapshot (feature backfill), sessioned range lookups, etc.

Scale design: ``asof_join`` is the union + per-key ordered window
formulation — ONE shuffle on the join key, no range-explode, no
broadcast requirement on either side, and skew behaves like any window
(a hot key serializes only its own partition slice). The naive
alternative (theta-join on ``l.ts >= r.ts`` then argmax) is a quadratic
blow-up the optimizer cannot save at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    ts: str,
    right_ts: str | None = None,
    prefix: str = "r_",
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the nearest right row with the same
    key: ``direction="backward"`` (default) takes the latest right row
    with timestamp <= (``strict``: <) the left's; ``"forward"`` takes
    the earliest right row with timestamp >= (``strict``: >) the left's
    — pandas ``merge_asof`` directions, DuckDB ``ASOF JOIN`` with the
    matching inequality.

    Returns all left columns plus each right non-key, non-ts column as
    ``{prefix}{name}`` (null when no match exists — i.e. LEFT asof
    semantics, matching DuckDB's ``ASOF LEFT JOIN``).

    Plan: tag and union both sides, then one ``last(ignorenulls)`` window
    per right payload column over (key) ordered by (ts, side) — right
    rows sort before left rows at equal timestamps unless ``strict``;
    ``forward`` simply flips the time ordering, nothing else. Exactly
    one hash-partition shuffle on the key; everything else is
    per-partition sort + scan inside codegen.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or ts

    # the matched right row's own timestamp is part of the result
    # (mirrors DuckDB ASOF JOIN output), so it rides along as payload
    payload = [c for c in right.columns if c not in (*keys, rts)] + [rts]
    lcols = left.columns

    lhs = left.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
    )
    rhs = right.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        F.col(rts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            lhs.schema["_l"].dataType
        ).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )

    # At equal timestamps: side 0 (right) first so lefts see it — unless
    # strict, where rights at the same instant must NOT be visible, so
    # lefts sort first. Forward direction walks time backwards, making
    # "last seen" mean "earliest following" — the equal-ts rule is
    # unchanged.
    side_order = F.col("_side").asc() if not strict else F.col("_side").desc()
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*[f"_k_{k}" for k in keys])
        .orderBy(ts_order, side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    filled = lhs.unionByName(rhs).select(
        "_side",
        "_l",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_r_{c}")
            for c in payload
        ],
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        *[F.col(f"_r_{c}").alias(f"{prefix}{c}") for c in payload],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str] | None,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket: float | int | Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Interval join: left rows matched to right intervals
    [right_start, right_end) with equal keys.

    Without ``bucket`` Spark plans a key-equi join plus a range
    post-filter — fine when keys are selective, or when the interval side
    is a small broadcast dim (a BroadcastNestedLoopJoin over a handful of
    rows is the cheapest possible plan). When keys are NOT selective and
    the interval side is large, that degenerates into a near-cross join,
    so pass ``bucket``:

    - a number: bucket width in the timestamp's units
      (``bucket_id = floor(ts / bucket)``), or
    - a callable ``Column -> Column`` mapping a timestamp to a coarse
      bucket id (for non-numeric timestamps).

    Each right interval is exploded over ``sequence(bucket_id(start),
    bucket_id(end))`` and the join key becomes ``(*keys, bucket_id)`` —
    the classic bucketed range join: the shuffle stays equi-keyed (sort-
    merge / shuffled-hash, never a nested-loop), the range condition runs
    as a post-filter, and each matching pair meets in exactly one bucket
    (the left row's), so no dedup is needed. Pick ``bucket`` near the
    median interval length: much smaller multiplies the explode factor,
    much larger degrades toward the unbucketed join within each bucket.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))

    if bucket is None:
        cond = [left[k] == right[k] for k in keys] + [
            left[left_ts] >= right[right_start],
            left[left_ts] < right[right_end],
        ]
        out_cond = cond[0]
        for c in cond[1:]:
            out_cond = out_cond & c
        return left.join(right, out_cond)

    if callable(bucket):
        bucketize = bucket
    else:
        width = bucket

        def bucketize(c: Column) -> Column:
            return F.floor(c / F.lit(width))

    lb = left.withColumn("_rj_b", bucketize(F.col(left_ts)).cast("long"))
    # end bucket uses the inclusive bucket of right_end: with an exclusive
    # end this can over-cover by one empty bucket, which the post-filter
    # discards — cheaper than special-casing exact boundary alignment.
    rb = right.withColumn(
        "_rj_b",
        F.explode(
            F.sequence(
                bucketize(F.col(right_start)).cast("long"),
                bucketize(F.col(right_end)).cast("long"),
            )
        ),
    )
    la, ra = lb.alias("_rj_l"), rb.alias("_rj_r")
    cond = [F.col(f"_rj_l.{k}") == F.col(f"_rj_r.{k}") for k in keys]
    cond.append(F.col("_rj_l._rj_b") == F.col("_rj_r._rj_b"))
    cond.append(F.col(f"_rj_l.{left_ts}") >= F.col(f"_rj_r.{right_start}"))
    cond.append(F.col(f"_rj_l.{left_ts}") < F.col(f"_rj_r.{right_end}"))
    out_cond = cond[0]
    for c in cond[1:]:
        out_cond = out_cond & c
    return la.join(ra, out_cond).select(
        *[F.col(f"_rj_l.{c}") for c in left.columns],
        *[F.col(f"_rj_r.{c}") for c in right.columns],
    )
