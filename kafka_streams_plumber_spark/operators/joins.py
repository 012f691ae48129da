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
) -> DataFrame:
    """For every left row, attach the latest right row with the same key
    whose timestamp is <= (``strict``: <) the left row's timestamp.

    Returns all left columns plus each right non-key, non-ts column as
    ``{prefix}{name}`` (null when no prior right row exists — i.e. LEFT
    asof semantics, matching DuckDB's ``ASOF LEFT JOIN``).

    Plan: tag and union both sides, then one ``last(ignorenulls)`` window
    per right payload column over (key) ordered by (ts, side) — right
    rows sort before left rows at equal timestamps unless ``strict``.
    Exactly one hash-partition shuffle on the key; everything else is
    per-partition sort + scan inside codegen.
    """
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
    # lefts sort first.
    side_order = F.col("_side").asc() if not strict else F.col("_side").desc()
    w = (
        Window.partitionBy(*[f"_k_{k}" for k in keys])
        .orderBy(F.col("_ts").asc(), side_order)
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
    bucket: Column | None = None,
) -> DataFrame:
    """Interval join: left rows matched to right intervals
    [right_start, right_end) with equal keys.

    Without help Spark plans a key-equi join plus a post-filter, which is
    fine when keys are selective. When they aren't (few keys, many
    intervals), pass ``bucket`` — a Column expression mapping a timestamp
    to a coarse bucket id (e.g. ``F.window``-style epoch-div) — and the
    intervals are exploded over their covered buckets so the join key
    becomes (key, bucket): the classic bucketed range join that keeps the
    shuffle equi-keyed at scale.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    cond = [left[k] == right[k] for k in keys] + [
        left[left_ts] >= right[right_start],
        left[left_ts] < right[right_end],
    ]
    out_cond = cond[0]
    for c in cond[1:]:
        out_cond = out_cond & c
    return left.join(right, out_cond)
