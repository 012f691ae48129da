"""Multi-touch conversion attribution over event streams.

The revenue question behind every funnel (operators/behavior.py): when
a user converts, which earlier touch (channel) gets the credit?
Implements the three standard models:

- ``last_touch``  — full credit to the latest touch at-or-before the
  conversion (and within the lookback window when set);
- ``first_touch`` — full credit to the earliest touch in the window;
- ``linear``      — credit split evenly across every touch in the
  window.

Plan shapes (100 TB):

- first/last touch are ONE key-partitioned window pass over the event
  stream: a running ``first``/``last`` (ignorenulls) of the touch
  struct inside a per-user range frame — no join, no per-conversion
  fan-out; the only shuffle is the user-key partitioning.
- linear needs the per-conversion touch multiplicity, so it is one
  user-keyed equi-join (conversions x touches, range-gated) plus two
  map-combinable aggregates. Touches and conversions are both
  type-filtered BEFORE the join, so the shuffle carries only the
  relevant slices.

Determinism: attributed value sums run over scaled longs (``round(v *
1e6)`` then integer ``div`` for the linear split), the repo-wide
convention, so engine aggregation order cannot diverge.

Reference scope: beyond-reference training-data/analytics surface (the
reference is per-record only, StreamProcessOperations.scala:18-66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SCALE = 1_000_000


def attribute_conversions(
    events: DataFrame,
    *,
    conversion_type: str,
    touch_types: list[str],
    model: str = "last_touch",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    lookback_ms: int | None = None,
    conv_id_col: str | None = None,
) -> DataFrame:
    """Attribute each conversion's value to a touch channel.

    Returns ``(channel, conversions, attributed_value)`` — one row per
    touch channel that earned credit, plus a ``NULL`` channel row
    collecting conversions with no qualifying touch (organic/unmatched;
    kept so totals reconcile to the raw conversion sum). Ties on the
    touch timestamp break toward the channel later in ``touch_types``
    order for ``last_touch`` (and earlier for ``first_touch``) via a
    deterministic secondary sort on the type's list index.
    """
    if model not in ("last_touch", "first_touch", "linear"):
        raise ValueError("model must be last_touch | first_touch | linear")
    u, t, ts, v = user_col, type_col, ts_col, value_col
    tms = F.unix_millis(F.col(ts))
    sv = F.round(F.col(v) * _SCALE).cast("bigint")
    # deterministic tiebreaker: position of the type in touch_types
    pos = F.array_position(
        F.array(*[F.lit(x) for x in touch_types]), F.col(t)
    ).cast("int")

    if model == "linear":
        # conversion identity: an explicit id column when the stream has
        # one (recommended — exact under duplicate (user, ts) rows),
        # else the (user, ts) pair
        ck = (
            F.col(conv_id_col)
            if conv_id_col is not None
            else F.struct(F.col(u), tms)
        )
        conv = events.where(F.col(t) == conversion_type).select(
            F.col(u).alias("cu"), tms.alias("cts"), sv.alias("sv"), ck.alias("ck")
        )
        touch = events.where(F.col(t).isin(touch_types)).select(
            F.col(u).alias("cu"), tms.alias("tts"), F.col(t).alias("channel")
        )
        gate = F.col("tts") <= F.col("cts")
        if lookback_ms is not None:
            gate = gate & (F.col("tts") >= F.col("cts") - lookback_ms)
        pairs = conv.join(touch, "cu").where(gate)
        per_conv = pairs.groupBy("ck").agg(F.count(F.lit(1)).alias("n"))
        shares = (
            pairs.join(per_conv, "ck")
            .select(
                "channel",
                "ck",
                # exact integer split: div truncates toward zero on both
                # engines (values are scaled longs)
                F.expr("sv div n").alias("share"),
            )
        )
        credited = shares.groupBy("channel").agg(
            F.count_distinct("ck").alias("conversions"),
            F.sum("share").alias("ssum"),
        )
        organic = (
            conv.join(per_conv.select("ck"), "ck", "left_anti")
            .agg(
                F.count(F.lit(1)).alias("conversions"),
                F.coalesce(F.sum("sv"), F.lit(0)).alias("ssum"),
            )
            .where(F.col("conversions") > 0)
            .select(F.lit(None).cast("string").alias("channel"), "conversions", "ssum")
        )
        out = credited.unionAll(organic)
    else:
        is_conv = F.col(t) == conversion_type
        # struct comparison orders by (tts, pos): max -> latest touch,
        # ties to the LARGER list index; min -> earliest touch, ties to
        # the SMALLER list index — both deterministic
        touch_struct = F.when(
            F.col(t).isin(touch_types),
            F.struct(
                F.col("_tms").alias("tts"),
                pos.alias("pos"),
                F.col(t).alias("channel"),
            ),
        )
        base = events.where(is_conv | F.col(t).isin(touch_types)).select(
            F.col(u), F.col(t), tms.alias("_tms"), sv.alias("sv")
        )
        lo = Window.unboundedPreceding if lookback_ms is None else -lookback_ms
        w = (
            Window.partitionBy(u)
            .orderBy("_tms")
            .rangeBetween(lo, Window.currentRow)
        )
        pick = (
            F.max(touch_struct).over(w)
            if model == "last_touch"
            else F.min(touch_struct).over(w)
        )
        out = (
            base.withColumn("_pick", pick)
            .where(is_conv)
            .groupBy(F.col("_pick")["channel"].alias("channel"))
            .agg(
                F.count(F.lit(1)).alias("conversions"),
                F.sum("sv").alias("ssum"),
            )
        )
    return out.select(
        "channel",
        "conversions",
        F.round(F.col("ssum") / _SCALE, 6).alias("attributed_value"),
    )
