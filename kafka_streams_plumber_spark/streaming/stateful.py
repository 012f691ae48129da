"""Custom stateful operators — the capability tier above the reference
(which is stateless-only, SURVEY §2.6), built the Structured-Streaming-
native way.

- :func:`sessionize_batch` — gap-based sessionization as pure window
  expressions (lag + conditional cumsum). One shuffle on the user key;
  SQL-expressible, so it doubles as the oracle-checked batch analog.
- :func:`sessionize_stream` — the same semantics on an unbounded stream
  via ``applyInPandasWithState`` (GroupState timeouts): per-user state
  holds the open session; an event past the gap closes and emits it.
  Watermark-driven timeout emits sessions that never see another event.
- :func:`funnel_stream` — exact any-chain windowed funnel progress on a
  stream: per-user merged-interval state (bounded), emits on each new
  stage reached; the unbounded twin of operators/behavior.funnel.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
    ]
)

_STATE_SCHEMA = (
    "session_id LONG, n_events LONG, start_ms LONG, end_ms LONG"
)


def sessionize_batch(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Assign gap-based sessions and roll them up, batch-side.

    A session breaks when the time since the previous event of the same
    user exceeds ``gap_ms``. session_id is the 0-based break count —
    deterministic given (user, ts, tiebreak) ordering.
    """
    # cast: tolerate TIMESTAMP_NTZ inputs (no-op for TimestampType; under
    # a UTC session timeZone NTZ wall clock is reinterpreted as UTC)
    ts_ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(ts_ms)
    gap_break = (
        (ts_ms - F.lag(ts_ms).over(w) > gap_ms).cast("long")
    )
    with_sid = events.select(
        F.col(user_col).alias("user_id"),
        ts_ms.alias("_ts_ms"),
        F.coalesce(gap_break, F.lit(0)).alias("_brk"),
    ).withColumn(
        "session_id",
        F.sum("_brk").over(
            Window.partitionBy("user_id").orderBy("_ts_ms").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    return with_sid.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("_ts_ms").alias("start_ms"),
        F.max("_ts_ms").alias("end_ms"),
    )


def session_window_agg(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap sessionization via the BUILT-IN ``F.session_window`` — the
    idiomatic path when per-session aggregates suffice.

    Spark's native session store handles window merging and
    watermark-driven eviction in the JVM (no Python state hop), so this
    beats :func:`sessionize_stream` whenever you don't need custom
    per-event logic or ordinal session ids. Semantics note: windows
    merge while the inter-event gap is <= ``gap`` (break only strictly
    past it — same rule as ``sessionize_batch``), and ``end`` extends
    ``gap`` past the last event (builtin contract; ``sessionize_batch``
    reports the last event itself as ``end_ms``).

    Works identically on batch and streaming frames; the watermark is
    applied only when streaming.
    """
    # cast BEFORE the watermark: grouping on a cast of the watermarked
    # column would detach the watermark and append mode would refuse
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.col(user_col).alias("user_id"),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start").cast("timestamp")).alias("start_ms"),
            F.unix_millis(F.col("w.end").cast("timestamp")).alias("end_ms"),
            "n_events",
        )
    )


def sessionize_stream(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization with per-user GroupState.

    Emits a session row when (a) a new event arrives past the gap, or
    (b) the state times out past the watermark. Event-time ordering
    within a microbatch is handled by sorting the group's batch.
    """

    def fn(
        key: tuple, pdfs: Iterator, state: GroupState
    ) -> Iterator:
        import pandas as pd

        (user,) = key
        if state.hasTimedOut:
            sid, n, start, end = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user,
                        "session_id": sid,
                        "n_events": n,
                        "start_ms": start,
                        "end_ms": end,
                    }
                ]
            )
            return

        ts_all = []
        for pdf in pdfs:
            ts_all.extend(int(t.value // 1_000_000) for t in pd.to_datetime(pdf[ts_col]))
        ts_all.sort()
        if state.exists:
            sid, n, start, end = state.get
        else:
            sid, n, start, end = 0, 0, None, None

        out = []
        for t in ts_all:
            if start is None:
                n, start, end = 1, t, t
            elif t - end > gap_ms:
                out.append((user, sid, n, start, end))
                sid, n, start, end = sid + 1, 1, t, t
            else:
                n, end = n + 1, t
        state.update((sid, n, start, end))
        state.setTimeoutTimestamp(end + gap_ms)
        if out:
            yield pd.DataFrame(
                [
                    {
                        "user_id": u,
                        "session_id": s,
                        "n_events": c,
                        "start_ms": st,
                        "end_ms": e,
                    }
                    for (u, s, c, st, e) in out
                ]
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


DECAY_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("rate", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

_DECAY_STATE_SCHEMA = "last_ms LONG, rate DOUBLE, n_seen LONG"


def decayed_rate_stream(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    weight_col: str | None = None,
    half_life_ms: int = 60 * 60 * 1000,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-key exponentially-decayed counter (trending / rate tracking).

    On each event the counter decays by ``0.5 ** (dt / half_life_ms)``
    then adds the event's weight (1.0, or ``weight_col``) — the
    streaming "how hot is this key right now" signal behind trending-
    topic and abuse-rate detection. Not expressible with built-in
    windowed aggregation: the decay depends on the inter-arrival gap,
    which is per-key running state. Emits one row per (key, event) in
    event-time order within the batch; state is one (ts, double, long)
    triple per key, dropped after a watermark-driven timeout.

    Capability tier above the reference (stateless-only, SURVEY §2.6);
    same GroupState pattern as :func:`sessionize_stream`.
    """

    def fn(key: tuple, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        (k,) = key
        if state.hasTimedOut:
            state.remove()
            return

        rows = []
        for pdf in pdfs:
            w = (
                pdf[weight_col].astype(float).tolist()
                if weight_col
                else [1.0] * len(pdf)
            )
            ts = [int(t.value // 1_000_000) for t in pd.to_datetime(pdf[ts_col])]
            rows.extend(zip(ts, w))
        rows.sort(key=lambda r: r[0])

        if state.exists:
            last_ms, rate, n_seen = state.get
        else:
            last_ms, rate, n_seen = None, 0.0, 0

        out = []
        for t, w in rows:
            if last_ms is not None:
                rate *= 0.5 ** ((t - last_ms) / half_life_ms)
            rate += w
            last_ms = t
            n_seen += 1
            out.append((k, t, rate, n_seen))
        state.update((last_ms, rate, n_seen))
        state.setTimeoutTimestamp(last_ms + 10 * half_life_ms)
        yield pd.DataFrame(
            [
                {"key": kk, "ts_ms": t, "rate": r, "n_seen": n}
                for (kk, t, r, n) in out
            ]
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=DECAY_SCHEMA,
            stateStructType=_DECAY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


QUOTA_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("accepted", T.BooleanType()),
        T.StructField("tokens_after", T.DoubleType()),
        T.StructField("n_accepted", T.LongType()),
        T.StructField("n_rejected", T.LongType()),
    ]
)

_QUOTA_STATE_SCHEMA = "last_ms LONG, tokens DOUBLE, n_acc LONG, n_rej LONG"


def quota_stream(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    capacity: float = 10.0,
    refill_per_sec: float = 1.0,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-key token-bucket admission control — the streaming quota
    every continual-ingestion pipeline needs (cap documents per domain,
    events per user) with burst tolerance.

    Bucket starts full (``capacity``); each event takes one token if
    available (accepted) else is marked rejected; tokens refill at
    ``refill_per_sec`` up to capacity, computed lazily from the
    inter-arrival gap — so state per key is one (ts, double, long,
    long) row however hot the key, and no timer ticks exist. Rejected
    events are EMITTED with ``accepted=false`` rather than dropped:
    the caller chooses to filter or to route them to a dead-letter
    sink, and the audit trail (running accept/reject counts) rides on
    every row. State evicts after 10 bucket-drain times past the
    watermark.

    Event-time ordered within the batch; same GroupState shape as
    :func:`sessionize_stream` / :func:`decayed_rate_stream`.
    """

    def fn(key: tuple, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        (k,) = key
        if state.hasTimedOut:
            state.remove()
            return

        ts_all = []
        for pdf in pdfs:
            ts_all.extend(int(t.value // 1_000_000) for t in pd.to_datetime(pdf[ts_col]))
        ts_all.sort()

        if state.exists:
            last_ms, tokens, n_acc, n_rej = state.get
        else:
            last_ms, tokens, n_acc, n_rej = None, float(capacity), 0, 0

        out = []
        for t in ts_all:
            if last_ms is not None:
                # clamp the gap at 0: a late-but-in-watermark event from
                # a later micro-batch arrives with t < last_ms, and an
                # unclamped negative refill would drain the bucket far
                # below zero, rejecting the key for minutes
                tokens = min(
                    float(capacity),
                    tokens + max(0, t - last_ms) * refill_per_sec / 1000.0,
                )
                last_ms = max(last_ms, t)
            else:
                last_ms = t
            ok = tokens >= 1.0
            if ok:
                tokens -= 1.0
                n_acc += 1
            else:
                n_rej += 1
            out.append((k, t, ok, tokens, n_acc, n_rej))
        state.update((last_ms, tokens, n_acc, n_rej))
        drain_ms = int(capacity / max(refill_per_sec, 1e-9) * 1000)
        state.setTimeoutTimestamp(last_ms + 10 * max(drain_ms, 1000))
        yield pd.DataFrame(
            [
                {
                    "key": kk,
                    "ts_ms": t,
                    "accepted": ok,
                    "tokens_after": tk,
                    "n_accepted": na,
                    "n_rejected": nr,
                }
                for (kk, t, ok, tk, na, nr) in out
            ]
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=QUOTA_SCHEMA,
            stateStructType=_QUOTA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


FUNNEL_PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage", T.IntegerType()),
        T.StructField("step", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)

#: JSON-string state: {"iv": [[[s,e],...] per stage], "best": int}.
#: A string survives any Spark state-encoder quirks with nested arrays
#: and keeps the layout debuggable in the state store.
_FUNNEL_STATE_SCHEMA = "js STRING"


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_ms: int | None = None,
    watermark: str = "10 minutes",
    max_intervals: int = 64,
    idle_ttl_ms: int = 30 * 86_400_000,
) -> DataFrame:
    """Streaming funnel progress with EXACT any-chain semantics — the
    unbounded-stream twin of :func:`...operators.behavior.funnel`.

    Emits ``(user_id, stage, step, ts_ms)`` whenever a user first
    reaches a new stage (1-based; ``ts_ms`` is the event that got them
    there), so downstream counts-by-stage reproduce the batch funnel.

    State design (the part that must stay bounded on an infinite
    stream): per user, each stage holds the MERGED INTERVAL UNION of
    ``[t, t + within]`` over its feasible events — membership of a
    step-i event's timestamp in stage i-1's union is exactly the
    feasible-event-set recurrence, but overlapping chains collapse into
    one interval, so steady activity costs O(1) intervals, not O(events).
    Without ``within_ms`` an interval is ``[t, +inf)`` and each stage
    stores exactly one value (its min). ``max_intervals`` caps each
    stage's list by dropping the OLDEST interval on overflow (the only
    approximation, and only for chains anchored past ``max_intervals``
    retry bursts); state for idle users times out at ``last activity +
    k * within`` (no chain can extend after that) or ``idle_ttl_ms``
    when unwindowed.

    Same-timestamp pairs count in order (the batch ``>=`` gate):
    events inside a batch are processed in ``(ts, stage index)`` order.
    """
    if not steps:
        raise ValueError("funnel_stream needs at least one step")
    stage_of = {s: i for i, s in enumerate(steps)}
    k = len(steps)

    def fn(key: tuple, pdfs: Iterator, state: GroupState) -> Iterator:
        import json

        import pandas as pd

        (user,) = key
        if state.hasTimedOut:
            state.remove()
            return

        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"iv": [[] for _ in range(k)], "best": 0}
        iv = [[list(map(int, p)) for p in stage] for stage in st["iv"]]
        best = int(st["best"])

        evs = []
        for pdf in pdfs:
            for typ, t in zip(pdf[type_col], pd.to_datetime(pdf[ts_col])):
                if typ in stage_of:
                    evs.append((int(t.value // 1_000_000), stage_of[typ]))
        evs.sort()

        def covered(stage_idx, t):
            return any(s <= t <= e for s, e in iv[stage_idx])

        def add(stage_idx, t):
            hi = t + within_ms if within_ms is not None else (1 << 62)
            lst = iv[stage_idx]
            lst.append([t, hi])
            lst.sort()
            merged = []
            for s, e in lst:
                if merged and s <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], e)
                else:
                    merged.append([s, e])
            del merged[: max(0, len(merged) - max_intervals)]
            iv[stage_idx] = merged

        out = []
        last_t = None
        for t, si in evs:
            last_t = t if last_t is None else max(last_t, t)
            if si == 0:
                add(0, t)
            elif covered(si - 1, t):
                add(si, t)
            else:
                continue
            if si + 1 > best:
                best = si + 1
                out.append((user, best, steps[si], t))

        state.update((json.dumps({"iv": iv, "best": best}),))
        if last_t is not None:
            horizon = (
                last_t + k * within_ms
                if within_ms is not None
                else last_t + idle_ttl_ms
            )
            state.setTimeoutTimestamp(horizon)
        if out:
            yield pd.DataFrame(
                [
                    {"user_id": u, "stage": s, "step": sp, "ts_ms": t}
                    for (u, s, sp, t) in out
                ]
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=FUNNEL_PROGRESS_SCHEMA,
            stateStructType=_FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


DRIFT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("day", T.LongType()),
        T.StructField("n_cur", T.LongType()),
        T.StructField("n_base", T.LongType()),
        T.StructField("psi", T.DoubleType()),
        T.StructField("drifted", T.BooleanType()),
    ]
)

#: per-feed histogram ring: observed days + day-major flattened bin
#: counts + the last emitted day (sentinel: _DRIFT_NONE)
_DRIFT_STATE_SCHEMA = "days ARRAY<LONG>, counts ARRAY<LONG>, emitted LONG"
_DRIFT_NONE = -(2**62)
_DAY_MS = 86_400_000


def histogram_drift_stream(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bins: int = 10,
    lo: float,
    hi: float,
    baseline_days: int = 7,
    threshold: float = 0.25,
    smooth: float = 1e-6,
    scale: int = 10**9,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming per-feed distribution-drift monitor: the ingest-time
    face of :func:`~kafka_streams_plumber_spark.operators.diff.
    psi_drift`. Maintains a per-feed histogram ring over the trailing
    calendar days; when the watermark closes a UTC day, emits that
    day's PSI against the pooled trailing-``baseline_days`` baseline —
    same binning, same smoothing, same scaled-long term quantization
    as the batch operator, so emitted rows MATCH the batch psi_drift
    output bit-for-bit on the closed days (asserted in
    tests/test_stateful.py). Days with an empty baseline are omitted,
    exactly like the batch contract.

    Not expressible with built-in windowed aggregation: the baseline
    is a cross-WINDOW comparison (day vs the 7 days before it), which
    needs the per-key ring as running state. State per feed is
    bounded: (baseline_days + open days) x bins longs; days that can
    no longer appear in any future baseline are pruned each batch,
    and the state dies on an event-time timeout after the feed goes
    quiet (final complete days are flushed on the way out).
    """
    day_ms = _DAY_MS
    width = (hi - lo) / bins

    def fn(key: tuple, pdfs: Iterator, state: GroupState) -> Iterator:
        import math
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as pd

        (k,) = key
        if state.exists:
            days, counts, emitted = state.get
            cmap = {
                d: list(counts[i * bins : (i + 1) * bins])
                for i, d in enumerate(days)
            }
        else:
            cmap, emitted = {}, _DRIFT_NONE

        if not state.hasTimedOut:
            for pdf in pdfs:
                ts = pd.to_datetime(pdf[ts_col])
                for t, v in zip(ts, pdf[value_col]):
                    if v is None or v != v:
                        continue
                    d = (t.value // 1_000_000) // day_ms
                    b = min(
                        bins - 1, max(0, math.floor((float(v) - lo) / width))
                    )
                    cmap.setdefault(d, [0] * bins)[b] += 1

        wm = state.getCurrentWatermarkMs()

        def r6(x: float) -> float:
            return float(
                Decimal(repr(x)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )

        out = []
        for d in sorted(cmap):
            if d <= emitted:
                continue
            if not state.hasTimedOut and (d + 1) * day_ms > wm:
                break  # day still open; later days even more so
            base = [0] * bins
            for dd in range(d - baseline_days, d):
                if dd in cmap:
                    row = cmap[dd]
                    for i in range(bins):
                        base[i] += row[i]
            nb, nc = sum(base), sum(cmap[d])
            emitted = d
            if nb == 0 or nc == 0:
                continue  # batch contract: no baseline -> no row
            acc = 0
            for i in range(bins):
                pn = cmap[d][i] / nc + smooth
                po = base[i] / nb + smooth
                term = (pn - po) * math.log(pn / po)
                acc += int(
                    Decimal(repr(term * scale)).quantize(
                        Decimal("1"), rounding=ROUND_HALF_UP
                    )
                )
            psi = r6(acc / scale)
            out.append((k, d, nc, nb, psi, psi > threshold))

        if state.hasTimedOut:
            state.remove()
        else:
            keep = sorted(
                d for d in cmap if d >= emitted + 1 - baseline_days
            )
            flat: list[int] = []
            for d in keep:
                flat.extend(cmap[d])
            state.update((keep, flat, emitted))
            last_end = (max(cmap) + 1) * day_ms if cmap else wm + day_ms
            state.setTimeoutTimestamp(
                max(wm + 1, last_end + baseline_days * day_ms)
            )
        yield pd.DataFrame(
            out, columns=["key", "day", "n_cur", "n_base", "psi", "drifted"]
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=DRIFT_SCHEMA,
            stateStructType=_DRIFT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
