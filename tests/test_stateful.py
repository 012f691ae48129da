"""Sessionization: batch window semantics + streaming GroupState parity."""

from __future__ import annotations

import datetime as dt

from kafka_streams_plumber_spark.streaming.stateful import (
    sessionize_batch,
    sessionize_stream,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_batch_sessions_split_on_gap(spark):
    gap = 30 * 60 * 1000
    rows = [
        (1, T0),
        (1, T0 + dt.timedelta(minutes=10)),   # same session
        (1, T0 + dt.timedelta(minutes=50)),   # 40min gap -> new session
        (2, T0),                               # separate user
    ]
    out = {
        (r.user_id, r.session_id): r
        for r in sessionize_batch(_events(spark, rows), gap_ms=gap).collect()
    }
    assert out[(1, 0)].n_events == 2
    assert out[(1, 1)].n_events == 1
    assert out[(2, 0)].n_events == 1
    assert out[(1, 0)].end_ms - out[(1, 0)].start_ms == 10 * 60 * 1000


def test_stream_sessions_match_batch_on_closed_sessions(spark, tmp_path):
    """Feed a fixed set of events through the streaming operator; closed
    sessions (a later event crossed the gap) must match the batch
    operator's result for the same data."""
    gap = 30 * 60 * 1000
    rows = [
        (1, T0),
        (1, T0 + dt.timedelta(minutes=5)),
        (1, T0 + dt.timedelta(minutes=60)),   # closes session 0
        (1, T0 + dt.timedelta(minutes=65)),
        (1, T0 + dt.timedelta(minutes=150)),  # closes session 1
    ]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _events(spark, rows).coalesce(1).write.parquet(str(src_dir / "batch0"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(str(src_dir / "*"))
    )
    out = sessionize_stream(stream, gap_ms=gap)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.session_id): r
            for r in spark.sql("SELECT * FROM sessions_test").collect()
        }
    finally:
        q.stop()

    batch = {
        (r.user_id, r.session_id): r
        for r in sessionize_batch(_events(spark, rows), gap_ms=gap).collect()
    }
    # sessions 0 and 1 are closed by later events; session 2 stays open
    # in state (no watermark progress in a single batch) -> compare closed
    assert (1, 0) in got and (1, 1) in got
    for key in [(1, 0), (1, 1)]:
        assert got[key].n_events == batch[key].n_events
        assert got[key].start_ms == batch[key].start_ms
        assert got[key].end_ms == batch[key].end_ms


def test_decayed_rate_stream_matches_reference_loop(spark, tmp_path):
    """The streaming decayed counter must equal the exact sequential
    computation (decay by 0.5**(dt/half_life) then add 1) per key."""
    from kafka_streams_plumber_spark.streaming.stateful import (
        decayed_rate_stream,
    )

    hl = 60 * 60 * 1000
    rows = [
        (1, T0),
        (1, T0 + dt.timedelta(hours=1)),    # decays to 0.5, +1 -> 1.5
        (1, T0 + dt.timedelta(hours=2)),    # 0.75 + 1 -> 1.75
        (2, T0),
        (2, T0 + dt.timedelta(hours=3)),
    ]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _events(spark, rows).coalesce(1).write.parquet(str(src_dir / "b0"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(str(src_dir / "*"))
    )
    out = decayed_rate_stream(stream, half_life_ms=hl)
    q = (
        out.writeStream.format("memory")
        .queryName("decay_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT * FROM decay_test ORDER BY key, ts_ms"
        ).collect()
    finally:
        q.stop()

    by_key = {}
    for r in got:
        by_key.setdefault(r.key, []).append(r)
    assert [round(r.rate, 9) for r in by_key[1]] == [1.0, 1.5, 1.75]
    assert [r.n_seen for r in by_key[1]] == [1, 2, 3]
    assert by_key[2][1].rate == 1.0 * 0.5**3 + 1.0


def test_session_window_agg_batch_semantics(spark):
    """Builtin session_window: strict-gap merging, end = last + gap."""
    from kafka_streams_plumber_spark.streaming.stateful import (
        session_window_agg,
    )

    gap_ms = 30 * 60 * 1000
    rows = [
        (1, T0),
        (1, T0 + dt.timedelta(minutes=10)),   # merges (gap < 30min)
        (1, T0 + dt.timedelta(minutes=40)),   # exactly 30min -> still merges
        (1, T0 + dt.timedelta(minutes=71)),   # 31min gap -> NEW session
        (2, T0),
    ]
    out = sorted(
        session_window_agg(_events(spark, rows), gap="30 minutes").collect(),
        key=lambda r: (r.user_id, r.start_ms),
    )
    assert [(r.user_id, r.n_events) for r in out] == [(1, 3), (1, 1), (2, 1)]
    # end extends one gap past the last event of the session
    assert out[0].end_ms == out[0].start_ms + 40 * 60 * 1000 + gap_ms
    assert out[1].end_ms == out[1].start_ms + gap_ms


def test_session_window_agg_streaming_matches_batch(spark, tmp_path):
    from kafka_streams_plumber_spark.streaming.stateful import (
        session_window_agg,
    )

    rows = [
        (1, T0),
        (1, T0 + dt.timedelta(minutes=5)),
        (1, T0 + dt.timedelta(minutes=60)),
        (2, T0 + dt.timedelta(minutes=70)),
    ]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _events(spark, rows).coalesce(1).write.parquet(str(src_dir / "b0"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(str(src_dir / "*"))
    )
    out = session_window_agg(stream, gap="30 minutes", watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("swa_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.start_ms): r
            for r in spark.sql("SELECT * FROM swa_test").collect()
        }
    finally:
        q.stop()

    batch = {
        (r.user_id, r.start_ms): r
        for r in session_window_agg(_events(spark, rows), gap="30 minutes").collect()
    }
    # append mode emits only watermark-closed sessions; every emitted
    # session must match the batch result exactly
    assert got, "no sessions emitted"
    for key, r in got.items():
        assert batch[key].n_events == r.n_events
        assert batch[key].end_ms == r.end_ms


def test_quota_stream_token_bucket_semantics(spark, tmp_path):
    """Burst of 5 with capacity 3: first 3 accepted, next 2 rejected;
    after a refill gap the key is admitted again. Counts accumulate
    across micro-batches (state survives)."""
    from kafka_streams_plumber_spark.streaming.stateful import quota_stream

    rows1 = [(1, T0 + dt.timedelta(seconds=i)) for i in range(5)]  # burst
    rows2 = [(1, T0 + dt.timedelta(seconds=120))]  # long gap -> refilled
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _events(spark, rows1).coalesce(1).write.parquet(str(src_dir / "b0"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(str(src_dir / "*"))
    )
    out = quota_stream(
        stream, capacity=3.0, refill_per_sec=0.1, watermark="0 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("quota_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _events(spark, rows2).coalesce(1).write.parquet(str(src_dir / "b1"))
        q.processAllAvailable()
        got = sorted(
            spark.sql("SELECT * FROM quota_test").collect(),
            key=lambda r: r.ts_ms,
        )
    finally:
        q.stop()

    assert [r.accepted for r in got] == [True, True, True, False, False, True]
    # refill during the burst: 1 token/10s, events 1s apart -> ~0.1/event
    assert got[-1].n_accepted == 4 and got[-1].n_rejected == 2
    # the 120s gap refills 12 tokens but clamps at capacity 3, one spent
    assert abs(got[-1].tokens_after - 2.0) < 0.5


def test_quota_stream_late_event_does_not_drain_bucket(spark, tmp_path):
    """A late-but-in-watermark event from a later micro-batch must not
    apply a negative refill (which would reject the key for minutes):
    the gap clamps at 0 and last_ms never moves backwards."""
    from kafka_streams_plumber_spark.streaming.stateful import quota_stream

    rows1 = [(1, T0 + dt.timedelta(seconds=600))]
    rows2 = [(1, T0 + dt.timedelta(seconds=100))]  # late arrival
    rows3 = [(1, T0 + dt.timedelta(seconds=601))]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _events(spark, rows1).coalesce(1).write.parquet(str(src_dir / "b0"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(str(src_dir / "*"))
    )
    out = quota_stream(
        stream, capacity=10.0, refill_per_sec=1.0, watermark="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("quota_late_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _events(spark, rows2).coalesce(1).write.parquet(str(src_dir / "b1"))
        q.processAllAvailable()
        _events(spark, rows3).coalesce(1).write.parquet(str(src_dir / "b2"))
        q.processAllAvailable()
        got = sorted(
            spark.sql("SELECT * FROM quota_late_test").collect(),
            key=lambda r: r.ts_ms,
        )
    finally:
        q.stop()

    # all three accepted: the late event costs a token but never goes
    # negative, and the bucket still has tokens afterwards
    assert [r.accepted for r in got] == [True, True, True]
    assert all(r.tokens_after >= 0 for r in got)


def test_funnel_stream_matches_batch_windowed_funnel(spark, tmp_path):
    """Two microbatches through the stateful funnel; per-stage user
    counts derived from emitted progress rows must equal the batch
    feasible-set funnel — including the retry-of-earlier-step chain
    (greedy anchoring would miss user 3)."""
    import datetime as dt

    from kafka_streams_plumber_spark.operators.behavior import funnel
    from kafka_streams_plumber_spark.streaming.stateful import funnel_stream

    W = 10 * 60 * 1000
    m = lambda mins: T0 + dt.timedelta(minutes=mins)
    batch0 = [
        (1, "a", m(0)), (1, "b", m(5)),            # reaches stage 2
        (2, "a", m(0)),                            # stage 1 only
        (3, "a", m(0)),
    ]
    batch1 = [
        (1, "c", m(8)),                            # completes in window
        (3, "a", m(100)), (3, "b", m(105)),        # retry chain converts
        (2, "b", m(200)),                          # out of window -> no
    ]
    rows_schema = "user_id long, event_type string, ts timestamp"
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(batch0, rows_schema).coalesce(1).write.parquet(
        str(src / "b0")
    )

    stream = spark.readStream.schema(rows_schema).parquet(str(src / "*"))
    out = funnel_stream(stream, ["a", "b", "c"], within_ms=W)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(batch1, rows_schema).coalesce(1).write.parquet(
            str(src / "b1")
        )
        q.processAllAvailable()
        prog = spark.sql("SELECT * FROM funnel_stream_test").collect()
    finally:
        q.stop()

    # best stage per user from the emitted progress rows
    best = {}
    for r in prog:
        best[r.user_id] = max(best.get(r.user_id, 0), r.stage)
    stream_counts = {
        s: sum(1 for b in best.values() if b >= s) for s in (1, 2, 3)
    }

    all_rows = batch0 + batch1
    batch_counts = {
        r["stage"]: r["users"]
        for r in funnel(
            spark.createDataFrame(all_rows, rows_schema),
            ["a", "b", "c"],
            within_ms=W,
        ).collect()
    }
    assert stream_counts == batch_counts
    # the retry chain is the load-bearing case: user 3 must reach stage 2
    assert best[3] == 2 and best[2] == 1


def test_funnel_stream_interval_merge_keeps_state_exact(spark, tmp_path):
    """Overlapping retries merge into one interval — a chain anchored at
    ANY of them still converts after the merge."""
    import datetime as dt

    from kafka_streams_plumber_spark.streaming.stateful import funnel_stream

    W = 10 * 60 * 1000
    m = lambda mins: T0 + dt.timedelta(minutes=mins)
    rows = [(1, "a", m(i)) for i in range(0, 40, 2)]  # 20 merged anchors
    rows.append((1, "b", m(47)))  # within 10 min of the LAST anchor only
    rows_schema = "user_id long, event_type string, ts timestamp"
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows, rows_schema).coalesce(1).write.parquet(
        str(src / "b0")
    )
    stream = spark.readStream.schema(rows_schema).parquet(str(src / "*"))
    out = funnel_stream(stream, ["a", "b"], within_ms=W, max_intervals=2)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_merge_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        prog = spark.sql("SELECT * FROM funnel_merge_test").collect()
    finally:
        q.stop()
    assert max(r.stage for r in prog) == 2


def test_histogram_drift_stream_matches_batch_psi_drift(spark, tmp_path):
    """The streaming drift monitor's emitted rows (watermark-closed
    days) equal diff.psi_drift's batch output for the same days,
    bit-for-bit — same binning, smoothing, and scaled-long term
    quantization; open days and empty-baseline days are not emitted."""
    from pyspark.sql import functions as F

    from kafka_streams_plumber_spark.operators.diff import psi_drift
    from kafka_streams_plumber_spark.streaming.stateful import (
        histogram_drift_stream,
    )

    day = dt.timedelta(days=1)
    d0 = dt.datetime(2024, 1, 1)  # UTC epoch day 19723
    rows = []
    # feed "a": day 0 low values, day 1 mixed, day 2 shifted high
    for h, v in [(1, 0.2), (2, 0.4), (3, 0.3)]:
        rows.append(("a", d0 + dt.timedelta(hours=h), v))
    for h, v in [(1, 0.2), (2, 1.6), (3, 1.7), (4, 0.1)]:
        rows.append(("a", d0 + day + dt.timedelta(hours=h), v))
    for h, v in [(1, 1.9), (2, 1.8), (3, 1.7)]:
        rows.append(("a", d0 + 2 * day + dt.timedelta(hours=h), v))
    # feed "b": stable across the same days
    for dd in range(3):
        for h, v in [(5, 0.5), (6, 1.5)]:
            rows.append(("b", d0 + dd * day + dt.timedelta(hours=h), v))

    schema = "event_type string, ts timestamp, value double"
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(src / "b0")
    )
    # two sentinel waves per feed: the first advances the watermark
    # past days 0-1 (emitting them), the second past day 2
    sent1 = [(k, d0 + 4 * day, 1.0) for k in ("a", "b")]
    sent2 = [(k, d0 + 6 * day, 1.0) for k in ("a", "b")]
    spark.createDataFrame(sent1, schema).coalesce(1).write.parquet(
        str(src / "b1")
    )
    spark.createDataFrame(sent2, schema).coalesce(1).write.parquet(
        str(src / "b2")
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = histogram_drift_stream(
        stream,
        bins=4,
        lo=0.0,
        hi=2.0,
        baseline_days=7,
        threshold=0.25,
        watermark="10 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("drift_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT * FROM drift_stream_test ORDER BY key, day"
        ).collect()
    finally:
        q.stop()

    # batch reference over the identical rows (sentinels included)
    batch_in = spark.createDataFrame(rows + sent1 + sent2, schema).select(
        "event_type",
        F.floor(F.unix_millis("ts") / 86400000).alias("day_idx"),
        "value",
    )
    batch = {
        (r["event_type"], r["day"]): r
        for r in psi_drift(
            batch_in,
            ["event_type"],
            "day_idx",
            "value",
            bins=4,
            lo=0.0,
            hi=2.0,
            baseline_days=7,
            threshold=0.25,
        ).collect()
    }

    # emitted = closed days with a baseline: days 1 and 2 per feed
    d0_idx = int(d0.replace(tzinfo=dt.timezone.utc).timestamp()) // 86400
    assert [(r["key"], r["day"]) for r in got] == [
        ("a", d0_idx + 1),
        ("a", d0_idx + 2),
        ("b", d0_idx + 1),
        ("b", d0_idx + 2),
    ]
    for r in got:
        b = batch[(r["key"], r["day"])]
        assert (r["n_cur"], r["n_base"]) == (b["n_cur"], b["n_base"])
        assert r["psi"] == b["psi"], (r["key"], r["day"], r["psi"], b["psi"])
        assert r["drifted"] == b["drifted"]
    # the shifted feed flags on day 2, the stable feed never does
    assert got[1]["drifted"] and not got[3]["drifted"]
    assert got[3]["psi"] == 0.0
