"""Streaming semantics: the same Pipeline runs on a streaming frame
(source-agnostic plan — SURVEY §3 entry 2), and PlumberJob's golden gate
refuses to start on mismatch (Plumber.scala:41-50)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafka_streams_plumber_spark import Pipeline
from kafka_streams_plumber_spark.sources.serde import WireType
from kafka_streams_plumber_spark.streaming.runner import PlumberJob
from kafka_streams_plumber_spark.testing import VerificationError, keyValue


def test_pipeline_runs_on_streaming_frame(spark, tmp_path):
    """rate source -> Pipeline -> memory sink: identical plan to batch."""
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        .select(F.col("value").alias("key"), F.col("value").alias("value"))
    )
    p = (
        Pipeline()
        .filter(lambda k, v: v % 2 == 0)
        .map_values(lambda v: v * 10)
    )
    out = p(src)
    q = (
        out.writeStream.format("memory")
        .queryName("ksps_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ksps_stream_test").collect()
    finally:
        q.stop()
    # may be empty if the rate source produced nothing yet, so re-check logic
    for r in rows:
        assert r.key % 2 == 0 and r.value == r.key * 10


def _job(spark, expectations):
    return PlumberJob(
        spark=spark,
        pipeline=Pipeline().map_values(lambda v: F.upper(v)),
        brokers="unused:9092",
        source_topic="in",
        sink_topic="out",
        input_key=WireType("string"),
        input_value=WireType("string"),
        output_key=WireType("string"),
        output_value=WireType("string"),
        fixtures=[keyValue("k", "v")],
        expectations=expectations,
    )


def test_golden_gate_passes_and_dry_run_skips_streaming(spark):
    job = _job(spark, [keyValue("k", "V")])
    # verified, no query started — the dry run returns the constructed
    # (never-started) streaming plan spec instead of a StreamingQuery
    spec = job.run(dry_run=True)
    assert spec["source"]["format"] == "kafka"
    assert spec["sink"]["format"] == "kafka"


def test_golden_gate_refuses_to_start_on_mismatch(spark):
    job = _job(spark, [keyValue("k", "wrong")])
    with pytest.raises(VerificationError):
        job.run(dry_run=True)


def test_windowed_agg_streaming_matches_batch(spark, tmp_path):
    """File source -> watermarked tumbling agg -> memory sink (complete
    mode) produces exactly the batch plan's result: same code path, same
    windows (SURVEY §2.6 — the capability the reference lacks)."""
    import datetime as dt

    from kafka_streams_plumber_spark.streaming.windows import tumbling_agg

    rows = [
        (dt.datetime(2024, 1, 1, 10, m, 0), kind, float(m))
        for m in (0, 4, 14, 15, 16, 31, 59)
        for kind in ("a", "b")
    ]
    schema = "ts timestamp, kind string, v double"
    src_dir = tmp_path / "stream_in"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src_dir))

    aggs = {"n": F.count("*"), "sum_v": F.sum("v")}
    batch = {
        (r["win_start"], r["kind"], r["n"], r["sum_v"])
        for r in tumbling_agg(
            spark.read.parquet(str(src_dir)), "ts", "15 minutes", aggs, by=["kind"]
        ).collect()
    }
    assert len(batch) == 8  # 4 windows x 2 kinds

    stream = tumbling_agg(
        spark.readStream.schema(schema).parquet(str(src_dir)),
        "ts",
        "15 minutes",
        aggs,
        by=["kind"],
        watermark="30 minutes",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ksps_win_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_win"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["win_start"], r["kind"], r["n"], r["sum_v"])
            for r in spark.sql("SELECT * FROM ksps_win_test").collect()
        }
    finally:
        q.stop()
    assert got == batch


def test_session_window_agg_batch(spark):
    """Built-in session_window: 10-minute gap sessionization."""
    import datetime as dt

    from kafka_streams_plumber_spark.streaming.windows import session_window_agg

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0)),
        (1, dt.datetime(2024, 1, 1, 10, 5)),   # same session
        (1, dt.datetime(2024, 1, 1, 10, 30)),  # new session
        (2, dt.datetime(2024, 1, 1, 10, 0)),
    ]
    out = session_window_agg(
        spark.createDataFrame(rows, "uid int, ts timestamp"),
        "ts",
        "10 minutes",
        {"n": F.count("*")},
        by=["uid"],
    ).collect()
    per_uid = {}
    for r in out:
        per_uid.setdefault(r["uid"], []).append(r["n"])
    assert sorted(per_uid[1]) == [1, 2]
    assert per_uid[2] == [1]


def test_streaming_dedup_drops_duplicates_within_watermark(spark, tmp_path):
    import datetime as dt

    from kafka_streams_plumber_spark.streaming.dedup import streaming_dedup

    rows = [
        (10, dt.datetime(2024, 1, 1, 10, 0, 0), "first"),
        (10, dt.datetime(2024, 1, 1, 10, 0, 5), "dup-within-5s"),
        (11, dt.datetime(2024, 1, 1, 10, 0, 1), "other-key"),
        (11, dt.datetime(2024, 1, 1, 10, 0, 2), "other-key-dup"),
    ]
    schema = "k int, ts timestamp, tag string"
    src = tmp_path / "dedup_in"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src))

    out = streaming_dedup(
        spark.readStream.schema(schema).parquet(str(src)),
        ["k"],
        ts_col="ts",
        delay="1 minute",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ksps_dedup_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT k FROM ksps_dedup_test").collect()
    finally:
        q.stop()
    assert sorted(r["k"] for r in got) == [10, 11]


def test_streaming_dedup_batch_fallback(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    assert streaming_dedup_rows(df) == [1, 2]


def streaming_dedup_rows(df):
    from kafka_streams_plumber_spark.streaming.dedup import streaming_dedup

    return sorted(r["k"] for r in streaming_dedup(df, ["k"]).collect())


def test_foreach_batch_sink_writes_once_and_is_replay_safe(spark, tmp_path):
    from kafka_streams_plumber_spark.streaming.sinks import (
        partitioned_parquet_sink,
        start_foreach_batch,
    )

    src = tmp_path / "fb_in"
    out = tmp_path / "fb_out"
    spark.createDataFrame([(i,) for i in range(20)], "v int").coalesce(1).write.parquet(
        str(src)
    )
    sink = partitioned_parquet_sink(str(out))
    q = start_foreach_batch(
        spark.readStream.schema("v int").parquet(str(src)),
        sink,
        checkpoint=str(tmp_path / "fb_ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(60)
    got = spark.read.parquet(str(out))
    assert sorted(r["v"] for r in got.collect()) == list(range(20))
    # replaying the same batch id must not duplicate rows (idempotent)
    one_batch = spark.read.parquet(str(src))
    sink(one_batch, 0)
    again = spark.read.parquet(str(out))
    assert sorted(r["v"] for r in again.collect()) == list(range(20))


def test_wire_path_binary_to_binary(spark):
    """The full Kafka wire path minus the broker: a binary (key, value)
    frame shaped exactly like the kafka source's output is decoded
    through the serde layer, folded through a pipeline, and re-encoded
    to binary — proving decode -> transform -> encode composes into one
    logical plan (what kafka_source | Pipeline | kafka_sink builds)."""
    import struct

    import pyspark.sql.functions as F

    from kafka_streams_plumber_spark import Pipeline
    from kafka_streams_plumber_spark.sources.serde import decode, encode, parse_type

    lt, st = parse_type("long"), parse_type("string")
    raw = spark.createDataFrame(
        [(struct.pack(">q", 7), "fortytwo".encode()),
         (struct.pack(">q", 1), "drop".encode())],
        "key binary, value binary",
    )
    typed = raw.select(
        decode(F.col("key"), lt).alias("key"),
        decode(F.col("value"), st).alias("value"),
    )
    p = (Pipeline()
         .filter(lambda k, v: k > 1)
         .map(lambda k, v: (k * 2, F.upper(v))))
    out = p.apply(typed)
    wire = out.select(
        encode(F.col("key"), lt).alias("key"),
        encode(F.col("value"), st).alias("value"),
    )
    rows = wire.collect()
    assert len(rows) == 1
    assert struct.unpack(">q", bytes(rows[0]["key"]))[0] == 14
    assert bytes(rows[0]["value"]).decode() == "FORTYTWO"


def test_checkpoint_restart_resumes_without_reprocessing(spark, tmp_path):
    """Stop a query, add data, restart with the SAME checkpoint: already-
    committed offsets must not replay (no duplicate rows), new data must
    flow — the crash-recovery contract the runner relies on."""
    from kafka_streams_plumber_spark.streaming.sinks import (
        partitioned_parquet_sink,
        start_foreach_batch,
    )

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    ).coalesce(1).write.parquet(str(src / "f1"))

    stream = spark.readStream.schema("id long, v string").parquet(str(src / "*"))
    q = start_foreach_batch(
        stream, partitioned_parquet_sink(str(out)), checkpoint=ckpt
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    spark.createDataFrame(
        [(4, "d"), (5, "e")], "id long, v string"
    ).coalesce(1).write.parquet(str(src / "f2"))

    stream2 = spark.readStream.schema("id long, v string").parquet(str(src / "*"))
    q2 = start_foreach_batch(
        stream2, partitioned_parquet_sink(str(out)), checkpoint=ckpt
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = sorted(r["id"] for r in spark.read.parquet(str(out)).collect())
    assert got == [1, 2, 3, 4, 5]  # each exactly once across the restart


def test_ohlc_bars_streaming_matches_batch(spark, tmp_path):
    """ohlc_bars' docstring claim proven: the same operator code over a
    watermarked file stream (complete mode) produces exactly the batch
    bars — struct-min/max open/close and scaled-long means included."""
    import datetime as dt

    from kafka_streams_plumber_spark.operators.behavior import ohlc_bars

    rows = [
        ("k1", dt.datetime(2024, 1, 1, 10, 5), 5.0),
        ("k1", dt.datetime(2024, 1, 1, 10, 5), 3.0),
        ("k1", dt.datetime(2024, 1, 1, 10, 30), 9.0),
        ("k2", dt.datetime(2024, 1, 1, 10, 59), 4.0),
        ("k1", dt.datetime(2024, 1, 1, 11, 1), 7.0),
    ]
    schema = "k string, ts timestamp, v double"
    src = tmp_path / "ohlc_in"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src))

    def canon(frame_rows):
        return {
            (
                r["k"], r["window_start"], r["n_events"], r["open"],
                r["high"], r["low"], r["close"], r["mean"],
            )
            for r in frame_rows
        }

    batch = canon(
        ohlc_bars(
            spark.read.parquet(str(src)), "k", "ts", "v", window="1 hour"
        ).collect()
    )
    assert len(batch) == 3

    stream_in = spark.readStream.schema(schema).parquet(str(src))
    bars = ohlc_bars(
        stream_in.withWatermark("ts", "2 hours"), "k", "ts", "v",
        window="1 hour",
    )
    q = (
        bars.writeStream.format("memory")
        .queryName("ksps_ohlc_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_ohlc"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = canon(spark.sql("SELECT * FROM ksps_ohlc_test").collect())
    finally:
        q.stop()
    assert got == batch


def test_hll_registers_streaming_matches_batch(spark, tmp_path):
    """The HLL register build is a plain groupBy-max, so it lifts to a
    streaming source unchanged (complete mode) — per-batch sketches
    merge by the same max. Registers and the resulting estimates must
    equal the batch build exactly."""
    from kafka_streams_plumber_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    rows = [(str(i % 3), i * 104729) for i in range(500)]
    schema = "g string, k long"
    src = tmp_path / "hll_in"
    spark.createDataFrame(rows, schema).coalesce(2).write.parquet(str(src))

    batch_reg = {
        (r["g"], r["bucket"]): r["rho"]
        for r in hll_registers(
            spark.read.parquet(str(src)), "g", "k", p=8
        ).collect()
    }
    stream_in = spark.readStream.schema(schema).parquet(str(src))
    regs = hll_registers(stream_in, "g", "k", p=8)
    q = (
        regs.writeStream.format("memory")
        .queryName("ksps_hll_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["g"], r["bucket"]): r["rho"]
            for r in spark.sql("SELECT * FROM ksps_hll_test").collect()
        }
    finally:
        q.stop()
    assert got == batch_reg

    est_stream = {
        r["g"]: r["n_est"]
        for r in hll_estimate(
            spark.sql("SELECT * FROM ksps_hll_test"), "g", p=8
        ).collect()
    }
    est_batch = {
        r["g"]: r["n_est"]
        for r in hll_estimate(
            hll_registers(spark.read.parquet(str(src)), "g", "k", p=8),
            "g",
            p=8,
        ).collect()
    }
    assert est_stream == est_batch
