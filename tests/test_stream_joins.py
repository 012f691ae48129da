"""stream_interval_join: batch semantics (equi + interval window),
streaming planner acceptance with two watermarked streams, and the
state-bounding guard."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka_streams_plumber_spark.streaming.joins import stream_interval_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "p1"),
            (1, _ts("2024-01-01T11:00:00"), "p2"),
            (2, _ts("2024-01-01T10:00:00"), "p3"),
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:58:00"), "c1"),  # 2 min before p1
            (1, _ts("2024-01-01T10:00:00"), "c2"),  # same instant as p1
            (1, _ts("2024-01-01T10:30:00"), "c3"),  # between p1 and p2
            (2, _ts("2024-01-01T09:00:00"), "c4"),  # 1h before p3 — outside
            (3, _ts("2024-01-01T10:00:00"), "c5"),  # key with no left
        ],
        "k int, ts timestamp, name string",
    )
    return left, right


def test_batch_interval_semantics(spark):
    left, right = _frames(spark)
    out = stream_interval_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        lower="5 minutes", upper="0 seconds",
    )
    got = {(r["tag"], r["r_name"]) for r in out.collect()}
    # window is [left_ts - 5min, left_ts]: p1 sees c1 (−2min) and c2 (0);
    # c3 precedes p2 by 30min (outside), c4 outside, c5 unmatched key
    assert got == {("p1", "c1"), ("p1", "c2")}


def test_batch_left_outer(spark):
    left, right = _frames(spark)
    out = stream_interval_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        lower="5 minutes", upper="0 seconds", how="left",
    )
    got = {(r["tag"], r["r_name"]) for r in out.collect()}
    assert got == {("p1", "c1"), ("p1", "c2"), ("p2", None), ("p3", None)}


def test_streaming_plan_accepted(spark, tmp_path):
    """Two rate streams, watermarks both sides: the streaming planner
    must accept the join (this is exactly what it rejects when state
    cannot be bounded) and the query must process batches."""
    def rate(name):
        return (
            spark.readStream.format("rate").option("rowsPerSecond", "50").load()
            .select(
                (F.col("value") % 5).alias("k"),
                F.col("timestamp").alias("ts"),
                F.col("value").alias(name),
            )
        )

    out = stream_interval_join(
        rate("lv"), rate("rv"), on="k", left_ts="ts", right_ts="ts",
        lower="2 seconds", upper="2 seconds", watermark="5 seconds",
    )
    q = (
        out.writeStream.format("memory").queryName("ksps_sj_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # rate source is unbounded — processAllAvailable() would never
        # return; wait for the first completed microbatch instead
        import time

        deadline = time.time() + 120
        while time.time() < deadline and q.lastProgress is None:
            time.sleep(0.5)
        assert q.exception() is None
        assert q.isActive
        assert q.lastProgress is not None, "no microbatch completed in 120s"
        # rows may or may not have arrived yet; schema is the contract
        cols = set(spark.sql("SELECT * FROM ksps_sj_test").columns)
        assert cols == {"k", "ts", "lv", "r_ts", "r_rv"}
    finally:
        q.stop()


def test_streaming_requires_watermarks(spark):
    stream = (
        spark.readStream.format("rate").load()
        .select((F.col("value") % 5).alias("k"), F.col("timestamp").alias("ts"))
    )
    with pytest.raises(ValueError, match="watermark"):
        stream_interval_join(
            stream, stream, on="k", left_ts="ts", right_ts="ts",
            upper="1 minute",
        )


def test_stream_static_enrich(spark, tmp_path):
    from kafka_streams_plumber_spark.streaming.joins import (
        stream_static_enrich,
    )

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "basic")], "k int, tier string"
    )
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, amount double"
    ).coalesce(1).write.parquet(str(src_dir / "b0"))

    stream = spark.readStream.schema("k int, amount double").parquet(
        str(src_dir / "*")
    )
    out = stream_static_enrich(stream, dim, "k")
    q = (
        out.writeStream.format("memory")
        .queryName("sse_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r.k: r.tier for r in spark.sql("SELECT * FROM sse_test").collect()}
    finally:
        q.stop()
    # left join: unmatched stream rows survive with NULL enrichment
    assert rows == {1: "gold", 2: "basic", 3: None}
