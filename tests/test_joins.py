"""asof_join / range_join semantics: latest-prior match, equal-ts
visibility, strict mode, left rows with no match, single-shuffle plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.joins import asof_join, range_join
from kafka_streams_plumber_spark.plans.inspect import shuffle_count


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),
            (1, _ts("2024-01-01T12:00:00"), "b"),
            (2, _ts("2024-01-01T09:00:00"), "c"),  # before any right row
            (3, _ts("2024-01-01T10:00:00"), "d"),  # key with no right rows
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 10.0),
            (1, _ts("2024-01-01T11:00:00"), 20.0),
            (2, _ts("2024-01-01T09:00:00"), 30.0),  # equal-ts case
        ],
        "k int, ts timestamp, px double",
    )
    return left, right


def test_asof_latest_prior_and_nulls(spark):
    left, right = _frames(spark)
    out = {
        r["tag"]: (r["r_px"], r["r_ts"])
        for r in asof_join(left, right, on="k", ts="ts").collect()
    }
    assert out["a"] == (10.0, _ts("2024-01-01T09:30:00"))
    assert out["b"] == (20.0, _ts("2024-01-01T11:00:00"))
    # non-strict: right row at the same instant is visible
    assert out["c"] == (30.0, _ts("2024-01-01T09:00:00"))
    assert out["d"] == (None, None)
    assert len(out) == 4


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    out = {
        r["tag"]: r["r_px"]
        for r in asof_join(left, right, on="k", ts="ts", strict=True).collect()
    }
    assert out["c"] is None  # equal-ts right row no longer visible
    assert out["a"] == 10.0


def test_asof_single_shuffle(spark):
    left, right = _frames(spark)
    assert shuffle_count(asof_join(left, right, on="k", ts="ts")) == 1


def test_asof_different_right_ts_name(spark):
    left, right = _frames(spark)
    r2 = right.withColumnRenamed("ts", "rts")
    out = {
        r["tag"]: r["r_px"]
        for r in asof_join(left, r2, on="k", ts="ts", right_ts="rts").collect()
    }
    assert out["a"] == 10.0


def test_range_join_interval_membership(spark):
    left = spark.createDataFrame(
        [(1, 5, "x"), (1, 15, "y"), (2, 5, "z")], "k int, t int, tag string"
    )
    right = spark.createDataFrame(
        [(1, 0, 10, "lo"), (1, 10, 20, "hi")], "k int, s int, e int, name string"
    )
    got = {
        (r["tag"], r["name"])
        for r in range_join(
            left, right, on="k", left_ts="t", right_start="s", right_end="e"
        ).collect()
    }
    assert got == {("x", "lo"), ("y", "hi")}
