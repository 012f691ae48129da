"""Linear-interpolation mode of behavior.gap_fill (locf mode is covered
by tests/test_behavior.py and the q_gapfill oracle contract)."""

from __future__ import annotations

import datetime as dt

import pytest

from kafka_streams_plumber_spark.operators.behavior import gap_fill


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_linear_interpolates_interior_gaps(spark):
    df = spark.createDataFrame(
        [(1, _ts(1, 0), 10.0), (1, _ts(1, 3), 40.0), (1, _ts(1, 5), 0.0)],
        "key long, ts timestamp, v double",
    )
    out = gap_fill(
        df, key_col="key", ts_col="ts", value_col="v", step_s=3600,
        method="linear",
    ).orderBy("bucket_ms").collect()
    # 10 .. gap gap .. 40 gap 0 -> 10, 20, 30, 40, 20, 0
    assert [r["value"] for r in out] == [10.0, 20.0, 30.0, 40.0, 20.0, 0.0]
    assert [r["filled"] for r in out] == [False, True, True, False, True, False]


def test_linear_keeps_observed_values_exact(spark):
    df = spark.createDataFrame(
        [(1, _ts(1, 0), 1.25), (1, _ts(1, 2), 7.75)],
        "key long, ts timestamp, v double",
    )
    out = gap_fill(
        df, key_col="key", ts_col="ts", value_col="v", step_s=3600,
        method="linear",
    ).orderBy("bucket_ms").collect()
    assert out[0]["value"] == 1.25 and out[2]["value"] == 7.75
    assert out[1]["value"] == pytest.approx(4.5)


def test_unknown_method_rejected(spark):
    df = spark.createDataFrame(
        [(1, _ts(1), 1.0)], "key long, ts timestamp, v double"
    )
    with pytest.raises(ValueError):
        gap_fill(
            df, key_col="key", ts_col="ts", value_col="v", step_s=3600,
            method="spline",
        )
