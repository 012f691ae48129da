"""Golden-test harness semantics (SURVEY §2.5; FIXTURES.md F2)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafka_streams_plumber_spark import Pipeline
from kafka_streams_plumber_spark.functions import iso8601_to_unix_millis, tonumber
from kafka_streams_plumber_spark.testing import (
    VerificationError,
    keyValue,
    value,
    verify,
)


def time_pipeline() -> Pipeline:
    """The time example (examples/time/example.lua): ISO-8601 key ->
    unix millis, numeric-string value -> long, drop unparsable."""
    return (
        Pipeline()
        .map(lambda k, v: (iso8601_to_unix_millis(k), tonumber(v).cast("long")))
        .filter(lambda k, v: v.isNotNull())
    )


def test_golden_time_example_passes(spark):
    # fixtures from examples/time/example.test.lua (FIXTURES.md F2)
    verify(
        spark,
        time_pipeline(),
        inputs=[
            keyValue("2016-05-13T16:43:12.345+00:00", "42"),
            keyValue("2014-11-24T23:16:42.345+01:00", "three"),  # dropped
            keyValue("2016-05-13T16:43:13.37Z", "37"),
        ],
        expected=[
            keyValue(1463157792345, 42),
            keyValue(1463157793370, 37),
        ],
        value_schema="string",
    )


def test_count_mismatch_raises(spark):
    with pytest.raises(VerificationError, match="expected 1 records"):
        verify(
            spark,
            Pipeline(),  # identity: passes both records through
            inputs=[value("a"), value("b")],
            expected=[value("a")],
            value_schema="string",
        )


def test_value_mismatch_raises_with_diff(spark):
    with pytest.raises(VerificationError, match="record 0 mismatch"):
        verify(
            spark,
            Pipeline().map_values(lambda v: F.upper(v)),
            inputs=[value("a")],
            expected=[value("wrong")],
            value_schema="string",
        )


def test_deep_equality_on_structs(spark):
    p = Pipeline().map_values(
        lambda v: F.struct(F.lower(v["name"]).alias("name"), (v["n"] * 2).alias("n"))
    )
    verify(
        spark,
        p,
        inputs=[value({"name": "RoEl", "n": 7})],
        expected=[value({"name": "roel", "n": 14})],
        value_schema="struct<name:string, n:int>",
    )
    # extra/missing keys in expectation must fail (deepEq key-set check)
    with pytest.raises(VerificationError):
        verify(
            spark,
            p,
            inputs=[value({"name": "RoEl", "n": 7})],
            expected=[value({"name": "roel"})],
            value_schema="struct<name:string, n:int>",
        )
