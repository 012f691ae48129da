"""ISO-8601 key -> unix-millis key; numeric-string value -> long
(reference: examples/time/example.lua). Records whose value doesn't
parse as a number are dropped — the tonumber-nil filter idiom."""

from kafka_streams_plumber_spark import Pipeline
from kafka_streams_plumber_spark.functions import timecvt, tonumber


def pipeline():
    return (
        Pipeline()
        .filter(lambda k, v: tonumber(v).isNotNull())
        .map(
            lambda k, v: (
                timecvt.iso8601_to_unix_millis(k),
                tonumber(v).cast("long"),
            )
        )
    )
