"""Scalar-function surface (SURVEY.md §2.3): the engine's replacement for
the reference's Lua stdlib — all native Column expressions, JVM-side."""

from kafka_streams_plumber_spark.functions.timecvt import (
    iso8601_to_unix_timestamp,
    unix_timestamp_to_iso8601,
    iso8601_to_unix_millis,
)
from kafka_streams_plumber_spark.functions.scalars import (
    tonumber,
    toint,
    parse_csv_line,
    money_sum,
    money_product_sum,
)

__all__ = [
    "iso8601_to_unix_timestamp",
    "unix_timestamp_to_iso8601",
    "iso8601_to_unix_millis",
    "tonumber",
    "toint",
    "parse_csv_line",
    "money_sum",
    "money_product_sum",
]
