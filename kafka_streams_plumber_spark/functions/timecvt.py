"""Timestamp conversions — parity with the reference's ``timecvt`` Lua
module (LuaEnvironment.scala:32-33; used by examples/time/example.lua).

The reference uses Joda: ``iso8601ToUnixTimestamp(s) = DateTime(s).getMillis
/ 1000.0`` (fractional seconds as double) and the reverse formats with
millisecond precision and offset. Spark's ``to_timestamp``/cast handles
ISO-8601 offsets (``+01:00``, ``Z``) natively.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def iso8601_to_unix_timestamp(col: Column | str) -> Column:
    """ISO-8601 string -> unix seconds as DOUBLE (fractional part kept).

    Mirrors timecvt.iso8601ToUnixTimestamp (LuaEnvironment.scala:32).
    Unparsable input -> NULL (usable as a validity filter, like Lua
    tonumber in examples/time/example.lua:8).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(c).cast("double")


def iso8601_to_unix_millis(col: Column | str) -> Column:
    """ISO-8601 string -> unix milliseconds as LONG (exact — avoids the
    double rounding of seconds*1000; examples/time writes millis keys)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(F.to_timestamp(c))


def unix_timestamp_to_iso8601(col: Column | str) -> Column:
    """Unix seconds (numeric, fractional ok) -> ISO-8601 string with
    millisecond precision, UTC offset rendered as +00:00.

    Mirrors timecvt.unixTimestampToIso8601 (LuaEnvironment.scala:33).
    """
    c = F.col(col) if isinstance(col, str) else col
    ts = F.timestamp_millis(F.round(c.cast("double") * 1000).cast("long"))
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSxxx")
