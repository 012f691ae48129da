"""Golden-test harness: declarative fixtures + pre-flight verification."""

from kafka_streams_plumber_spark.testing.verify import (
    VerificationError,
    keyValue,
    value,
    verify,
)

__all__ = ["VerificationError", "keyValue", "value", "verify"]
