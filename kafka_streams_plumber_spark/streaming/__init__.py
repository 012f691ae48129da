"""Streaming job runner: verify-then-start, dry-run, graceful shutdown."""

from kafka_streams_plumber_spark.streaming.joins import stream_interval_join
from kafka_streams_plumber_spark.streaming.runner import PlumberJob

__all__ = ["PlumberJob", "stream_interval_join"]
