"""Streaming job runner: verify-then-start, dry-run, graceful shutdown."""

from kafka_streams_plumber_spark.streaming.runner import PlumberJob

__all__ = ["PlumberJob"]
