"""examples/streaming — the full PlumberJob lifecycle (golden gate ->
streaming source -> transform -> conform -> sink) without a broker,
driven in CI. The reference's examples/demo exercises this path against
Kafka (Plumber.scala:26-86); here the transport is a file-JSON source +
memory sink through the source_factory/sink_factory hooks while every
job-defining stage stays on the production code path."""

from __future__ import annotations

import importlib.util
import os

import pytest

EXAMPLE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
    "streaming",
    "example.py",
)


def _load():
    spec = importlib.util.spec_from_file_location("streaming_example", EXAMPLE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_streaming_example_end_to_end(spark):
    ex = _load()
    rows = ex.run(spark, query_name="t_demo_stream_out")
    got = sorted((r["name"], r["valid"], r["fingers"]) for r in rows)
    want = sorted(
        (e["name"], e["valid"], e["fingers"]) for _k, e in ex.expectations()
    )
    assert got == want


def test_streaming_example_refuses_to_start_on_bad_fixtures(spark):
    """The defining behavior (Plumber.scala:41-50): a job whose pipeline
    does not reproduce its declared fixtures must raise BEFORE any
    stream starts — same gate, broker or not."""
    from kafka_streams_plumber_spark.testing.verify import VerificationError

    ex = _load()
    good = ex.expectations

    def bad_expectations():
        out = [(k, dict(v)) for k, v in good()]
        out[0][1]["fingers"] = 999
        return out

    ex.expectations = bad_expectations
    try:
        with pytest.raises(VerificationError):
            ex.run(spark, query_name="t_demo_stream_refused")
        assert "t_demo_stream_refused" not in [
            t.name for t in spark.catalog.listTables()
        ]
    finally:
        ex.expectations = good
