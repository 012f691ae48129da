"""Sketch-based aggregates: HLL accuracy bound vs exact."""

from __future__ import annotations

from kafka_streams_plumber_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_tolerance(spark):
    exact = {
        (r["event_type"]): r["users"]
        for r in QUERIES["q_count_distinct"](spark, SF).collect()
    }
    approx = {
        (r["event_type"]): r["users_approx"]
        for r in QUERIES["q_approx_distinct"](spark, SF).collect()
    }
    assert exact.keys() == approx.keys()
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(2, 0.05 * v), (k, v, approx[k])
