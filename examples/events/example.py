"""End-to-end product-telemetry analytics over the events table.

The behavioral-analytics half of the engine (examples/crawl and
examples/curation cover the corpus-building halves): one event stream
in, the full funnel/retention/anomaly read-out out, every step a
scale-designed operator from this repo:

  1. sessionization      (streaming/stateful.py:sessionize_batch —
                          same code path the streaming job runs)
  2. ordered funnel       (behavior.funnel: per-stage conditional min)
  3. weekly cohorts       (behavior.cohort_retention)
  4. traffic resample     (behavior.gap_fill: 6 h buckets, forward fill)
  5. anomaly scan         (behavior.rolling_zscore: |z| > 3 flags)
  6. journey map          (behavior.event_transitions: Markov matrix)

Run: python examples/events/example.py [sf_dir]
(defaults to /root/testdata/sf0.001).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_plumber_spark.operators.behavior import (
    cohort_retention,
    event_transitions,
    funnel,
    gap_fill,
    rolling_zscore,
)
from kafka_streams_plumber_spark.plans.session import get_spark, load_tables
from kafka_streams_plumber_spark.streaming.stateful import sessionize_batch


def main(sf_dir: str) -> None:
    spark = get_spark("events-example", master="local[4]", shuffle_partitions=8)
    events = load_tables(spark, sf_dir)["events"]

    sessions = sessionize_batch(events, gap_ms=30 * 60 * 1000)
    n_sessions = sessions.select("user_id", "session_id").distinct().count()
    print(f"== sessions: {n_sessions} (30 min gap)")

    print("== funnel: signup -> view -> click -> purchase")
    funnel(events, ["signup", "view", "click", "purchase"]).show()

    print("== weekly cohort retention (users by signup week x offset)")
    cohort_retention(events, granularity="week").orderBy(
        "cohort_ms", "offset"
    ).show()

    filled = gap_fill(
        events,
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        step_s=21600,
    )
    gaps = filled.where("filled").count()
    print(f"== traffic resample: {filled.count()} 6h buckets, {gaps} gap-filled")

    z = rolling_zscore(
        events,
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        window=20,
        order_cols=["ts", "event_id"],
    )
    anomalies = z.where(F.abs("z") > 3)
    print(f"== anomalies (|z| > 3 vs 20-event history): {anomalies.count()}")
    anomalies.orderBy(F.desc(F.abs("z"))).show(5)

    print("== journey map (event-type transition probabilities)")
    event_transitions(events, order_cols=["ts", "event_id"]).orderBy(
        "from_type", F.desc("prob")
    ).show()

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
