"""End-to-end product-telemetry analytics over the events table.

The behavioral-analytics half of the engine (examples/crawl and
examples/curation cover the corpus-building halves): one event stream
in, the full funnel/retention/anomaly read-out out, every step a
scale-designed operator from this repo:

  1. sessionization      (streaming/stateful.py:sessionize_batch —
                          same code path the streaming job runs)
  2. ordered funnel       (behavior.funnel: per-stage conditional min)
  3. windowed funnel      (behavior.funnel within_ms: exact any-chain
                          feasible-set recurrence — retries count)
  4. attribution          (attribution.attribute_conversions:
                          last-touch window pass + linear split)
  5. weekly cohorts       (behavior.cohort_retention)
  6. traffic resample     (behavior.gap_fill: 6 h buckets, forward fill)
  7. anomaly scan         (behavior.rolling_zscore: |z| > 3 flags)
  8. journey map          (behavior.event_transitions: Markov matrix)

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

from kafka_streams_plumber_spark.operators.attribution import (
    attribute_conversions,
)
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

    print("== funnel with a 6 h per-step conversion window (exact any-chain)")
    funnel(
        events,
        ["signup", "view", "click", "purchase"],
        within_ms=6 * 3600 * 1000,
    ).show()

    print("== last-touch attribution of purchase value (24 h lookback)")
    attribute_conversions(
        events,
        conversion_type="purchase",
        touch_types=["signup", "view", "click"],
        model="last_touch",
        lookback_ms=86_400_000,
    ).orderBy(F.desc("attributed_value")).show()

    print("== linear-split attribution (same lookback)")
    attribute_conversions(
        events,
        conversion_type="purchase",
        touch_types=["signup", "view", "click"],
        model="linear",
        lookback_ms=86_400_000,
        conv_id_col="event_id",
    ).orderBy(F.desc("attributed_value")).show()

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
