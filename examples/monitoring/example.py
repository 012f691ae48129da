"""One-screen feed-drift monitor — the daily "is the ingest healthy"
report, every number from a calendar-windowed operator in this repo
(each compares TODAY against the pooled trailing 7 days, gaps
contributing nothing):

  shape drift      diff.psi_drift (per-feed daily PSI of the value
                   histogram vs the trailing baseline)
  local drift      diff.hist_drift (sup-CDF / discrete-KS — catches a
                   single quantile region sliding that PSI smooths out)
  location drift   diff.quantile_drift (daily exact median vs the
                   trailing mean of daily medians, in value units)
  replay           diff.dup_drift (share of docs whose content digest
                   was already ingested in the window)
  freshness        text.vocab_drift (share of today's distinct tokens
                   never seen in the window)

The same machinery runs ingest-time via
streaming/stateful.py:histogram_drift_stream (bit-exact psi_drift
parity on watermark-closed days — see tests/test_stateful.py).

Run: python examples/monitoring/example.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql import functions as F  # noqa: E402


def main(sf_dir: str, *, stop_session: bool = True) -> dict:
    from kafka_streams_plumber_spark.operators.diff import (
        dup_drift,
        hist_drift,
        psi_drift,
        quantile_drift,
    )
    from kafka_streams_plumber_spark.operators.text import vocab_drift
    from kafka_streams_plumber_spark.plans.session import get_spark, load_tables

    spark = get_spark("monitoring-example")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)

    events = (
        t["events"]
        .where(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_idx"),
            "value",
        )
    )
    kw = dict(bins=10, lo=0.0, hi=500.0, baseline_days=7)

    report: dict = {}
    psi = psi_drift(events, ["event_type"], "day_idx", "value", **kw)
    report["psi_feed_days"] = psi.count()
    report["psi_drifted_days"] = psi.where("drifted").count()
    report["psi_max"] = psi.agg(F.max("psi")).collect()[0][0]

    ks = hist_drift(
        events, ["event_type"], "day_idx", "value", threshold=0.2, **kw
    )
    report["ks_drifted_days"] = ks.where("drifted").count()
    report["ks_max"] = ks.agg(F.max("ks")).collect()[0][0]

    qd = quantile_drift(
        events, ["event_type"], "day_idx", "value",
        p=0.5, baseline_days=7, threshold=5.0,
    )
    report["median_shift_max_abs"] = qd.agg(
        F.max(F.abs("delta"))
    ).collect()[0][0]
    report["median_drifted_days"] = qd.where("drifted").count()

    # documents folded onto a 30-day calendar + a synthetic 10% replay
    docs = t["documents"].select(
        (F.col("doc_id") % 30).alias("day_idx"), "text"
    )
    feed = docs.unionByName(
        t["documents"]
        .where(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") % 30 + 1).alias("day_idx"), "text")
    )
    dd = dup_drift(feed, ["text"], "day_idx", baseline_days=7, threshold=0.2)
    report["replay_days_flagged"] = dd.where("drifted").count()
    report["replay_rate_max"] = dd.agg(F.max("dup_rate")).collect()[0][0]

    vd = vocab_drift(docs, "text", "day_idx", baseline_days=7)
    report["vocab_novelty_last"] = (
        vd.orderBy(F.desc("day")).limit(1).collect()[0]["new_fraction"]
    )

    for k, v in report.items():
        print(f"{k:24s} {v}")
    if stop_session:
        spark.stop()
    return report


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
