"""One-screen feed-health panel — the distribution/temporal checks a
metrics team runs per feed before trusting a week of data, every
number from an operator in this repo, over the hourly value series of
the synthetic events feed:

  shape          stats.jarque_bera (skew/kurtosis/JB per event type —
                 are 3-sigma alerts even meaningful here?)
  spread         stats.bartlett + stats.mood_median (did any type's
                 dispersion or central value drift apart?)
  body gap       stats.cramer_von_mises + stats.qq_table (click vs
                 purchase: DO they differ, then WHERE — location vs
                 tails)
  effect size    stats.cliffs_delta (and by HOW MUCH, in
                 probability-of-superiority terms)
  temporal       behavior.durbin_watson (is hourly noise
                 autocorrelated: drift the mean misses),
                 behavior.theil_sen (the outage-proof trend slope)
  lead-lag       stats.cross_correlation (does click volume LEAD
                 purchase volume, and by how many hours?)

Run: python examples/feed_health/example.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql import functions as F  # noqa: E402


def main(sf_dir: str, *, stop_session: bool = True) -> dict:
    from kafka_streams_plumber_spark.operators.behavior import (
        durbin_watson,
        theil_sen,
    )
    from kafka_streams_plumber_spark.operators.stats import (
        bartlett,
        cliffs_delta,
        cramer_von_mises,
        cross_correlation,
        jarque_bera,
        mood_median,
        qq_table,
    )
    from kafka_streams_plumber_spark.plans.session import (
        get_spark,
        load_tables,
    )

    spark = get_spark("example-feed-health")
    out: dict = {}
    try:
        e = load_tables(spark, sf_dir)["events"]

        # 1. shape per type: is the value column anywhere near normal?
        out["shape"] = {
            r["event_type"]: (r["skewness"], r["kurt_excess"], r["jb"])
            for r in jarque_bera(e, "value", "event_type", scale=4).collect()
        }

        # 2. cross-type spread and location screens
        out["bartlett"] = (
            bartlett(e, "value", "event_type").collect()[0].asDict()
        )
        out["mood"] = (
            mood_median(e, "value", "event_type").collect()[0].asDict()
        )

        # 3. click vs purchase: differ? where? how much?
        out["cvm"] = (
            cramer_von_mises(
                e, "value", "event_type", "click", "purchase",
                round_values=6,
            ).collect()[0].asDict()
        )
        out["qq"] = [
            (r["p"], r["diff"])
            for r in qq_table(
                e, "value", "event_type", "click", "purchase"
            ).collect()
        ]
        out["cliffs"] = (
            cliffs_delta(
                e, "value", "event_type", "click", "purchase",
                round_values=6,
            ).collect()[0].asDict()
        )

        # 4. hourly series per type: noise structure + robust trend
        hourly = (
            e.where(F.col("value").isNotNull() & F.col("ts").isNotNull())
            .groupBy(
                "event_type",
                F.floor(F.unix_millis(F.col("ts")) / F.lit(3600000))
                .cast("long")
                .alias("b"),
            )
            .agg(
                F.sum(
                    F.round(F.col("value").cast("double") * F.lit(1e6))
                    .cast("long")
                ).alias("v")
            )
        )
        out["dw"] = {
            r["event_type"]: r["dw"]
            for r in durbin_watson(
                hourly, "event_type", "b", "v", scale=0
            ).collect()
        }
        panel = hourly.select(
            "event_type",
            "b",
            (F.col("v").cast("double") / F.lit(1e6)).alias("vd"),
        )
        out["slope"] = {
            r["event_type"]: r["slope"]
            for r in theil_sen(panel, "event_type", "b", "vd").collect()
        }

        # 5. does click volume lead purchases?
        c = hourly.where(F.col("event_type") == "click").select(
            F.col("b").alias("i"), F.col("v").alias("x")
        )
        p = hourly.where(F.col("event_type") == "purchase").select(
            F.col("b").alias("i"), F.col("v").alias("y")
        )
        ccf = cross_correlation(
            c.join(p, "i"), "i", "x", "y", max_lag=6, value_scale=1
        ).collect()
        out["ccf_peak"] = max(
            ((r["lag"], r["ccf"]) for r in ccf if r["ccf"] is not None),
            key=lambda t: abs(t[1]),
            default=None,
        )

        print("== feed-health panel ==")
        for k, v in out.items():
            print(f"{k}: {v}")
        return out
    finally:
        if stop_session:
            spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
