"""One-screen model-evaluation audit — the report you run before
swapping model B in for model A, every number from an operator in this
repo. Two threshold "models" score the events feed (A: value >= 40,
B: value >= 55 — stand-ins for any per-item correctness flags):

  per-class table   classify.classification_report (precision/recall/
                    F1 with supports for B's label predictions)
  paired test       classify.mcnemar (is B actually different from A,
                    given the per-item pairing — the unpaired z-test
                    throws that pairing away)
  omnibus           classify.cochran_q (with a third variant C in the
                    panel: does ANY of them differ, before pairwise
                    drill-downs)
  agreement         classify.cohen_kappa (quadratic-weighted, on the
                    ordinal value buckets both "models" induce)
  score quality     classify.brier_decomposition (is the raw score
                    miscalibrated or merely timid: reliability -
                    resolution + uncertainty)
  effect size       stats.cohens_d (HOW MUCH the underlying score
                    distributions differ between outcome slices)

Run: python examples/evaluation/example.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql import functions as F  # noqa: E402


def main(sf_dir: str, *, stop_session: bool = True) -> dict:
    from kafka_streams_plumber_spark.operators.classify import (
        brier_decomposition,
        classification_report,
        cochran_q,
        cohen_kappa,
        mcnemar,
    )
    from kafka_streams_plumber_spark.operators.stats import cohens_d
    from kafka_streams_plumber_spark.plans.session import (
        get_spark,
        load_tables,
    )

    spark = get_spark("example-evaluation")
    out: dict = {}
    try:
        e = load_tables(spark, sf_dir)["events"]
        base = e.where(
            F.col("value").isNotNull() & F.col("event_type").isNotNull()
        )
        truth = F.col("event_type") == "purchase"
        scored = base.select(
            truth.alias("truth"),
            (F.col("value") >= 40.0).alias("pred_a"),
            (F.col("value") >= 55.0).alias("pred_b"),
            F.col("value"),
            F.col("event_id"),
            F.col("event_type"),
        )

        # 1. per-class table for model B
        rep = classification_report(
            scored.select(
                F.col("truth").cast("string").alias("label"),
                F.col("pred_b").cast("string").alias("pred"),
            ),
            "label",
            "pred",
        )
        out["per_class"] = {
            r["label"]: (r["precision"], r["recall"], r["f1"])
            for r in rep.collect()
        }

        # 2. paired A-vs-B on per-item correctness
        paired = scored.select(
            (F.col("pred_a") == F.col("truth")).alias("ok_a"),
            (F.col("pred_b") == F.col("truth")).alias("ok_b"),
        )
        out["mcnemar"] = mcnemar(paired, "ok_a", "ok_b").collect()[0].asDict()

        # 3. omnibus over three variants (C: value >= 70)
        panel = scored.select(
            F.col("event_id").alias("item"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("A").alias("sys"),
                        (F.col("pred_a") == F.col("truth")).alias("ok"),
                    ),
                    F.struct(
                        F.lit("B").alias("sys"),
                        (F.col("pred_b") == F.col("truth")).alias("ok"),
                    ),
                    F.struct(
                        F.lit("C").alias("sys"),
                        ((F.col("value") >= 70.0) == F.col("truth")).alias(
                            "ok"
                        ),
                    ),
                )
            ).alias("s"),
        ).select("item", "s.sys", "s.ok")
        out["cochran_q"] = (
            cochran_q(panel, "item", "sys", "ok", n_treatments=3)
            .collect()[0]
            .asDict()
        )

        # 4. ordinal agreement between the two models' value buckets
        buckets = scored.select(
            F.least(F.lit(4), F.floor(F.col("value") / 25.0)).alias("a"),
            F.least(F.lit(4), F.floor(F.col("value") / 20.0)).alias("b"),
        )
        out["kappa_w"] = (
            cohen_kappa(buckets, "a", "b", weights="quadratic")
            .collect()[0]
            .asDict()
        )

        # 5. is the raw score calibrated as a probability?
        probs = scored.select(
            F.least(
                F.lit(1.0), F.greatest(F.lit(0.0), F.col("value") / 100.0)
            ).alias("p"),
            F.col("truth").alias("y"),
        )
        out["brier"] = (
            brier_decomposition(probs, "p", "y").collect()[0].asDict()
        )

        # 6. effect size of the score split by outcome
        out["effect"] = (
            cohens_d(
                scored.select(
                    F.col("value"),
                    F.col("truth").cast("string").alias("g"),
                ),
                "value",
                "g",
                "true",
                "false",
            )
            .collect()[0]
            .asDict()
        )

        for k, v in out.items():
            print(f"{k}: {v}")
        return out
    finally:
        if stop_session:
            spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
