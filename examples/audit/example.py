"""One-screen corpus audit — the pre-training "should we even train on
this" report, every number from a scale-designed operator in this repo:

  corpus laws      text.zipf_fit + text.heaps_fit (+ prediction of the
                   vocabulary you'll pay for at 1000x the data)
  tokenizer sizing text.vocab_coverage (types needed for 90/95/99% mass)
  concentration    stats.gini_concentration (is one doc the bucket?)
  mix entanglement stats.chi2_independence (lang x source)
  source geometry  diff.jsd_matrix + similarity.centroid_similarity
                   (which sources are redundant before mixing)
  duplication      text.ngram_novelty (mosaic duplication share) +
                   setsim.containment_join (quote-inclusion pairs)
  contamination    lm.min_k_prob (Min-K%-Prob tail scores)
  eval hygiene     dedup.split_leakage (held-out docs near-duplicating
                   a training doc after an 80/10/10 hash split)
  feed drift       behavior.cusum (daily-volume change-point alarms)
  embedding health similarity.embedding_diversity (collapse probe)

Run: python examples/audit/example.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql import functions as F  # noqa: E402


def main(sf_dir: str, *, stop_session: bool = True) -> dict:
    from kafka_streams_plumber_spark.operators.diff import jsd_matrix
    from kafka_streams_plumber_spark.operators.lm import lm_train, min_k_prob
    from kafka_streams_plumber_spark.operators.setsim import containment_join
    from kafka_streams_plumber_spark.operators.similarity import (
        centroid_similarity,
        embedding_diversity,
    )
    from kafka_streams_plumber_spark.operators.stats import (
        chi2_independence,
        gini_concentration,
    )
    from kafka_streams_plumber_spark.operators.text import (
        heaps_fit,
        ngram_novelty,
        tokens_lower,
        vocab_coverage,
        zipf_fit,
    )
    from kafka_streams_plumber_spark.plans.session import get_spark, load_tables

    spark = get_spark("audit", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    docs, emb = t["documents"], t["embeddings"]

    report: dict = {}

    z = zipf_fit(docs).collect()[0]
    h = heaps_fit(docs).collect()[0]
    report["zipf_slope"] = z["slope"]
    report["heaps_beta"] = h["beta"]
    # Heaps' law extrapolation: vocabulary at 1000x today's token count
    report["vocab_now"] = h["vocab"]
    report["vocab_at_1000x"] = int(
        h["k"] * (h["total_tokens"] * 1000) ** h["beta"]
    )

    cov = {r["target"]: r["tokens_needed"] for r in vocab_coverage(docs).collect()}
    report["types_for_99pct"] = cov[0.99]

    toks = docs.where(F.col("text").isNotNull()).select(
        "source", F.size(F.split("text", " ", -1)).alias("toks")
    )
    gini = gini_concentration(toks, "source", "toks")
    report["max_source_gini"] = gini.agg(F.max("gini")).collect()[0][0]

    chi = chi2_independence(docs, "lang", "source").collect()[0]
    report["lang_source_chi2"] = chi["chi2"]
    report["lang_source_dof"] = chi["dof"]

    tok_rows = docs.select("source", F.explode(tokens_lower("text")).alias("tok"))
    jsd = jsd_matrix(tok_rows, "source", "tok")
    report["min_source_jsd"] = jsd.agg(F.min("jsd")).collect()[0][0]
    cs = centroid_similarity(docs, "source", "text")
    report["max_centroid_cos"] = cs.agg(F.max("cosine")).collect()[0][0]

    nov = ngram_novelty(docs)
    report["low_novelty_docs"] = nov.where(F.col("novelty") < 0.5).count()
    report["containment_pairs"] = containment_join(docs, threshold=0.8).count()

    model = lm_train(docs, min_count=1)
    mk = min_k_prob(docs, model, k_frac=0.2)
    report["suspect_memorized"] = mk.where(
        F.col("min_k_avg_logp") > -2.0
    ).count()

    from kafka_streams_plumber_spark.operators.behavior import cusum
    from kafka_streams_plumber_spark.operators.dedup import split_leakage
    from kafka_streams_plumber_spark.operators.sampling import hash_split

    sp = hash_split(
        docs, "doc_id", fractions={"train": 0.8, "val": 0.1, "test": 0.1}
    )
    report["split_leak_pairs"] = split_leakage(
        sp, "text", "doc_id", "split", threshold=0.5
    ).count()

    daily = (
        t["events"]
        .where(F.col("ts").isNotNull())
        .groupBy(
            F.unix_millis(F.date_trunc("day", F.col("ts"))).alias("day_ms")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    lvl = daily.agg(
        F.avg("n").alias("mu"), F.stddev_pop("n").alias("sd")
    ).collect()[0]
    alarms = cusum(
        daily,
        ["day_ms"],
        "n",
        target=float(lvl["mu"]),
        slack=0.5 * float(lvl["sd"] or 0.0),
        threshold=4.0 * float(lvl["sd"] or 1.0),
    )
    report["volume_drift_alarms"] = alarms.where("alarm").count()

    div = embedding_diversity(emb).collect()[0]
    report["random_pair_cos"] = div["mean_cos"]
    report["near_dup_pair_share"] = div["high_share"]

    for k, v in report.items():
        print(f"{k:22s} {v}")
    if stop_session:
        # standalone-script cleanup only: under pytest get_spark()
        # getOrCreate returns the suite's SHARED session — stopping it
        # here would kill the SparkContext for every later test
        spark.stop()
    return report


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
