"""End-to-end training-data curation over the documents table.

The canonical LLM-data pipeline, each stage a scale-designed operator
from this repo:

  1. near-dup removal       (dedup.minhash_dedup: LSH pairs -> greedy kill)
  2. quality gate           (text.gopher_rules: expression-only heuristics,
                             then lm.lm_train/lm_score: bigram-perplexity
                             band — the CCNet-style statistical filter)
  3. classifier resampling  (classify.nb_train/nb_score +
                             sampling.importance_sample — the DSIR step)
  4. decontamination        (dedup.decontaminate: broadcast gram set)
  5. leakage-free split     (sampling.group_split: whole sources stay
                             on one side of train/val)
  6. deterministic order    (ordering.global_order: seeded permutation)
  7. sequence packing       (packing.pack_sequences: shard-parallel cumsum)
  8. partitioned write      (scale.write_partitioned: pruned layout)

Stage accounting uses plans/observe.py:PipelineLedger — metrics ride
the jobs that run anyway instead of per-stage count() re-executions.
Checkpoints before multi-scan operators (LSH dedup, decontaminate,
self-joins) use ``persist=True`` so each observed subtree materializes
exactly once (accurate counts AND no recompute of the heavy stage).

Run: python examples/curation/example.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_plumber_spark.operators.classify import nb_score, nb_train
from kafka_streams_plumber_spark.operators.dedup import (
    decontaminate,
    minhash_dedup,
)
from kafka_streams_plumber_spark.operators.lm import lm_score, lm_train
from kafka_streams_plumber_spark.operators.ordering import global_order
from kafka_streams_plumber_spark.operators.packing import pack_sequences
from kafka_streams_plumber_spark.operators.sampling import (
    group_split,
    importance_sample,
)
from kafka_streams_plumber_spark.operators.text import gopher_rules, token_count
from kafka_streams_plumber_spark.plans.observe import PipelineLedger
from kafka_streams_plumber_spark.plans.scale import (
    truncate_lineage,
    write_partitioned,
)
from kafka_streams_plumber_spark.plans.session import get_spark, load_tables


def curate(spark, sf_dir: str, out_dir: str) -> dict[str, dict]:
    ledger = PipelineLedger()
    docs = load_tables(spark, sf_dir)["documents"]
    docs = ledger.checkpoint(
        docs, "input", extra={"chars": F.sum("n_chars")}, persist=True
    )

    # 1. near-duplicate removal (keeps the lowest doc_id of each pair)
    docs = minhash_dedup(docs, "text", "doc_id", threshold=0.5)
    docs = ledger.checkpoint(docs, "after_dedup", persist=True)

    # 2. quality gate: heuristics first (cheap, expression-only), then a
    #    bigram-LM perplexity band — the model trains on the heuristic
    #    survivors and cuts the most- and least-model-like tails
    docs = (
        docs.withColumn("_g", gopher_rules("text"))
        .filter(F.col("_g.passed"))
        .drop("_g")
    )
    # the LM stage references `docs` three times (train, score, join);
    # sever the LSH-dedup lineage first or the analyzer re-expands that
    # self-join plan once per reference
    docs = truncate_lineage(docs)
    model = lm_train(docs, min_count=2)
    ppl = lm_score(docs, model).select("doc_id", "perplexity")
    docs = (
        docs.join(ppl, "doc_id")
        .filter(F.col("perplexity").isNotNull() & (F.col("perplexity") < 2000))
        .drop("perplexity")
    )
    docs = ledger.checkpoint(docs, "after_quality", persist=True)

    # 3. classifier-guided resampling toward the target distribution
    #    (here: English docs as the proxy target label)
    labeled = docs.withColumn("y", (F.col("lang") == "en").cast("int"))
    model = nb_train(labeled, "text", "y")
    scored = nb_score(labeled, model, "text", "doc_id").select("doc_id", "score")
    docs = docs.join(scored, "doc_id")
    docs = importance_sample(docs, "score", "doc_id", temperature=2.0).drop(
        "score", "accept_p"
    )
    docs = ledger.checkpoint(docs, "after_resample", persist=True)

    # 4. decontamination against a (here: synthetic) benchmark set
    bench = docs.orderBy("doc_id").limit(5).select("text")
    flags = decontaminate(docs, bench)
    docs = (
        docs.join(flags.select("doc_id", "contaminated"), "doc_id", "left")
        .filter(~F.coalesce(F.col("contaminated"), F.lit(False)))
        .drop("contaminated")
    )
    docs = ledger.checkpoint(docs, "after_decontam", persist=True)

    # 5. leakage-free split: the group key is the SOURCE (as an int),
    #    so every doc of a source lands on the same side
    docs = docs.withColumn(
        "_src_key", F.regexp_extract("source", r"(\d+)", 1).cast("long")
    )
    docs = group_split(docs, "_src_key", fractions={"train": 0.95, "val": 0.05})
    train = docs.filter(F.col("split") == "train").drop("split", "_src_key")

    # 6-7. deterministic order, then fixed-length sequence packing
    ordered = global_order(train, "doc_id", seed=42, pos_col="pos")
    with_tokens = ordered.select(
        "doc_id", "pos", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(with_tokens, "doc_id", "n_tokens", seq_len=512)
    packed = ledger.checkpoint(packed, "packed_rows")

    # 8. partitioned layout for the trainer to read shard-by-shard
    write_partitioned(packed, out_dir, partition_by="shard", sort_by="seq_idx")
    return ledger.report()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated"
    spark = get_spark("curation-example", master="local[4]", shuffle_partitions=4)
    report = curate(spark, sf_dir, out_dir)
    for stage, metrics in report.items():
        print(f"{stage}: {metrics}")
    spark.stop()


if __name__ == "__main__":
    main()
