"""End-to-end training-data curation over the documents table.

The canonical LLM-data pipeline, each stage a scale-designed operator
from this repo:

  1. near-dup removal      (dedup.minhash_dedup: LSH pairs -> greedy kill)
  2. quality filtering     (text.gopher_rules: expression-only heuristics)
  3. benchmark decontamination (dedup.decontaminate: broadcast gram set)
  4. deterministic order   (ordering.global_order: seeded permutation)
  5. sequence packing      (packing.pack_sequences: shard-parallel cumsum)
  6. partitioned write     (scale.write_partitioned: pruned layout)

Run: python examples/curation/example.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.dedup import (
    decontaminate,
    minhash_dedup,
)
from kafka_streams_plumber_spark.operators.ordering import global_order
from kafka_streams_plumber_spark.operators.packing import pack_sequences
from kafka_streams_plumber_spark.operators.text import gopher_rules
from kafka_streams_plumber_spark.plans.scale import write_partitioned
from kafka_streams_plumber_spark.plans.session import get_spark, load_tables


def curate(spark, sf_dir: str, out_dir: str) -> dict[str, int]:
    docs = load_tables(spark, sf_dir)["documents"]
    counts = {"input": docs.count()}

    # 1. near-duplicate removal (keeps the lowest doc_id of each pair)
    docs = minhash_dedup(docs, "text", "doc_id", threshold=0.5)
    counts["after_dedup"] = docs.count()

    # 2. quality gate
    docs = docs.withColumn("_g", gopher_rules("text")).filter(
        F.col("_g.passed")
    ).drop("_g")
    counts["after_quality"] = docs.count()

    # 3. decontamination against a (here: synthetic) benchmark set
    bench = docs.orderBy("doc_id").limit(5).select("text")
    flags = decontaminate(docs, bench)
    docs = (
        docs.join(flags.select("doc_id", "contaminated"), "doc_id", "left")
        .filter(~F.coalesce(F.col("contaminated"), F.lit(False)))
        .drop("contaminated")
    )
    counts["after_decontam"] = docs.count()

    # 4-5. deterministic order, then fixed-length sequence packing
    from kafka_streams_plumber_spark.operators.text import token_count

    ordered = global_order(docs, "doc_id", seed=42, pos_col="pos")
    with_tokens = ordered.select(
        "doc_id", "pos", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(with_tokens, "doc_id", "n_tokens", seq_len=512)
    counts["packed_rows"] = packed.count()

    # 6. partitioned layout for the trainer to read shard-by-shard
    write_partitioned(
        packed, out_dir, partition_by="shard", sort_by="seq_idx"
    )
    return counts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated"
    spark = get_spark("curation-example", master="local[4]", shuffle_partitions=4)
    counts = curate(spark, sf_dir, out_dir)
    for k, v in counts.items():
        print(f"{k}: {v}")
    spark.stop()


if __name__ == "__main__":
    main()
