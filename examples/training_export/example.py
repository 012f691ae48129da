"""End-to-end training export: curated documents -> packed, ordered,
manifested shards a data loader can stream.

The last mile after curation (examples/curation) and dedup — every
step a scale-designed operator from this repo:

  1. tokenize + count     (text.bpe_ish_tokens / token_count: regex
                           pre-tokenizer, pure expressions)
  2. soft dedup weights   (graph.dedup_weights over exact-dup
                           clusters: downweight, don't delete)
  3. sequence packing     (packing.pack_sequences: shard-parallel
                           window cumsum into fixed token budgets)
  4. deterministic order  (ordering.global_order: seeded permutation,
                           range-partitioned parallel rank)
  5. shard export         (ordering.write_training_shards: shard=K/
                           dirs in read order + _manifest with
                           rows/tokens so loaders bootstrap without
                           scanning)
  6. release gate         (expect.run_checks over the manifest:
                           shard balance, token totals — fail closed)

Run: python examples/training_export/example.py [sf_dir] [out_dir]
(defaults: /root/testdata/sf0.001, a temp dir).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
)

import sys
import tempfile

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.expect import run_checks
from kafka_streams_plumber_spark.operators.graph import dedup_weights
from kafka_streams_plumber_spark.operators.ordering import write_training_shards
from kafka_streams_plumber_spark.operators.packing import pack_sequences
from kafka_streams_plumber_spark.operators.text import token_count
from kafka_streams_plumber_spark.plans.session import get_spark, load_tables

N_SHARDS = 4
SEQ_LEN = 256


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="shards_")

    spark = get_spark("training-export", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_tables(spark, sf_dir)["documents"]

    # 1-2. token counts + soft-dedup weights (exact-dup clusters)
    h = docs.select("doc_id", F.md5("text").alias("_h"))
    a, b = h.alias("a"), h.alias("b")
    pairs = a.join(
        b, (F.col("a._h") == F.col("b._h")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
    weighted = (
        docs.select("doc_id", "text", token_count("text").alias("n_tokens"))
        .join(dedup_weights(docs.select("doc_id"), pairs), "doc_id")
    )
    print("== corpus (weighted) ==")
    weighted.select(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.round(F.sum("weight"), 2).alias("effective_docs"),
    ).show()

    # 3. pack into SEQ_LEN-token training sequences
    packed = pack_sequences(
        weighted.select("doc_id", "n_tokens"),
        "doc_id",
        "n_tokens",
        seq_len=SEQ_LEN,
        n_shards=N_SHARDS,
    )
    print("== packing ledger (first rows) ==")
    packed.orderBy("shard", "seq_idx", "offset").show(5)

    # 4-5. seeded permutation -> shard=K dirs + manifest
    export = weighted.join(
        packed.select("doc_id", "seq_idx", "offset"), "doc_id"
    )
    manifest = write_training_shards(
        export, out_dir, "doc_id", n_shards=N_SHARDS, token_col="n_tokens"
    )
    print(f"== manifest ({out_dir}) ==")
    manifest.show()

    # 6. fail-closed release gate on the manifest itself
    verdicts = run_checks(
        manifest,
        [
            {"name": "all_shards_present", "metric": F.count("*"),
             "lo": N_SHARDS, "hi": N_SHARDS},
            {"name": "no_empty_shard", "metric": F.min("n_rows"), "lo": 1},
            {"name": "balanced_shards",
             "metric": F.max("n_rows") - F.min("n_rows"), "hi": 1},
            {"name": "tokens_accounted", "metric": F.sum("n_tokens"), "lo": 1},
        ],
    )
    print("== release gate ==")
    verdicts.show(truncate=False)
    failed = verdicts.filter(~F.col("ok")).count()
    if failed:
        raise SystemExit(f"release gate failed ({failed} checks)")
    print("release gate: all checks passed")
    spark.stop()


if __name__ == "__main__":
    main()
