"""Sequence packing: assign documents to fixed-length training sequences.

Training pipelines concatenate variable-length documents into
fixed-size token sequences (e.g. 4096 tokens). The packing itself is a
serial decision — where one doc lands depends on every doc before it —
so the scalable formulation shards the corpus deterministically and
packs each shard independently with a window cumsum:

    shard = id-hash % n_shards          (parallel, retry-stable)
    within shard: order by id, running token count,
    seq_idx = floor(tokens_before / seq_len)
    offset  = tokens_before % seq_len

"Contiguous fill": a document straddling a boundary starts in the
sequence where its first token falls and spills into the next — exactly
how GPT-style pretraining packs with an EOS separator. Everything is
window arithmetic over (shard, id) — one range-shuffle per shard set,
no driver involvement, and the oracle can replay it verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.sampling import split_bucket


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    *,
    seq_len: int = 4096,
    n_shards: int = 32,
) -> DataFrame:
    """Deterministically pack rows into fixed-``seq_len`` sequences.

    Returns the input columns plus ``shard``, ``seq_idx`` (sequence
    number within the shard), and ``offset`` (token position where this
    doc starts in its sequence). (shard, seq_idx) is the globally unique
    sequence key. ``n_shards`` bounds window-sort parallelism: windows
    partition by shard, so pick n_shards >= cluster cores at scale.
    """
    shard = split_bucket(F.col(id_col), buckets=n_shards)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("shard", shard).withColumn(
        "_before", F.sum(n_tokens_col).over(w) - F.col(n_tokens_col)
    )
    return (
        out.withColumn("seq_idx", F.floor(F.col("_before") / seq_len))
        .withColumn("offset", F.col("_before") % seq_len)
        .drop("_before")
    )
