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


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    *,
    batch_size: int = 32,
    bucket_edges: tuple[int, ...] = (64, 128, 256, 512, 1024),
    n_shards: int = 32,
) -> DataFrame:
    """Assign rows to length-bucketed inference/training batches.

    Dynamic-padding batching: grouping similar-length sequences cuts
    padding waste (batch cost is ``batch_size * max_len``) versus
    random batching, often 2-3x on web-text length distributions.

    - ``bucket`` = index of the first edge >= n_tokens (len(edges) for
      the overflow bucket);
    - rows are sharded deterministically (id-hash % n_shards) so the
      per-bucket window never concentrates in one task — the same
      retry-stable trick as :func:`pack_sequences`; at scale set
      n_shards >= cluster cores;
    - within (bucket, shard): order by id, ``batch_idx = floor(rank /
      batch_size)``; (bucket, shard, batch_idx) is the global batch key.

    Returns input cols + bucket, shard, batch_idx, pad_to (the bucket
    edge the batch pads to; overflow pads to the shard-batch max —
    computed by the caller's agg, here we emit the edge or NULL).
    """
    edges = list(bucket_edges)
    bucket = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        bucket = F.when(F.col(n_tokens_col) <= edges[i], F.lit(i)).otherwise(bucket)

    shard = split_bucket(F.col(id_col), buckets=n_shards)
    w = Window.partitionBy("bucket", "shard").orderBy(id_col)
    pad_map = F.map_from_arrays(
        F.array(*[F.lit(i) for i in range(len(edges))]),
        F.array(*[F.lit(e) for e in edges]),
    )
    return (
        df.withColumn("bucket", bucket)
        .withColumn("shard", shard)
        .withColumn("batch_idx", F.floor((F.row_number().over(w) - 1) / batch_size))
        .withColumn("pad_to", pad_map[F.col("bucket")])
    )


def balanced_bins(
    df: DataFrame,
    id_col: str,
    len_col: str,
    *,
    n_bins: int = 32,
) -> DataFrame:
    """Length-balanced bin assignment (LPT-flavored): rank items by
    length DESC (unique-id tie-break) and deal ranks onto bins in a
    SERPENTINE pattern (0..n-1, n-1..0, repeat) — the classic
    longest-processing-time approximation without its sequential
    argmin, so it stays one parallel rank + pure arithmetic. Bin token
    totals land within one max-item of each other on realistic length
    distributions — the batch-balance property that keeps every
    accelerator step waiting on roughly equal work.

    Plan: ordering.rank_by (range exchange + O(P) offset broadcast —
    no single-task window) and a projection; nothing else.
    """
    from kafka_streams_plumber_spark.operators.ordering import rank_by

    src = df.select(
        F.col(id_col),
        F.col(len_col).cast("long").alias(len_col),
        (-F.col(len_col).cast("long")).alias("_neg"),
    )
    ranked = rank_by(src, ["_neg", id_col], pos_col="_rank")
    pos = F.col("_rank") % (2 * n_bins)
    bin_ = F.when(pos < n_bins, pos).otherwise(2 * n_bins - 1 - pos)
    return ranked.select(
        id_col, len_col, bin_.cast("long").alias("bin")
    )
