"""Mergeable frequency sketches.

Count-min: the approximate-count structure for key spaces too large to
hold exact counts (per-URL / per-user / per-shingle frequencies over a
crawl). The sketch is a (depth x width) counter grid stored RELATIONALLY
— rows ``(j, cell, cnt)`` — which is what makes it Spark-native:

- build is one explode(depth) + map-combinable groupBy: the shuffle
  carries at most depth x width rows per partition, independent of both
  corpus size and key cardinality;
- merging two sketches (two ingestion batches, two days) is
  ``union -> groupBy(j, cell) -> sum`` — the same shape, no driver state;
- lookup joins the query keys' (j, cell) coordinates against the grid
  and takes the per-key MIN across rows (absent cell = 0).

Estimates are classical CMS: never an undercount, overcount bounded by
~2N/width with probability 1 - 2^-depth. Hashing is the module-standard
31-bit multiplicative scheme — pure int64 arithmetic, replayable in any
SQL dialect (the oracle rebuilds the exact grid), deterministic across
runs/engines/partitionings.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M31 = 2**31


def cms_params(depth: int, seed: int) -> list[int]:
    """Per-row odd multipliers for the universal hash family."""
    rng = random.Random(seed)
    return [rng.randrange(1, _M31) | 1 for _ in range(depth)]


def _cell(key: Column, mult: int, width: int) -> Column:
    return (F.pmod(key, F.lit(_M31)) * F.lit(mult)) % _M31 % width


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """Build the counter grid ``(j, cell, cnt)`` over an integer key
    column. NULL keys are excluded. Union + re-aggregate to merge."""
    mults = cms_params(depth, seed)
    k = F.col(key_col)
    coords = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), _cell(k, m, width).alias("cell")
            )
            for j, m in enumerate(mults)
        ]
    )
    return (
        df.filter(k.isNotNull())
        .select(F.explode(coords).alias("c"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.cell").alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 2048,
    seed: int = 42,
    est_col: str = "est",
) -> DataFrame:
    """Estimated count per distinct key in ``keys``: min over the
    ``depth`` grid rows (a missing cell reads as 0). The grid side is
    at most depth x width rows — broadcast — so lookup never shuffles
    the key set."""
    mults = cms_params(depth, seed)
    kk = F.col("key")
    coords = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), _cell(kk, m, width).alias("cell")
            )
            for j, m in enumerate(mults)
        ]
    )
    q = (
        keys.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("key"))
        .distinct()
        .select("key", F.explode(coords).alias("c"))
        .select("key", F.col("c.j").alias("j"), F.col("c.cell").alias("cell"))
    )
    joined = q.join(F.broadcast(sketch), ["j", "cell"], "left")
    return joined.groupBy("key").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(est_col)
    )
