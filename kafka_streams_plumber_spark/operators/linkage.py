"""Record linkage: blocked fuzzy joins for entity resolution.

Training-data pipelines constantly reconcile metadata from different
feeds — author/title records, product names, source labels — where the
same entity arrives with typos and formatting drift. The classic
solution is block-then-score: a cheap BLOCKING key makes candidate
generation an equi-join (never an all-pairs cross join), then an edit-
distance score filters candidates to matches.

Scale design mirrors the LSH dedup family: the only shuffle is the
equi-join on the block key; oversized blocks (a degenerate key like an
empty prefix) are CAPPED like LSH buckets — a block with more than
``block_cap`` members on either side is dropped and reported rather
than allowed to go quadratic. Scoring (``levenshtein``) runs only on
within-block pairs, JVM-side, no Python.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def prefix_block(col: Column, *, k: int = 4) -> Column:
    """Default blocking key: first ``k`` chars of the lowercased,
    trimmed value. Cheap, language-agnostic, and replayable in any SQL
    dialect; misses matches whose FIRST ``k`` chars differ (use a
    second pass with a different key for recall)."""
    return F.substring(F.lower(F.trim(col)), 1, k)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    *,
    max_distance: int = 2,
    block_fn: Callable[[Column], Column] = prefix_block,
    block_cap: int = 1000,
) -> DataFrame:
    """All (left row, right row) pairs whose values are within
    ``max_distance`` Levenshtein edits, found via blocked candidate
    generation. Adds ``distance`` (edit distance) and ``similarity``
    (``1 - distance / max(len_a, len_b)``, rounded to 6 dp).

    Blocks larger than ``block_cap`` on either side are skipped —
    identical policy to the LSH bucket cap: a degenerate block would
    dominate the candidate count while contributing near-zero-precision
    pairs. NULL values never match.

    Column names are preserved from both inputs; disambiguate before
    calling if they collide.
    """
    lb = left.filter(F.col(left_col).isNotNull()).withColumn(
        "_blk", block_fn(F.col(left_col))
    )
    rb = right.filter(F.col(right_col).isNotNull()).withColumn(
        "_blk", block_fn(F.col(right_col))
    )
    ok = (
        lb.groupBy("_blk")
        .agg(F.count("*").alias("_ln"))
        .join(rb.groupBy("_blk").agg(F.count("*").alias("_rn")), "_blk")
        .filter((F.col("_ln") <= block_cap) & (F.col("_rn") <= block_cap))
        .select("_blk")
    )
    cand = lb.join(ok, "_blk").join(rb, "_blk")
    dist = F.levenshtein(F.col(left_col), F.col(right_col))
    scored = cand.withColumn("distance", dist).filter(
        F.col("distance") <= max_distance
    )
    sim = F.round(
        1.0
        - F.col("distance")
        / F.greatest(F.length(left_col), F.length(right_col)).cast("double"),
        6,
    )
    return scored.withColumn("similarity", sim).drop("_blk")
