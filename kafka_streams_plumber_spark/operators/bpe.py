"""BPE merge training (Sennrich et al. 2016) as DataFrame iterations.

Industrial BPE trainers never iterate over the corpus: they collapse it
to the word-frequency table first (O(distinct words) rows no matter how
many TB of text) and learn merges there. That is exactly the shape that
scales on Spark:

- one pass over the corpus: ``explode -> groupBy word`` with map-side
  partial counts (the only corpus-sized stage);
- per merge round, over the O(V) word table only:
    1. adjacent symbol pairs weighted by word count — a projection +
       one small aggregate;
    2. argmax pair via a single struct-min (count desc, then
       lexicographic pair asc tie-break) — a one-row frame, no sort;
    3. apply the merge with a symbol-array fold (exact greedy
       left-to-right, skip-after-merge — the reference BPE scan),
       broadcast of the one-row winner.

Words are symbol ARRAYS throughout (``array<string>``), and the merge
is an array fold, never a string replace: substring matching on a
joined representation can cross symbol boundaries (a learned pair
whose lhs is the suffix of an existing multi-char symbol would
spuriously match), which corrupts both training counts and
segmentation. The fold compares whole symbols only. The DuckDB oracle
replays the same fold with ``list_reduce`` over sentinel-prefixed
symbols (q_bpe_train unrolls all rounds and hash-matches the merge
list).

No end-of-word marker is appended (the </w> variant is a one-line
change in :func:`_to_symbols`); words shorter than 2 symbols simply
contribute no pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.text import WS_RE


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) over whitespace-run tokens — the corpus-collapsing
    pass (``\\s+`` split, so embedded newlines/tabs break words rather
    than becoming symbols)."""
    return (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.col(text_col), WS_RE), lambda x: x != ""
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _to_symbols(word: Column) -> Column:
    """Initial symbol array: one element per character."""
    return F.split(word, "")


def _pair_counts(words: DataFrame) -> DataFrame:
    """(lhs, rhs, pair_count) over adjacent symbol pairs, weighted by
    word count. One projection + one aggregate on the O(V) table."""
    syms = F.col("syms")
    pairs = F.zip_with(
        F.slice(syms, 1, F.size(syms) - 1),
        F.slice(syms, 2, F.size(syms) - 1),
        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
    )
    return (
        words.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy("p.lhs", "p.rhs")
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _best_pair(pairs: DataFrame) -> DataFrame:
    """One-row (lhs, rhs, pair_count) winner: max count, ties to the
    lexicographically smallest pair. struct-min, not a sort."""
    m = pairs.agg(
        F.min(
            F.struct(
                (-F.col("pair_count")).alias("nc"),
                F.col("lhs").alias("lhs"),
                F.col("rhs").alias("rhs"),
            )
        ).alias("b")
    )
    return m.select(
        F.col("b.lhs").alias("lhs"),
        F.col("b.rhs").alias("rhs"),
        (-F.col("b.nc")).alias("pair_count"),
    )


def apply_merge(syms: Column, lhs: Column, rhs: Column) -> Column:
    """Greedy left-to-right application of ONE merge rule to a symbol
    array: scan, and whenever the previous kept symbol equals ``lhs``
    and the current equals ``rhs``, fuse them (the fused symbol cannot
    immediately re-merge — ``lhs + rhs != lhs`` — which reproduces the
    reference scan's skip-after-merge). Whole-symbol comparison only:
    no substring/boundary hazards."""
    merged = F.concat(lhs, rhs)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == lhs) & (s == rhs),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    *,
    n_merges: int = 6,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the ordered merge table
    ``(merge_round, lhs, rhs, merged, pair_count)``.

    Deterministic: counts are exact longs, the argmax tie-break is
    total, and the fold applies merges leftmost-first — two runs on
    any partitioning produce the same merge list (the oracle property).
    The word table is localCheckpoint'ed per round to truncate lineage,
    as in clustering.kmeans_fit.
    """
    words = (
        word_counts(df, text_col)
        .select(_to_symbols(F.col("word")).alias("syms"), "cnt")
        .localCheckpoint(eager=True)
    )
    merges: DataFrame | None = None
    for rnd in range(1, n_merges + 1):
        best = _best_pair(_pair_counts(words)).localCheckpoint(eager=True)
        row = best.select(
            F.lit(rnd).alias("merge_round"),
            "lhs",
            "rhs",
            F.concat("lhs", "rhs").alias("merged"),
            "pair_count",
        )
        merges = row if merges is None else merges.unionByName(row)
        words = (
            words.crossJoin(F.broadcast(best))
            .select(
                apply_merge(
                    F.col("syms"), F.col("lhs"), F.col("rhs")
                ).alias("syms"),
                "cnt",
            )
            .localCheckpoint(eager=True)
        )
    assert merges is not None
    return merges


def bpe_segment(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    *,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge list to segment text: per word, start from
    characters and apply each merge in order (the standard greedy BPE
    encoder). Pure expressions — the merge list is baked into the plan
    as a chain of folds (fine for the few-hundred-merge vocabularies
    this trainer targets; a longer list belongs in a broadcast-join
    encoder)."""
    word = F.explode(
        F.filter(F.split(F.col(text_col), WS_RE), lambda x: x != "")
    ).alias("word")
    out = df.select("*", word)
    sym = _to_symbols(F.col("word"))
    for lhs, rhs in merges:
        sym = apply_merge(sym, F.lit(lhs), F.lit(rhs))
    return out.withColumn(out_col, sym).drop("word")
