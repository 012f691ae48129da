"""Distributed linear text classification (Naive Bayes log-odds).

The quality/domain classifier step of a curation pipeline (the public
analog of CCNet's fastText filtering): train a multinomial Naive Bayes
model over token counts with plain aggregations, score documents with
one broadcast join + one sum — no MLlib, no driver-side model object,
nothing that fails at 100 TB.

Scale shape:
  - training is two hash aggregates over (token, label) counts — the
    model is O(vocab) rows however large the corpus, so partial
    aggregation collapses the token stream map-side;
  - scoring joins the exploded token stream against the broadcast
    model and sums per document — the corpus shuffles once on doc_id
    (and even that collapses map-side because the join preserves the
    scan partitioning of the exploded tokens).

Determinism: per-token log-odds weights are computed in double, then
frozen to scaled longs (1e-6 resolution). Document scores are exact
integer sums of frozen weights — order-insensitive, so results are
bit-identical across partitionings, retries, and engines (the property
the oracle gate hashes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed-point resolution for frozen log-odds weights
SCALE = 1_000_000


def _tokens(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda x: x != "")


def nb_train(
    df: DataFrame,
    text_col: str,
    label_col: str,
    *,
    alpha: float = 1.0,
) -> DataFrame:
    """Fit a binary multinomial Naive Bayes model.

    ``label_col`` must be 0/1 (int). Returns one frame carrying both
    the per-token weights and the prior:

        token=NULL row: weight = scaled log(P(y=1)/P(y=0)) prior
        token rows:     weight = scaled smoothed log-odds
                        log P(t|1) - log P(t|0)

    OOV tokens at scoring time contribute 0 (equivalent to folding the
    unseen-token mass into the prior — the standard hashed-NB trick).
    The model is O(vocab) rows; the heavy corpus never leaves its
    partitions (two partial aggregates).
    """
    toks = df.select(
        F.col(label_col).cast("int").alias("_y"),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.sum("_y").cast("long").alias("c1"),
        F.sum(1 - F.col("_y")).cast("long").alias("c0"),
    )
    # totals: class token masses + vocab size + doc priors, one row.
    totals = counts.agg(
        F.sum("c1").alias("n1"),
        F.sum("c0").alias("n0"),
        F.count("*").alias("v"),
    )
    docs = df.agg(
        F.sum(F.col(label_col).cast("int")).cast("double").alias("d1"),
        F.sum(1 - F.col(label_col).cast("int")).cast("double").alias("d0"),
    )
    t = totals.crossJoin(F.broadcast(docs))

    w = (
        counts.crossJoin(F.broadcast(t))
        .select(
            "token",
            F.round(
                (
                    F.log((F.col("c1") + alpha) / (F.col("n1") + alpha * F.col("v")))
                    - F.log((F.col("c0") + alpha) / (F.col("n0") + alpha * F.col("v")))
                )
                * SCALE
            )
            .cast("long")
            .alias("weight"),
        )
    )
    prior = t.select(
        F.lit(None).cast("string").alias("token"),
        F.round((F.log("d1") - F.log("d0")) * SCALE).cast("long").alias("weight"),
    )
    return w.unionByName(prior)


def nb_score(
    df: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str,
    *,
    score_col: str = "score",
) -> DataFrame:
    """Score documents against an :func:`nb_train` model.

    Returns (id, n_tokens, score, pred). ``score`` is the exact
    integer sum of frozen weights divided once by the scale — the
    log-odds of class 1; ``pred = score > 0``. The model side is
    broadcast (O(vocab)); the token stream aggregates back to doc
    granularity with map-side combine.
    """
    weights = model.filter(F.col("token").isNotNull())
    prior = model.filter(F.col("token").isNull()).select(
        F.col("weight").alias("_prior")
    )
    toks = df.select(
        F.col(id_col),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    )
    scored = (
        toks.join(F.broadcast(weights), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce("weight", F.lit(0))).alias("_wsum"),
        )
        .crossJoin(F.broadcast(prior))
    )
    return scored.select(
        id_col,
        "n_tokens",
        ((F.col("_wsum") + F.col("_prior")) / SCALE).alias(score_col),
        ((F.col("_wsum") + F.col("_prior")) > 0).alias("pred"),
    )
