"""Count-based bigram language model: train on a corpus, score documents
by perplexity — the classic model-based quality filter (CCNet-style: a
cheap LM trained on a trusted corpus scores a candidate corpus; docs
with outlier perplexity are gibberish, boilerplate, or wrong-language).

Complements operators/text.py (heuristic quality) and classify.py
(supervised NB): this is the UNSUPERVISED statistical filter a
training-data pipeline runs between them.

Plan shapes (100 TB):

- ``lm_train``: bigrams built INSIDE the token array (transform over an
  index sequence, same idiom as collocate.py — adjacency never crosses
  rows, no posexplode self-join); one map-combinable (w1, w2) count
  shuffle. ``min_count`` prunes the tail to phrase-table scale.
- ``lm_score``: the model is joined to per-doc exploded bigrams — the
  model side is broadcast under a size gate (vocabulary-scale tables
  always pass; an unpruned web-scale model falls back to a shuffled
  equi-join on w1/w2). Per-doc aggregation is map-combinable.

Determinism: per-bigram log-probabilities are rounded to 6 dp and
scaled to LONGS before the per-doc sum, so the engines' different
aggregation orders cannot diverge (the repo-wide scaled-long
convention); the final average and perplexity are single double
expressions over those exact sums.

Reference scope note: the reference has no aggregations at all
(StreamProcessOperations.scala:18-66 is per-record); this module is
part of the mandated beyond-reference training-data surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.text import tokens_lower as _toks

#: scale factor for the per-term scaled-long log-prob sums
_SCALE = 1_000_000


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str | None) -> DataFrame:
    """(doc?, w1, w2) adjacent pairs, built inside the token array."""
    from kafka_streams_plumber_spark.plans.scale import ensure_parallelism

    # Tokenize + bigram explode multiplies each document into hundreds
    # of rows; widen a narrow source first (guide §2.5 — one small
    # parquet split would otherwise run every branch single-task).
    docs = ensure_parallelism(docs)
    cols = [F.col(id_col).alias("doc")] if id_col else []
    toks = docs.select(*cols, _toks(F.col(text_col)).alias("w"))
    pair = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.size("w") - 2),
            lambda i: F.struct(
                F.col("w")[i].alias("w1"), F.col("w")[i + 1].alias("w2")
            ),
        )
    ).alias("g")
    carry = ["doc"] if id_col else []
    out = toks.where(F.size("w") >= 2).select(*carry, pair)
    return out.select(*carry, "g.w1", "g.w2")


def lm_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Train bigram counts: returns ``(w1, w2, pairs)``.

    The table is self-contained for scoring — context totals and the
    vocabulary size derive from it (see :func:`lm_score`), so a trained
    model round-trips through a plain parquet write. ``min_count``
    prunes rare bigrams (standard count cutoff; smoothing in the scorer
    handles the mass they carried).
    """
    return (
        _doc_bigrams(docs, text_col, None)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pairs"))
        .where(F.col("pairs") >= min_count)
    )


def _gram_logps(
    docs: DataFrame,
    lm: DataFrame,
    *,
    id_col: str,
    text_col: str,
    add_k: float,
    broadcast_threshold: int | None,
) -> DataFrame:
    """Per-bigram scaled-long log-probabilities ``(doc, slp)`` under an
    add-k-smoothed bigram model — the shared scoring core of
    :func:`lm_score` (mean -> perplexity) and :func:`min_k_prob`
    (mean of the lowest k%)."""
    # The model subtree has several consumers here (ctx, vocab, the
    # score join, the size gate). Exchange reuse dedupes the map-side
    # bigram shuffle — the corpus-scale work runs once — but each
    # consumer used to RE-RUN the final (w1, w2) count merge: column
    # pruning specialized every consumer's copy of the subtree (ctx
    # drops w2, vocab drops pairs), so no two copies stayed
    # canonically identical and a bare repartition pin could not be
    # shared (r11 measured: repartition("w1","w2") removed as
    # redundant by EnsureRequirements; repartition("w1") made three
    # UNSHARED exchange copies — the r12 profile showed FOUR identical
    # merge stages per execution). plans.scale.reuse_barrier solves
    # exactly this: behind the barrier no consumer can prune or
    # specialize the merge subtree, so the repartition("w1") exchange
    # is canonically identical everywhere and AQE materializes it ONCE
    # (ctx's groupBy("w1") additionally reuses its partitioning).
    # vocab stays the single explode(array(w1, w2)) branch (r11 —
    # guide §1.2).
    from kafka_streams_plumber_spark.plans.scale import reuse_barrier

    lm = reuse_barrier(lm).repartition("w1")
    ctx = lm.groupBy("w1").agg(F.sum("pairs").alias("ctx"))
    vocab = (
        lm.select(F.explode(F.array("w1", "w2")).alias("t"))
        # an EMPTY model (nothing survived training/min_count) would put
        # k * 0 in the denominator; clamping V to 1 degrades gracefully
        # to the uniform-smoothing score instead of div-by-zero garbage
        .agg(F.greatest(F.count_distinct("t").cast("double"), F.lit(1.0)).alias("v"))
    )
    model = lm
    if broadcast_threshold is not None and lm.count() <= broadcast_threshold:
        model, ctx = F.broadcast(lm), F.broadcast(ctx)

    grams = _doc_bigrams(docs, text_col, id_col)
    logp = F.log(
        (F.coalesce(F.col("pairs"), F.lit(0)) + F.lit(add_k))
        / (F.coalesce(F.col("ctx"), F.lit(0)) + F.lit(add_k) * F.col("v"))
    )
    return (
        grams.join(model, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc",
            F.round(logp * _SCALE).cast("bigint").alias("slp"),
        )
    )


def lm_score(
    docs: DataFrame,
    lm: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.5,
    broadcast_threshold: int | None = 2_000_000,
) -> DataFrame:
    """Score each document against a trained bigram model.

    Returns ``(doc_id, n_bigrams, avg_logp, perplexity)``:

    - ``avg_logp``: mean natural-log add-k-smoothed bigram probability,
      ``ln((pairs(w1,w2) + k) / (ctx(w1) + k * V))`` with ``ctx(w1) =
      sum_w2 pairs(w1, w2)`` and ``V`` = vocabulary size (distinct
      tokens of the model). Unseen bigrams/contexts fall back to the
      same formula with zero counts — add-k gives them mass.
    - ``perplexity``: ``exp(-avg_logp)`` — higher = less model-like;
      filter on a percentile band of it (see operators/stats.py).

    Docs with fewer than 2 tokens score NULL (no bigram evidence).

    The model, context, and vocab frames are broadcast only under the
    ``broadcast_threshold`` size gate (count of model rows), matching
    the repo-wide gated-broadcast convention; above the gate the joins
    degrade to shuffled equi-joins on the token keys.
    """
    scored = _gram_logps(
        docs,
        lm,
        id_col=id_col,
        text_col=text_col,
        add_k=add_k,
        broadcast_threshold=broadcast_threshold,
    )
    per_doc = scored.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("slp").alias("ssum"),
    )
    avg = F.col("ssum") / _SCALE / F.col("n_bigrams")
    # docs with < 2 tokens never produce a gram row: re-attach via the
    # id frame so they surface with NULL scores rather than vanishing
    ids = docs.select(F.col(id_col).alias("doc")).distinct()
    return (
        ids.join(per_doc, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0).cast("bigint")).alias("n_bigrams"),
            F.round(avg, 6).alias("avg_logp"),
            F.round(F.exp(-avg), 6).alias("perplexity"),
        )
    )


def lm_oracle_sql(
    *,
    add_k: float = 0.5,
    min_count: int = 1,
    table: str = "documents",
) -> str:
    """DuckDB oracle for train-then-self-score over ``table``: the same
    counts, the same scaled-long per-term rounding, the same one-double
    average (tokenization idiom shared with collocate.pmi_oracle_sql)."""
    return f"""
    WITH pos AS (
      SELECT doc_id AS doc,
             unnest(string_split(lower(text), ' ')) AS tok,
             generate_subscripts(string_split(lower(text), ' '), 1) AS p
      FROM {table}
    ),
    t AS (
      SELECT doc, tok,
             row_number() OVER (PARTITION BY doc ORDER BY p) AS p
      FROM pos WHERE tok <> ''
    ),
    grams AS (
      SELECT a.doc, a.tok AS w1, b.tok AS w2
      FROM t a JOIN t b ON a.doc = b.doc AND b.p = a.p + 1
    ),
    lm AS (
      SELECT w1, w2, count(*) AS pairs FROM grams GROUP BY w1, w2
      HAVING count(*) >= {min_count}
    ),
    ctx AS (SELECT w1, CAST(sum(pairs) AS BIGINT) AS ctx FROM lm GROUP BY w1),
    vocab AS (
      SELECT greatest(CAST(count(DISTINCT tok) AS DOUBLE), 1.0) AS v
      FROM (SELECT w1 AS tok FROM lm UNION ALL SELECT w2 FROM lm)
    ),
    scored AS (
      SELECT g.doc,
             CAST(round(ln((coalesce(lm.pairs, 0) + {add_k})
                           / (coalesce(ctx.ctx, 0) + {add_k} * v)) * 1000000, 0)
                  AS BIGINT) AS slp
      FROM grams g
      LEFT JOIN lm ON lm.w1 = g.w1 AND lm.w2 = g.w2
      LEFT JOIN ctx ON ctx.w1 = g.w1, vocab
    ),
    per_doc AS (
      SELECT doc, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(slp) AS BIGINT) AS ssum
      FROM scored GROUP BY doc
    )
    SELECT d.doc_id, coalesce(p.n_bigrams, 0) AS n_bigrams,
           round(p.ssum / 1000000.0 / p.n_bigrams, 6) AS avg_logp,
           round(exp(-(p.ssum / 1000000.0 / p.n_bigrams)), 6) AS perplexity
    FROM (SELECT DISTINCT doc_id FROM {table}) d
    LEFT JOIN per_doc p ON p.doc = d.doc_id
    """


def ppl_buckets(
    scored: DataFrame,
    group_col: str,
    *,
    ppl_col: str = "perplexity",
) -> DataFrame:
    """CCNet-style perplexity bucketing: within each group (source,
    language), assign every scored document to the ``head`` (lowest
    perplexity third), ``middle``, or ``tail`` bucket — the standard
    device for keeping a perplexity-stratified sample instead of
    hard-filtering on an absolute threshold.

    Terciles come from stats.exact_percentiles (range-partitioned
    parallel rank, quantile_cont-parity) and broadcast back — the
    scored table is scanned once and never window-funneled. Unscored
    docs (NULL perplexity: no bigrams) are excluded, matching CCNet
    which only buckets scoreable text.
    """
    from kafka_streams_plumber_spark.operators.stats import exact_percentiles

    scoreable = scored.filter(F.col(ppl_col).isNotNull())
    thresholds = exact_percentiles(
        scoreable, group_col, ppl_col, {"_t1": 1.0 / 3, "_t2": 2.0 / 3}
    )
    out = scoreable.join(F.broadcast(thresholds), group_col)
    bucket = (
        F.when(F.col(ppl_col) <= F.col("_t1"), F.lit("head"))
        .when(F.col(ppl_col) <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return out.withColumn("bucket", bucket).drop("_t1", "_t2")


def min_k_prob(
    docs: DataFrame,
    lm: DataFrame,
    *,
    k_frac: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.5,
    broadcast_threshold: int | None = 2_000_000,
) -> DataFrame:
    """Min-K%-Prob membership/contamination signal (Shi et al. 2024,
    "Detecting Pretraining Data from Large Language Models"): per doc,
    the mean log-probability of its LOWEST-``k_frac`` bigrams under the
    model. Returns ``(doc_id, n_bigrams, n_lowest, min_k_avg_logp,
    min_k_ppl)``.

    The insight: for text the model has SEEN, even the least-likely
    tokens score high — so the tail mean separates memorized/benchmark
    text from merely in-distribution text far better than whole-doc
    perplexity (which averages away the evidence). Run it with a model
    trained on a benchmark corpus to catch contamination, or on the
    training corpus itself to rank memorization risk.

    Docs with fewer than 2 tokens produce no bigram and are absent from
    the output (no evidence either way — unlike lm_score there is no
    NULL-row re-attach, absence IS the verdict here).

    Scale design: shares :func:`lm_score`'s scoring core (gated
    broadcast model, scaled-long logps); the lowest-k% selection is a
    per-DOC window (bounded by document length, millions of small
    partitions — never a hot key); the tail mean is one map-combinable
    aggregate. Ties at the cutoff are interchangeable (equal slp values
    sum identically under any tie order), so the result is engine- and
    partition-order-exact.
    """
    if not (0.0 < k_frac <= 1.0):
        raise ValueError("k_frac must be in (0, 1]")
    from pyspark.sql.window import Window

    scored = _gram_logps(
        docs,
        lm,
        id_col=id_col,
        text_col=text_col,
        add_k=add_k,
        broadcast_threshold=broadcast_threshold,
    )
    w = Window.partitionBy("doc").orderBy("slp")
    wn = Window.partitionBy("doc")
    ranked = scored.withColumn("_r", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(wn)
    )
    cut = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.lit(float(k_frac)) * F.col("_n")).cast("long"),
    )
    kept = ranked.where(F.col("_r") <= cut)
    per_doc = kept.groupBy("doc").agg(
        F.max("_n").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_lowest"),
        F.sum("slp").alias("_s"),
    )
    avg = F.col("_s") / _SCALE / F.col("n_lowest")
    return per_doc.select(
        F.col("doc").alias(id_col),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("n_lowest").cast("long").alias("n_lowest"),
        F.round(avg, 6).alias("min_k_avg_logp"),
        F.round(F.exp(-avg), 6).alias("min_k_ppl"),
    )


def min_k_oracle_sql(
    *,
    k_frac: float = 0.2,
    add_k: float = 0.5,
    min_count: int = 1,
    table: str = "documents",
) -> str:
    """DuckDB oracle for train-then-min-k-self-score: lm_oracle_sql's
    train/score CTEs plus the per-doc lowest-k% tail mean."""
    return f"""
    WITH pos AS (
      SELECT doc_id AS doc,
             unnest(string_split(lower(text), ' ')) AS tok,
             generate_subscripts(string_split(lower(text), ' '), 1) AS p
      FROM {table}
    ),
    t AS (
      SELECT doc, tok,
             row_number() OVER (PARTITION BY doc ORDER BY p) AS p
      FROM pos WHERE tok <> ''
    ),
    grams AS (
      SELECT a.doc, a.tok AS w1, b.tok AS w2
      FROM t a JOIN t b ON a.doc = b.doc AND b.p = a.p + 1
    ),
    lm AS (
      SELECT w1, w2, count(*) AS pairs FROM grams GROUP BY w1, w2
      HAVING count(*) >= {min_count}
    ),
    ctx AS (SELECT w1, CAST(sum(pairs) AS BIGINT) AS ctx FROM lm GROUP BY w1),
    vocab AS (
      SELECT greatest(CAST(count(DISTINCT tok) AS DOUBLE), 1.0) AS v
      FROM (SELECT w1 AS tok FROM lm UNION ALL SELECT w2 FROM lm)
    ),
    scored AS (
      SELECT g.doc,
             CAST(round(ln((coalesce(lm.pairs, 0) + {add_k})
                           / (coalesce(ctx.ctx, 0) + {add_k} * v)) * 1000000, 0)
                  AS BIGINT) AS slp
      FROM grams g
      LEFT JOIN lm ON lm.w1 = g.w1 AND lm.w2 = g.w2
      LEFT JOIN ctx ON ctx.w1 = g.w1, vocab
    ),
    ranked AS (
      SELECT doc, slp,
             row_number() OVER (PARTITION BY doc ORDER BY slp) AS r,
             count(*) OVER (PARTITION BY doc) AS n
      FROM scored
    ),
    kept AS (
      SELECT doc, n, slp FROM ranked
      WHERE r <= greatest(1, CAST(ceil({k_frac!r} * n) AS BIGINT))
    )
    SELECT doc AS doc_id,
           CAST(max(n) AS BIGINT) AS n_bigrams,
           CAST(count(*) AS BIGINT) AS n_lowest,
           round(CAST(sum(slp) AS BIGINT) / 1000000.0 / count(*), 6)
             AS min_k_avg_logp,
           round(exp(-(CAST(sum(slp) AS BIGINT) / 1000000.0 / count(*))), 6)
             AS min_k_ppl
    FROM kept GROUP BY doc
    """
