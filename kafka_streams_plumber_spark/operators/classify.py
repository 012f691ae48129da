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

from pyspark.sql import Column, DataFrame, Window
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


# =====================================================================
# Logistic regression — fixed-iteration gradient descent, engine-exact
# =====================================================================


def lr_train(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    *,
    dim: int,
    iterations: int = 5,
    lr: float = 1.0,
    value_scale: int = SCALE,
) -> DataFrame:
    """Fit binary logistic regression on a numeric feature array by
    full-batch gradient descent with a FIXED iteration count:

        w <- w + lr * (1/n) * sum_i x_i * (y_i - sigmoid(x_i . w + b))

    (bias ``b`` trained as an extra coordinate). Returns ``dim + 1``
    rows ``(pos, weight)`` with the bias at ``pos = dim``. Labels must
    be 0/1.

    The gradient-descent sibling of :func:`nb_train` and the last
    member of the engine's distributed-training family (NB counts, BPE
    merges, k-means, PCA power iteration): per round the corpus is
    scanned once and NEVER shuffled — the weight vector rides as one
    broadcast row, the per-row residual is computed JVM-side, and the
    gradient is a posexplode + map-combinable per-position aggregate
    whose shuffle carries ``dim`` rows per partition.

    Engine-exact: the residual ``y - sigmoid(margin)`` is rounded to
    9 dp (so libm ``exp`` ulp noise cannot leak into the sums) and the
    per-position gradient terms are scaled-long sums — the oracle
    (:func:`lr_oracle_sql`) replays every round bit-for-bit.
    ``localCheckpoint`` truncates lineage per round.
    """
    from kafka_streams_plumber_spark.operators.similarity import dot

    x = df.select(
        F.concat(
            F.transform(F.col(vec_col), lambda c: c.cast("double")),
            F.array(F.lit(1.0)),  # bias coordinate
        ).alias("x"),
        F.col(label_col).cast("double").alias("y"),
    )
    x = x.localCheckpoint(eager=True)
    n_row = x.agg(F.count("*").cast("double").alias("n"))

    d1 = dim + 1
    w = n_row.select(
        F.array(*[F.lit(0.0) for _ in range(d1)]).alias("w"), "n"
    ).localCheckpoint(eager=True)

    for _ in range(int(iterations)):
        joined = x.crossJoin(F.broadcast(w))
        resid = joined.select(
            "x",
            "n",
            F.round(
                F.col("y")
                - 1.0 / (1.0 + F.exp(-dot(F.col("x"), F.col("w")))),
                9,
            ).alias("r"),
        )
        grad = (
            resid.select(F.posexplode("x").alias("pos", "_c"), "r", "n")
            .groupBy("pos")
            .agg(
                F.sum(
                    F.round(F.col("_c") * F.col("r") * value_scale, 0).cast("long")
                ).alias("_g"),
                F.max("n").alias("n"),
            )
        )
        gv = grad.agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "pos",
                            (F.col("_g").cast("double") / value_scale).alias("g"),
                        )
                    )
                ),
                lambda s: s["g"],
            ).alias("g"),
            F.max("n").alias("n"),
        )
        w = (
            gv.crossJoin(F.broadcast(w.select("w")))
            .select(
                F.zip_with(
                    "w",
                    "g",
                    lambda wi, gi: wi + F.lit(float(lr)) * gi / F.col("n"),
                ).alias("w"),
                "n",
            )
            .localCheckpoint(eager=True)
        )
    return w.select(F.posexplode("w").alias("pos", "weight")).select(
        "pos", "weight"
    )


def lr_oracle_sql(
    *,
    table: str = "embeddings",
    vec_col: str = "embedding",
    label_sql: str,
    dim: int,
    iterations: int = 5,
    lr: float = 1.0,
    value_scale: int = SCALE,
    round_to: int = 6,
) -> str:
    """DuckDB oracle for :func:`lr_train`: identical rounds unrolled
    as chained CTEs. ``label_sql`` is an expression over ``t`` yielding
    the 0/1 label."""
    d1 = dim + 1
    rng = f"range(1, {d1 + 1})"
    zeros = "[" + ", ".join("0.0" for _ in range(d1)) + "]"
    parts = [
        f"""WITH x AS (
          SELECT list_append(list_transform({vec_col}, c -> CAST(c AS DOUBLE)),
                             1.0) AS x,
                 CAST({label_sql} AS DOUBLE) AS y
          FROM {table} t
        ),""",
        "nr AS (SELECT count(*)::DOUBLE AS n FROM x),",
        f"w0 AS (SELECT {zeros}::DOUBLE[] AS w),",
    ]
    for i in range(int(iterations)):
        parts.append(
            f"""r{i} AS (
              SELECT x, round(y - 1.0 / (1.0 + exp(
                -list_sum(list_transform({rng}, j -> x[j] * w{i}.w[j]))
              )), 9) AS r FROM x, w{i}
            ),
            g{i} AS (
              SELECT pos, sum(CAST(round(c * r * {value_scale}) AS BIGINT)) AS g
              FROM (SELECT unnest(x) AS c,
                           generate_subscripts(x, 1) - 1 AS pos, r
                    FROM r{i})
              GROUP BY pos
            ),
            gv{i} AS (
              SELECT list(CAST(g AS DOUBLE) / {value_scale} ORDER BY pos) AS g
              FROM g{i}
            ),
            w{i + 1} AS (
              SELECT list_transform({rng},
                       j -> w.w[j] + {float(lr)} * gv.g[j] / nr.n) AS w
              FROM w{i} w, gv{i} gv, nr
            ),"""
        )
    parts[-1] = parts[-1].rstrip().rstrip(",")
    parts.append(
        f"""SELECT generate_subscripts(w, 1) - 1 AS pos,
               round(unnest(w), {round_to}) AS weight
        FROM w{int(iterations)}"""
    )
    return "\n".join(parts)


def calibration_report(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    *,
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram + ECE terms for any scored frame: bucket
    predictions by probability, compare each bucket's mean predicted
    probability against its realized positive rate — the standard
    check before trusting classifier scores as sampling weights or
    quality gates (a miscalibrated quality model silently skews the
    corpus mix).

    Returns one row per non-empty bucket: ``bucket`` (floor(p*bins),
    top-inclusive), ``n``, ``avg_prob``, ``frac_pos``, ``gap`` =
    |avg_prob - frac_pos| and ``weighted_gap`` = gap * n / total;
    ``sum(weighted_gap)`` is the Expected Calibration Error.

    Engine-exact: bucket means use scaled-long probability sums (the
    repo-wide order-proof device); every double is one fixed-order
    expression rounded to 6 dp. ONE map-combinable aggregate over the
    corpus + an O(bins) window for the total — the scored frame is
    never shuffled wide.
    """
    if bins < 2:
        raise ValueError("bins must be >= 2")
    p = F.col(prob_col).cast("double")
    bucket = F.least(
        F.floor(p * bins).cast("int"), F.lit(int(bins) - 1)
    )
    g = (
        df.select(
            bucket.alias("bucket"),
            F.round(p * 1_000_000).cast("long").alias("_sp"),
            F.col(label_col).cast("long").alias("_y"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("_sp").alias("_sps"),
            F.sum("_y").alias("_pos"),
        )
    )
    w = Window.partitionBy()  # O(bins) rows: a single-task total is fine
    avg_u = F.col("_sps").cast("double") / 1_000_000 / F.col("n")
    frac_u = F.col("_pos").cast("double") / F.col("n")
    gap_u = F.abs(avg_u - frac_u)
    return (
        g.withColumn("_total", F.sum("n").over(w))
        .select(
            "bucket",
            "n",
            F.round(avg_u, 6).alias("avg_prob"),
            F.round(frac_u, 6).alias("frac_pos"),
            F.round(gap_u, 6).alias("gap"),
            F.round(gap_u * F.col("n") / F.col("_total"), 6).alias(
                "weighted_gap"
            ),
        )
    )


def agreement_report(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Inter-rater agreement between two label columns: ONE row
    ``(n, n_agree, po, pe, kappa)`` — observed agreement, chance
    agreement, and Cohen's kappa.

    The labeled-data QA gate: run it on (human label, second human
    label) to audit annotation quality, or on (label, heuristic
    classifier) to decide whether a cheap gate can replace an expensive
    one — q_langid_eval's confusion matrix reduced to the one number
    reviewers compare. kappa ~ 0 means the raters agree no more than
    chance; > 0.8 is conventionally "strong".

    Exactness: po = n_agree/n and pe = sum_c(nA_c * nB_c) / n^2 are
    computed from exact long counts — pe's numerator is an INTEGER sum
    of marginal products (never a float accumulation over classes), so
    the result is partition-order-proof and replayable in SQL. NULL
    labels form their own marginal class but never count as agreement
    (NULL == NULL is not agreement — an unlabeled row is not evidence).
    kappa is NULL when pe == 1 (both raters constant: undefined).

    Scale: one map-combinable count aggregate over the data plus two
    O(classes) marginal aggregates joined at the class grain.
    """
    base = df.select(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
    tot = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum((F.col("_a") == F.col("_b")).cast("long")), F.lit(0)
        ).alias("n_agree"),
    )
    ma = base.groupBy("_a").agg(F.count(F.lit(1)).alias("_na"))
    mb = base.groupBy("_b").agg(F.count(F.lit(1)).alias("_nb"))
    pe_num = (
        ma.join(mb, ma["_a"].eqNullSafe(mb["_b"]))
        .agg(F.coalesce(F.sum(F.col("_na") * F.col("_nb")), F.lit(0)).alias("_pe_num"))
    )
    po = F.col("n_agree") / F.col("n")
    pe = F.col("_pe_num") / (F.col("n") * F.col("n"))
    return (
        tot.crossJoin(F.broadcast(pe_num))
        .select(
            "n",
            "n_agree",
            F.round(po, 6).alias("po"),
            F.round(pe, 6).alias("pe"),
            F.round((po - pe) / F.nullif(F.lit(1.0) - pe, F.lit(0.0)), 6).alias(
                "kappa"
            ),
        )
    )


def auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    round_scores: int | None = None,
) -> DataFrame:
    """Exact ROC AUC (Mann-Whitney rank formulation, tie-aware): ONE
    row ``(n_pos, n_neg, n_scores, auc)``.

    The classifier-eval headline number for every quality/domain gate
    this engine trains (nb_train, lr_train) or imports: threshold-free
    ranking power, calibration-insensitive where calibration_report is
    calibration-only. AUC = P(score_pos > score_neg) + 0.5 P(tie).

    Exactness: ties get average ranks, computed WITHOUT float rank
    averaging — per distinct score the doubled rank-sum contribution is
    ``n_pos_s * (first_s + last_s)`` (integers from cumulative counts),
    so ``AUC = (sum - n_pos*(n_pos+1)) / (2*n_pos*n_neg)`` is a single
    division of exact longs. NULL scores/labels are dropped.

    Scale design: scores collapse to the distinct-score grain first
    (one map-combinable aggregate), and the cumulative-count window
    runs on that O(distinct scores) frame. Raw model scores are
    continuous — pass ``round_scores`` (e.g. 6) to quantize them first,
    bounding the frame at 100 TB; the rounding is part of the metric
    definition then (standard practice, and the error is bounded by the
    quantum). AUC is NULL when either class is empty.
    """
    s = F.col(score_col).cast("double")
    if round_scores is not None:
        s = F.round(s, int(round_scores))
    base = df.select(
        s.alias("_s"), F.col(label_col).cast("boolean").alias("_y")
    ).where(F.col("_s").isNotNull() & F.col("_y").isNotNull())

    per_score = base.groupBy("_s").agg(
        F.count(F.lit(1)).alias("_n"),
        F.coalesce(F.sum(F.col("_y").cast("long")), F.lit(0)).alias("_np"),
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_score.withColumn("_cum", F.sum("_n").over(w))
    # doubled rank-sum of positives: first+last of the tie block
    contrib = F.col("_np") * (
        (F.col("_cum") - F.col("_n") + 1) + F.col("_cum")
    )
    tot = ranked.agg(
        F.coalesce(F.sum("_np"), F.lit(0)).alias("n_pos"),
        F.coalesce(F.sum(F.col("_n") - F.col("_np")), F.lit(0)).alias(
            "n_neg"
        ),
        F.count(F.lit(1)).alias("n_scores"),
        F.coalesce(F.sum(contrib), F.lit(0)).alias("_r2"),
    )
    return tot.select(
        "n_pos",
        "n_neg",
        "n_scores",
        F.round(
            (F.col("_r2") - F.col("n_pos") * (F.col("n_pos") + 1))
            / F.nullif(2 * F.col("n_pos") * F.col("n_neg"), F.lit(0)),
            6,
        ).alias("auc"),
    )


def best_threshold(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    round_scores: int | None = None,
) -> DataFrame:
    """Decision-threshold sweep: evaluate ``score >= t`` as a
    classifier at EVERY distinct score t and return the best-F1 row —
    ``(threshold, tp, fp, fn, tn, precision, recall, f1)`` (ties on F1
    broken toward the LOWEST threshold, i.e. higher recall).

    The gate-tuning step after auc: AUC says the score CAN rank;
    this says where to CUT it — the number that turns a quality
    scorer into a keep/drop rule. precision/recall/f1 are single
    double divisions of exact integer counts.

    Scale design: scores collapse to the distinct-score grain (one
    map-combinable aggregate; quantize with ``round_scores`` to bound
    it, same contract as :func:`auc`); cumulative positives/negatives
    ride ordering.running_total's distributed prefix sum (descending
    score order via the negated key); the argmax is a two-pass
    max-then-min-threshold pick, no window over the data. NULL
    scores/labels are dropped.
    """
    from kafka_streams_plumber_spark.operators.ordering import (
        running_total,
    )

    s = F.col(score_col).cast("double")
    if round_scores is not None:
        s = F.round(s, int(round_scores))
    base = df.select(
        s.alias("_s"), F.col(label_col).cast("boolean").alias("_y")
    ).where(F.col("_s").isNotNull() & F.col("_y").isNotNull())

    per = base.groupBy("_s").agg(
        F.coalesce(F.sum(F.col("_y").cast("long")), F.lit(0)).alias("_p"),
        F.coalesce(F.sum((~F.col("_y")).cast("long")), F.lit(0)).alias("_q"),
    ).withColumn("_neg", -F.col("_s"))
    # cumulate in DESCENDING score order: at threshold t, predictions
    # positive are all rows with score >= t
    cum = running_total(
        per, ["_neg"], ["_p", "_q"], out_col=["_tp", "_fp"]
    )
    totals = per.agg(
        F.sum("_p").alias("_tpos"), F.sum("_q").alias("_tneg")
    )
    cum = cum.crossJoin(F.broadcast(totals))

    f1_num = 2 * F.col("_tp")
    f1_den = (
        2 * F.col("_tp") + F.col("_fp") + (F.col("_tpos") - F.col("_tp"))
    )
    # Degenerate inputs stay defined: with zero positive labels every
    # F1 is 0 (the cumulative fp at each threshold includes the row's
    # own count, so the denominator is never 0 on a non-empty input) and
    # the sweep still returns the lowest threshold; the coalesce pins
    # that contract even if a future refactor makes the prefix sum
    # exclusive. An EMPTY input (or all-NULL scores/labels) returns an
    # empty DataFrame — there is no threshold to pick.
    f1 = F.coalesce(f1_num / F.nullif(f1_den, F.lit(0)), F.lit(0.0))
    scored = cum.select(
        F.col("_s").alias("threshold"),
        F.col("_tp").alias("tp"),
        F.col("_fp").alias("fp"),
        (F.col("_tpos") - F.col("_tp")).alias("fn"),
        (F.col("_tneg") - F.col("_fp")).alias("tn"),
        f1.alias("_f1"),
    )
    best = scored.agg(F.max("_f1").alias("_best"))
    pick = (
        scored.crossJoin(F.broadcast(best))
        .where(F.col("_f1") == F.col("_best"))
        .agg(F.min("threshold").alias("threshold"))
    )
    out = scored.join(pick, "threshold")
    return out.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(
            F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)), 6
        ).alias("precision"),
        F.round(
            F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)), 6
        ).alias("recall"),
        F.round("_f1", 6).alias("f1"),
    )


def gains_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    id_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Decile gains/lift table: rank by score descending, cut into
    ``n_bins`` equal-count bins, and report per bin
    ``(bin, n, positives, resp_rate, cum_capture, cum_lift)`` —
    the targeting readout ("the top decile captures 38% of all
    positives at 3.8x lift") that decides how deep a ranked
    keep/label/review queue is worth working.

    ``bin`` is 0-based from the top; ``cum_capture`` = share of ALL
    positives found at-or-above the bin; ``cum_lift`` = cumulative
    response rate over the base rate. Bin k holds exactly the rows
    with global rank in [k*N/n_bins, (k+1)*N/n_bins) — the integer
    ``floor(rank * n_bins / N)`` cut, deterministic because the rank
    is total-ordered by (score desc, ``id_col``).

    Scale design: the global rank is ordering.rank_by (range exchange,
    no single-task window); bin aggregation is map-combinable; the
    cumulative columns run on the O(n_bins) frame. All counts exact
    longs; rates/lift are final double divisions. NULLs dropped.
    """
    from kafka_streams_plumber_spark.operators.ordering import rank_by

    base = df.select(
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("boolean").alias("_y"),
        F.col(id_col).alias("_tie"),
    ).where(
        F.col(score_col).isNotNull()
        & F.col(label_col).isNotNull()
        & F.col(id_col).isNotNull()
    )
    ranked = rank_by(
        base, [F.col("_s").desc(), F.col("_tie")], pos_col="_r"
    )
    tot = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.coalesce(F.sum(F.col("_y").cast("long")), F.lit(0)).alias("_pos"),
    )
    binned = (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.floor((F.col("_r") * n_bins) / F.col("_n"))
            .cast("long")
            .alias("bin"),
            F.col("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.col("_y").cast("long")), F.lit(0)).alias(
                "positives"
            ),
        )
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    out = (
        binned.crossJoin(F.broadcast(tot))
        .withColumn("_cn", F.sum("n").over(w))
        .withColumn("_cp", F.sum("positives").over(w))
    )
    base_rate = F.col("_pos") / F.col("_n")
    return out.select(
        "bin",
        "n",
        "positives",
        F.round(F.col("positives") / F.col("n"), 6).alias("resp_rate"),
        F.round(
            F.col("_cp") / F.nullif(F.col("_pos"), F.lit(0)), 6
        ).alias("cum_capture"),
        F.round(
            (F.col("_cp") / F.col("_cn")) / F.nullif(base_rate, F.lit(0.0)),
            6,
        ).alias("cum_lift"),
    )


def krippendorff_alpha(
    df: DataFrame,
    unit_col: str,
    rater_col: str,
    value_col: str,
    *,
    level: str = "nominal",
    value_scale: int = 10**6,
) -> DataFrame:
    """Krippendorff's alpha — inter-rater reliability that, unlike
    :func:`cohens_kappa`, handles ANY number of raters and missing
    ratings (each unit just needs >= 2 ratings). The standard
    labeling-quality gate for multi-annotator datasets: alpha >= 0.8
    is conventionally "reliable", < 0.667 "discard".

    ``level`` picks the disagreement metric for the data's measurement
    level (Krippendorff's standard taxonomy):

    - ``"nominal"`` — categories, delta = 1{c != k} (default);
    - ``"interval"`` — numeric ratings, delta = (c - k)^2: a 1-vs-2
      disagreement on a 5-point quality score costs 1/16th of 1-vs-5
      instead of the same (``value_scale`` quantizes values to longs first,
      HALF_UP, default 6 dp);
    - ``"ordinal"`` — ranked categories, delta = (rank-mass between
      the two categories)^2 per Krippendorff: implemented EXACTLY as
      the interval metric over doubled marginal rank scores
      ``d_c = 2*cum_c - n_c`` (the average-rank device — integers by
      construction), so grades with unequal usage weight correctly.

    One row ``(n_units, n_ratings, n_categories, alpha)``. Units with a
    single rating are excluded (no pairable information — the standard
    treatment); duplicate (unit, rater) rows collapse to their MIN
    value so the input grain is forgiving but deterministic.

    Exactness (nominal): alpha = 1 - (n-1)*S / (L*(n^2 - sum_c n_c^2))
    where S = sum_u (L/(m_u-1)) * (m_u^2 - sum_c m_uc^2) — every
    per-unit disagreement term is EXACTLY integer because L = 360360 =
    lcm(1..15) absorbs the 1/(m_u-1) coincidence weights for up to 16
    ratings per unit; the sums ride decimal(38,0) (the correlation
    envelope) and the one double division happens last, so SQL replays
    the value bit-for-bit. Units with MORE than 16 ratings would break
    the integer device: alpha comes back NULL (with the counts still
    populated) rather than silently approximate — re-bucket raters or
    extend L if you genuinely have 17+ ratings of one unit.

    Exactness (interval/ordinal): the pairwise sum collapses by the
    variance identity ``sum_{i!=j}(v_i - v_j)^2 = 2*(m*sum v^2 -
    (sum v)^2)`` per unit and globally (the 2s cancel in the ratio),
    so alpha = 1 - (n-1)*sum_u (L/(m_u-1))*(m_u*Q_u - T_u^2) /
    (L*(n*Q - T^2)) with Q/T the (scaled-long) sum of squares / sum —
    all integers on decimal(38,0), one double division last. Same
    m_u <= 16 NULL contract.

    Scale design: two map-combinable aggregates (ratings -> per-unit
    [category counts | moment sums] -> per-unit terms), one
    O(categories) marginal aggregate, one broadcast cross-join of
    tiny frames. The ratings table is never self-joined — the m_uc^2
    / variance identities replace the pairwise coincidence walk; the
    ordinal rank scores are an O(categories) cumulative sum joined
    back by broadcast.
    """
    if level not in ("nominal", "interval", "ordinal"):
        raise ValueError(f"unknown level: {level!r}")
    L = 360360  # lcm(1..15): exact 1/(m_u - 1) weights through m_u = 16
    if level != "nominal":
        return _krippendorff_metric(
            df, unit_col, rater_col, value_col, level=level, value_scale=value_scale, L=L
        )
    r = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(unit_col).alias("_u"), F.col(rater_col).alias("_r")
        )
        .agg(F.min(F.col(value_col).cast("string")).alias("_v"))
    )
    per_uc = r.groupBy("_u", "_v").agg(F.count(F.lit(1)).alias("_muc"))
    per_u = (
        per_uc.groupBy("_u")
        .agg(
            F.sum("_muc").alias("_m"),
            F.sum(F.col("_muc") * F.col("_muc")).alias("_s2"),
        )
        .where(F.col("_m") >= 2)
    )
    terms = per_u.select(
        "_u",
        "_m",
        (
            (F.lit(L) / (F.col("_m") - 1)).cast("long")
            * (F.col("_m") * F.col("_m") - F.col("_s2"))
        )
        .cast("decimal(38,0)")
        .alias("_t"),
    )
    s = terms.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("_t").alias("_S"),
        F.max("_m").alias("_maxm"),
    )
    marg = (
        per_uc.join(per_u.select("_u"), "_u", "left_semi")
        .groupBy("_v")
        .agg(F.sum("_muc").alias("_nc"))
    )
    totals = marg.agg(
        F.count(F.lit(1)).alias("n_categories"),
        F.sum("_nc").cast("decimal(38,0)").alias("_n"),
        F.sum(F.col("_nc").cast("decimal(19,0)") * F.col("_nc").cast("decimal(19,0)")).alias("_nc2"),
    )
    out = s.crossJoin(F.broadcast(totals))
    de = F.col("_n") * F.col("_n") - F.col("_nc2")
    alpha = F.lit(1.0) - (
        ((F.col("_n") - 1) * F.col("_S")).cast("double")
        / (F.lit(L).cast("decimal(38,0)") * de).cast("double")
    )
    return out.select(
        F.col("n_units").cast("long").alias("n_units"),
        F.col("_n").cast("long").alias("n_ratings"),
        F.col("n_categories").cast("long").alias("n_categories"),
        F.round(
            F.when(
                (F.col("_maxm") <= 16) & (de.cast("double") > 0), alpha
            ),
            6,
        ).alias("alpha"),
    )


def _krippendorff_metric(
    df: DataFrame,
    unit_col: str,
    rater_col: str,
    value_col: str,
    *,
    level: str,
    value_scale: int,
    L: int,
) -> DataFrame:
    """Interval/ordinal Krippendorff core (see :func:`krippendorff_alpha`
    for the contract). Both levels run the same exact-integer variance
    identity; ordinal first replaces each rating with its doubled
    marginal rank score ``d_c = 2*cum_c - n_c`` (computed over the
    pairable panel's category marginals — an O(categories) cumulative
    sum joined back by broadcast), which is Krippendorff's ordinal
    metric up to the constant factor 4 that cancels in the ratio."""
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    v = F.col(value_col).cast("double")
    r = (
        df.filter(v.isNotNull())
        .groupBy(F.col(unit_col).alias("_u"), F.col(rater_col).alias("_r"))
        .agg(F.min(v).alias("_vd"))
    )
    per_u_m = r.groupBy("_u").agg(F.count(F.lit(1)).alias("_m"))
    pairable = per_u_m.where(F.col("_m") >= 2).select("_u", "_m")
    rp = r.join(F.broadcast(pairable.select("_u")), "_u", "left_semi")

    if level == "interval":
        scored = rp.select(
            "_u",
            F.round(F.col("_vd") * value_scale, 0).cast("long").alias("_s"),
            F.col("_vd").alias("_cat"),
        )
    else:  # ordinal: doubled average-rank score per category
        marg0 = rp.groupBy(F.col("_vd").alias("_c")).agg(
            F.count(F.lit(1)).alias("_nc")
        )
        # O(categories) rows: the single-task window is tiny by the
        # same argument as the nominal marginal aggregate
        wcum = Window.orderBy("_c").rowsBetween(
            Window.unboundedPreceding, 0
        )
        scores = marg0.select(
            "_c",
            "_nc",
            (2 * F.sum("_nc").over(wcum) - F.col("_nc"))
            .cast("long")
            .alias("_s"),
        )
        scored = rp.join(
            F.broadcast(scores), rp["_vd"] == scores["_c"]
        ).select("_u", "_s", F.col("_vd").alias("_cat"))

    per_u = (
        scored.groupBy("_u")
        .agg(
            F.count(F.lit(1)).alias("_m"),
            # decimal accumulation: ordinal _s is rank-scale (<= 2n,
            # so the per-unit LONG sum bound m * 2n is QUADRATIC in
            # row count and wraps at ~2e9 ratings) and interval _s is
            # a scaled value (wraps at m * |v|*value_scale > 2^63); decimal
            # before the sum, not after (r10 audit).
            F.sum(F.col("_s").cast("decimal(28,0)"))
            .cast("decimal(38,0)")
            .alias("_t"),
            F.sum(
                F.col("_s").cast("decimal(19,0)")
                * F.col("_s").cast("decimal(19,0)")
            ).alias("_q"),
        )
    )
    terms = per_u.select(
        "_u",
        "_m",
        (
            dec((F.lit(L) / (F.col("_m") - 1)).cast("long"))
            * (dec(F.col("_m")) * F.col("_q") - F.col("_t") * F.col("_t"))
        ).alias("_w"),
    )
    # Silent-skip guard (code-review r10): _w is NULL when a unit's
    # decimal products overflow (a sign-mixed unit can blow the _q
    # square-sum while its other sums cancel), and F.sum would
    # silently SKIP that unit while n_units still counts it. The
    # paired count feeds the output gate (fail-loud).
    s = terms.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("_w").alias("_S"),
        F.count("_w").alias("_wn"),
        F.max("_m").alias("_maxm"),
    )
    totals = scored.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        # the corpus-wide rank sum is ~n^2/2 — wraps a long at ~4e9
        # ratings; decimal accumulation (r10 audit)
        F.sum(F.col("_s").cast("decimal(28,0)"))
        .cast("decimal(38,0)")
        .alias("_T"),
        F.sum(
            F.col("_s").cast("decimal(19,0)")
            * F.col("_s").cast("decimal(19,0)")
        ).alias("_Q"),
        F.countDistinct("_cat").alias("n_categories"),
    )
    out = s.crossJoin(F.broadcast(totals))
    de = F.col("_n") * F.col("_Q") - F.col("_T") * F.col("_T")
    alpha = F.lit(1.0) - (
        ((F.col("_n") - 1) * F.col("_S")).cast("double")
        / (F.lit(L).cast("decimal(38,0)") * de).cast("double")
    )
    return out.select(
        F.col("n_units").cast("long").alias("n_units"),
        F.col("_n").cast("long").alias("n_ratings"),
        F.col("n_categories").cast("long").alias("n_categories"),
        F.round(
            F.when(
                (F.col("_maxm") <= 16)
                & (de.cast("double") > 0)
                & (F.col("_wn") == F.col("n_units")),
                alpha,
            ),
            6,
        ).alias("alpha"),
    )


def fleiss_kappa(
    df: DataFrame,
    unit_col: str,
    rater_col: str,
    value_col: str,
    *,
    n_raters: int,
) -> DataFrame:
    """Fleiss' kappa — multi-rater chance-corrected agreement for the
    FIXED-PANEL design (every unit rated by exactly ``n_raters``
    raters), the form most annotation-vendor SLAs quote. Use
    :func:`krippendorff_alpha` when ratings are missing or the rater
    count varies; on a complete panel the two give close but not
    identical values (kappa's chance model draws raters with
    replacement), so reporting both is the standard audit. Units with
    a rating count other than ``n_raters`` are EXCLUDED (the Fleiss
    model is undefined for them); duplicate (unit, rater) rows
    collapse to their MIN value.

    One row ``(n_units, n_raters, n_categories, kappa)``; kappa NULL
    when every rating is one category (chance agreement 1).

    Exactness: with S = sum_u (sum_c m_uc^2 - n) and C_c the category
    marginals, kappa = (N*n*S - (n-1)*sum C^2) /
    ((n-1)*((N*n)^2 - sum C^2)) — the (P_bar - P_e)/(1 - P_e) form
    multiplied through by (N*n)^2*(n-1), ALL exact integers on
    decimal(38,0); one double division last, so SQL replays
    bit-for-bit.

    Scale design: two map-combinable aggregates (ratings -> per-unit
    category counts -> per-unit terms), one O(categories) marginal
    aggregate, broadcast cross-joins of single-row frames — the
    ratings table is never self-joined.
    """
    assert n_raters >= 2
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    r = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(unit_col).alias("_u"), F.col(rater_col).alias("_r"))
        # min on the NATIVE type, cast after: numeric labels must
        # collapse numerically (min(9, 10) = 9), not lexicographically
        # (min("10", "9") = "10").
        .agg(F.min(F.col(value_col)).cast("string").alias("_v"))
    )
    per_uc = r.groupBy("_u", "_v").agg(F.count(F.lit(1)).alias("_muc"))
    per_u = (
        per_uc.groupBy("_u")
        .agg(
            F.sum("_muc").alias("_m"),
            F.sum(F.col("_muc") * F.col("_muc")).alias("_s2"),
        )
        .where(F.col("_m") == n_raters)
    )
    s = per_u.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_N"),
        F.coalesce(
            F.sum(F.col("_s2") - F.lit(n_raters)).cast("decimal(38,0)"),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_S"),
    )
    marg = (
        per_uc.join(per_u.select("_u"), "_u", "left_semi")
        .groupBy("_v")
        .agg(F.sum("_muc").alias("_nc"))
    )
    totals = marg.agg(
        F.count(F.lit(1)).alias("n_categories"),
        F.coalesce(
            F.sum(
                F.col("_nc").cast("decimal(19,0)")
                * F.col("_nc").cast("decimal(19,0)")
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_c2"),
    )
    out = s.crossJoin(F.broadcast(totals))
    n = F.lit(n_raters).cast("decimal(38,0)")
    nn = F.col("_N") * n  # total ratings
    num = F.col("_N") * n * F.col("_S") - (n - 1) * F.col("_c2")
    den = (n - 1) * (nn * nn - F.col("_c2"))
    return out.select(
        F.col("_N").cast("long").alias("n_units"),
        F.lit(n_raters).cast("long").alias("n_raters"),
        F.col("n_categories").cast("long").alias("n_categories"),
        F.round(
            num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0)), 6
        ).alias("kappa"),
    )


def cronbach_alpha(
    df: DataFrame,
    unit_col: str,
    item_col: str,
    value_col: str,
    *,
    value_scale: int = 10**6,
) -> DataFrame:
    """Cronbach's alpha — internal-consistency reliability of a
    multi-item numeric instrument (k rubric dimensions scoring the
    same documents, k judge prompts scoring the same responses):
    "do the items move together enough to justify summing them into
    one quality score". alpha >= 0.7 is the conventional bar; a LOW
    alpha says the composite hides disagreeing signals (report them
    separately), and alpha ~ 1 says the items are redundant.

    ``item_col`` values define the instrument; only units scored on
    EVERY item enter (listwise deletion — the standard treatment).
    Duplicate (unit, item) rows collapse to their MIN value.

    One row ``(n_units, n_items, alpha)``: alpha = k/(k-1) * (1 -
    sum_i var_i / var_total). NULL when k < 2, N < 2, or the unit
    totals are constant.

    Exactness: scores are scaled longs; with population-form integer
    variance kernels V_i = N*Q_i - T_i^2 (per item) and V_y = N*Q_y -
    T_y^2 (unit totals) — the 1/N^2 and sample/population factors
    cancel in the ratio — alpha = k*(V_y - sum V_i) / ((k-1)*V_y),
    exact integers on decimal(38,0), one double division. SQL replays
    bit-for-bit.

    Scale design: per-item and per-unit moment aggregates are both
    map-combinable; item count and completeness come from O(items)/
    O(units) grains; single-row broadcasts combine them. No
    self-joins, no windows, no Python.
    """
    v = F.round(F.col(value_col).cast("double") * value_scale, 0).cast("long")
    r = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(unit_col).alias("_u"), F.col(item_col).alias("_i"))
        .agg(F.min(v).alias("_s"))
    )
    k_items = r.agg(F.countDistinct("_i").alias("_k"))
    per_u = r.groupBy("_u").agg(
        F.count(F.lit(1)).alias("_m"),
        # decimal accumulation for the per-unit total score: a LONG
        # sum wraps once k_items * |v|*value_scale crosses 2^63 (r10
        # audit). |_y| CAN exceed the decimal(19,0) square envelope
        # below when k_items * |v|*value_scale >= 10^19 even though
        # every row honors the per-row contract — the paired-count
        # guards in the uy/vi aggregates NULL alpha in that regime
        # instead of silently skipping the overflowed unit.
        F.sum(F.col("_s").cast("decimal(28,0)"))
        .cast("decimal(38,0)")
        .alias("_y"),
    )
    complete = per_u.join(F.broadcast(k_items), F.col("_m") == F.col("_k"))
    rc = r.join(complete.select("_u"), "_u", "left_semi")
    items = rc.groupBy("_i").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        # same class: the per-item sum over ALL units is n * |v|*value_scale
        F.sum(F.col("_s").cast("decimal(28,0)"))
        .cast("decimal(38,0)")
        .alias("_t"),
        F.sum(
            F.col("_s").cast("decimal(19,0)") * F.col("_s").cast("decimal(19,0)")
        ).alias("_q"),
    )
    # Silent-skip guards (code-review r10): a decimal overflow NULLs a
    # per-item/per-unit TERM, and F.sum would silently SKIP it while
    # the row counts still include it — emitting a confidently wrong
    # alpha (e.g. 2.0) instead of NULL. Each sum of a nullable term
    # carries a paired count; the final expression NULLs on any
    # mismatch, restoring the fail-loud contract the long->decimal
    # hardening promised. (Overflows in the FINAL vy/num/den products
    # propagate NULL to alpha on their own; only summed terms can be
    # absorbed.)
    vi_term = F.col("_n") * F.col("_q") - F.col("_t") * F.col("_t")
    vi = items.agg(
        F.coalesce(
            F.sum(vi_term),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_svi"),
        # The paired count catches a NULLed TERM, but a SUM that
        # overflows decimal(38,0) also returns NULL (ansi off) and the
        # coalesce above would silently read it as 0 — so the raw
        # sum's null-ness is carried as its own gate (ADVICE r10).
        F.sum(vi_term).isNotNull().alias("_svi_ok"),
        F.count(F.lit(1)).alias("_vin"),
        F.count(vi_term).alias("_vit"),
    )
    qy_term = (
        F.col("_y").cast("decimal(19,0)")
        * F.col("_y").cast("decimal(19,0)")
    )
    uy = complete.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_N"),
        F.coalesce(
            F.sum("_y").cast("decimal(38,0)"), F.lit(0).cast("decimal(38,0)")
        ).alias("_ty"),
        F.coalesce(
            F.sum(qy_term),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_qy"),
        F.sum(qy_term).isNotNull().alias("_qy_ok"),
        F.count(qy_term).alias("_qyn"),
    )
    out = uy.crossJoin(F.broadcast(vi)).crossJoin(F.broadcast(k_items))
    vy = F.col("_N") * F.col("_qy") - F.col("_ty") * F.col("_ty")
    kd = F.col("_k").cast("decimal(38,0)")
    num = kd * (vy - F.col("_svi"))
    den = (kd - 1) * vy
    alpha = F.when(
        (F.col("_k") >= 2)
        & (F.col("_N") >= 2)
        & (F.col("_qyn") == F.col("_N").cast("long"))
        & (F.col("_vit") == F.col("_vin"))
        & F.col("_qy_ok")
        & F.col("_svi_ok"),
        F.round(
            num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0)), 6
        ),
    )
    return out.select(
        F.col("_N").cast("long").alias("n_units"),
        F.col("_k").cast("long").alias("n_items"),
        alpha.alias("alpha"),
    )


def cohen_kappa(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    weights: str | None = None,
) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between exactly TWO
    raters (or two model runs) whose labels arrive as two columns of
    the same row; the pairwise sibling of :func:`fleiss_kappa` and the
    standard "did the new model actually change decisions" audit when
    the two columns are old/new predictions. Rows where either label
    is NULL are dropped (no pair). ``weights`` is ``None`` (classic
    0/1 disagreement), ``"linear"`` or ``"quadratic"`` (ordinal
    labels: a near-miss costs |i-j| or (i-j)^2 over the category index
    in sorted label order — sorted on the NATIVE column type, so
    numeric labels order numerically).

    One row ``(n_items, n_categories, disagree_obs, disagree_exp,
    kappa)``: kappa = 1 - disagree_obs/disagree_exp, NULL when the
    expected disagreement is 0 (every label one category). The
    disagreement form makes one schema serve all three weightings —
    with 0/1 weights ``disagree_obs = 1 - p_o`` and
    ``disagree_exp = 1 - p_e`` exactly.

    Exactness: D_o = sum d_ij*n_ij and D_e = sum d_ij*a_i*b_j are
    exact integers on decimal(38,0) (integer index gaps, integer
    counts); kappa = (D_e - N*D_o)/D_e is one double division, so SQL
    replays bit-for-bit.

    Scale design: one map-combinable collapse to the (label_a,
    label_b) confusion grain — bounded by k^2 categories, NOT rows —
    then O(k)/O(k^2) arithmetic on broadcast-sized frames. The
    category-index window runs on the k-row label frame only.
    """
    if weights not in (None, "linear", "quadratic"):
        raise ValueError(f"unknown weights: {weights!r}")
    base = df.where(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
    cells = base.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_n"))

    # category index in sorted NATIVE order; the frame is k rows
    # (bounded by the label alphabet), so the bare window is fine
    labels = (
        cells.select(F.col("_a").alias("_v"))
        .union(cells.select(F.col("_b").alias("_v")))
        .distinct()
    )
    idx = labels.select(
        "_v",
        (F.dense_rank().over(Window.orderBy("_v")) - 1).alias("_i"),
    )

    ia = idx.select(F.col("_v").alias("_va"), F.col("_i").alias("_ia"))
    ib = idx.select(F.col("_v").alias("_vb"), F.col("_i").alias("_ib"))
    cab = (
        cells.join(F.broadcast(ia), F.col("_a") == F.col("_va"))
        .join(F.broadcast(ib), F.col("_b") == F.col("_vb"))
        .drop("_va", "_vb")
    )
    gap = F.abs(F.col("_ia") - F.col("_ib")).cast("decimal(19,0)")
    d_ij = {
        None: (F.col("_ia") != F.col("_ib")).cast("decimal(19,0)"),
        "linear": gap,
        "quadratic": gap * gap,
    }[weights]
    obs = cab.agg(
        F.coalesce(
            F.sum("_n").cast("decimal(38,0)"), F.lit(0).cast("decimal(38,0)")
        ).alias("_N"),
        F.coalesce(
            F.sum(d_ij * F.col("_n").cast("decimal(19,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_do"),
    )

    ma = cells.groupBy(F.col("_a").alias("_v")).agg(F.sum("_n").alias("_ca"))
    mb = cells.groupBy(F.col("_b").alias("_v")).agg(F.sum("_n").alias("_cb"))
    ma_i = ma.join(F.broadcast(idx), "_v").select("_ca", F.col("_i").alias("_ia"))
    mb_i = mb.join(F.broadcast(idx), "_v").select("_cb", F.col("_i").alias("_ib"))
    gap_e = F.abs(F.col("_ia") - F.col("_ib")).cast("decimal(19,0)")
    d_e = {
        None: (F.col("_ia") != F.col("_ib")).cast("decimal(19,0)"),
        "linear": gap_e,
        "quadratic": gap_e * gap_e,
    }[weights]
    exp = (
        ma_i.crossJoin(F.broadcast(mb_i))
        .agg(
            F.coalesce(
                F.sum(
                    d_e
                    * F.col("_ca").cast("decimal(19,0)")
                    * F.col("_cb").cast("decimal(19,0)")
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("_de")
        )
    )
    k_cats = idx.agg(F.count(F.lit(1)).alias("n_categories"))

    out = obs.crossJoin(F.broadcast(exp)).crossJoin(F.broadcast(k_cats))
    nd = F.col("_N")
    kappa = F.round(
        (F.col("_de") - nd * F.col("_do")).cast("double")
        / F.nullif(F.col("_de").cast("double"), F.lit(0.0)),
        6,
    )
    return out.select(
        F.col("_N").cast("long").alias("n_items"),
        F.col("n_categories").cast("long").alias("n_categories"),
        F.round(
            F.col("_do").cast("double")
            / F.nullif(nd.cast("double"), F.lit(0.0)),
            6,
        ).alias("disagree_obs"),
        F.round(
            F.col("_de").cast("double")
            / F.nullif((nd * nd).cast("double"), F.lit(0.0)),
            6,
        ).alias("disagree_exp"),
        kappa.alias("kappa"),
    )


def mcnemar(
    df: DataFrame,
    correct_a_col: str,
    correct_b_col: str,
    *,
    corrected: bool = True,
) -> DataFrame:
    """McNemar's test on paired binary outcomes — THE test for "is
    model B actually better than model A on the same eval set", where
    the two columns are per-item correctness flags of the two systems
    (a paired design: an unpaired proportion test throws away the
    per-item pairing and loses power). Only the discordant cells
    matter: b = A right / B wrong, c = A wrong / B right;
    chi2 = (|b-c| - 1)^2 / (b+c) with Edwards' continuity correction
    (``corrected=False`` drops the -1), 1 df. Rows with a NULL flag
    are dropped (no pair).

    One row ``(n_pairs, both_correct, both_wrong, only_a, only_b,
    chi2)``; chi2 NULL when b + c = 0 (no discordant pairs — the test
    is undefined, not "0"). The correction is applied verbatim even
    when |b-c| <= 1 (statsmodels-compatible), so tiny-n values can
    exceed the uncorrected statistic; documented, not hidden.

    Exactness: four conditional-count integers from one
    map-combinable aggregate; chi2 is one fixed-shape double division
    — replayed bit-for-bit in SQL.

    Scale design: a single pass, no shuffle beyond the one-row final
    aggregate (partial aggregation collapses map-side).
    """
    a = F.col(correct_a_col).cast("boolean")
    b = F.col(correct_b_col).cast("boolean")
    base = df.where(a.isNotNull() & b.isNotNull()).select(
        a.alias("_a"), b.alias("_b")
    )
    cnt = lambda c: F.coalesce(  # noqa: E731
        F.sum(c.cast("long")), F.lit(0)
    )
    agg = base.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        cnt(F.col("_a") & F.col("_b")).alias("both_correct"),
        cnt(~F.col("_a") & ~F.col("_b")).alias("both_wrong"),
        cnt(F.col("_a") & ~F.col("_b")).alias("only_a"),
        cnt(~F.col("_a") & F.col("_b")).alias("only_b"),
    )
    diff = F.abs(F.col("only_a") - F.col("only_b")).cast("double")
    num = (diff - F.lit(1.0)) if corrected else diff
    disc = (F.col("only_a") + F.col("only_b")).cast("double")
    return agg.select(
        "n_pairs",
        "both_correct",
        "both_wrong",
        "only_a",
        "only_b",
        F.round(num * num / F.nullif(disc, F.lit(0.0)), 6).alias("chi2"),
    )


def kendall_w(
    df: DataFrame,
    item_col: str,
    rater_col: str,
    score_col: str,
    *,
    n_raters: int,
) -> DataFrame:
    """Kendall's coefficient of concordance W — do ``n_raters`` judges
    RANK the items the same way, regardless of each judge's personal
    scale? The ordinal sibling of :func:`fleiss_kappa` (categories) and
    :func:`cronbach_alpha` (interval): scores are reduced to
    within-rater midranks first, so a judge who scores everything 2x
    higher agrees perfectly with one who doesn't. W = 1 is identical
    rankings, W = 0 is no association. The standard audit for "are my
    LLM-judge prompts consistent" and for scorer panels.

    Complete-panel design like Fleiss: items with a rating count other
    than ``n_raters`` are EXCLUDED; duplicate (item, rater) rows
    collapse to their MIN score on the native type. One row
    ``(n_items, n_raters, w, chi2)`` with the chi-square
    approximation chi2 = m*(n-1)*W (df = n-1); W NULL when n_items
    < 2 or every rater ties every item (zero denominator).

    Exactness: the doubled-midrank device — per (rater, score) tie
    block the doubled midrank is ``2*cum - t + 1`` from cumulative
    counts, so each item's doubled rank-sum D_i is an exact integer,
    and with T = sum(t^3 - t) over tie blocks,
    W = 3*(n*sum(D^2) - (sum D)^2) / (n*(m^2*(n^3-n) - m*T)) — ALL
    integers on decimal(38,0), one double division, replayed
    bit-for-bit in SQL.

    Scale design: collapse to the (rater, score) distinct grain, ONE
    global range exchange (ordering.running_total over (rater,
    score)) turned into within-rater cumulative counts by subtracting
    the O(raters)-row per-rater offsets (broadcast back), one join of
    the ratings against the tie-block grain, one aggregate per item,
    one final row. No window ever sees more than the distinct grain.
    """
    from kafka_streams_plumber_spark.operators.ordering import (
        running_total,
    )

    assert n_raters >= 2
    r = (
        df.where(
            F.col(item_col).isNotNull()
            & F.col(rater_col).isNotNull()
            & F.col(score_col).isNotNull()
        )
        .groupBy(
            F.col(item_col).alias("_u"), F.col(rater_col).alias("_r")
        )
        .agg(F.min(F.col(score_col)).alias("_v"))
    )
    complete = (
        r.groupBy("_u")
        .agg(F.count(F.lit(1)).alias("_m"))
        .where(F.col("_m") == n_raters)
        .select("_u")
    )
    from kafka_streams_plumber_spark.plans.scale import truncate_lineage

    # the complete-panel grain feeds three branches (tie-block counts,
    # rater totals, the per-item rank-sum join): materialize it once
    rc = truncate_lineage(r.join(complete, "_u", "left_semi"))

    per = rc.groupBy("_r", "_v").agg(F.count(F.lit(1)).alias("_t"))
    g = running_total(per, ["_r", "_v"], "_t", out_col="_cum")
    rtot = per.groupBy("_r").agg(F.sum("_t").alias("_nr"))
    roff = running_total(rtot, ["_r"], "_nr", out_col="_cr")
    g = g.join(
        F.broadcast(
            roff.select(
                "_r", (F.col("_cr") - F.col("_nr")).alias("_off")
            )
        ),
        "_r",
    )
    # doubled midrank of the tie block: first + last rank within rater
    cells = g.select(
        "_r",
        "_v",
        "_t",
        (
            F.lit(2) * (F.col("_cum") - F.col("_off"))
            - F.col("_t")
            + F.lit(1)
        ).alias("_d2r"),
    )
    per_item = (
        rc.join(cells, ["_r", "_v"])
        .groupBy("_u")
        .agg(F.sum("_d2r").cast("decimal(38,0)").alias("_D"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = per_item.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.coalesce(F.sum("_D"), F.lit(0).cast("decimal(38,0)")).alias("_sd"),
        F.coalesce(
            F.sum(F.col("_D") * F.col("_D")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_sd2"),
    )
    t19 = F.col("_t").cast("decimal(19,0)")
    ties = cells.agg(
        F.coalesce(
            F.sum(dec(t19 * t19 * t19 - t19)),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_T")
    )
    out = s.crossJoin(F.broadcast(ties))
    m = F.lit(n_raters).cast("decimal(38,0)")
    n = F.col("_n")
    num = F.lit(3).cast("decimal(38,0)") * (
        n * F.col("_sd2") - F.col("_sd") * F.col("_sd")
    )
    den = n * (m * m * (n * n * n - n) - m * F.col("_T"))
    w = F.round(
        num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0)), 6
    )
    return out.select(
        n.cast("long").alias("n_items"),
        F.lit(n_raters).cast("long").alias("n_raters"),
        w.alias("w"),
        F.round(
            F.lit(float(n_raters))
            * (n.cast("double") - F.lit(1.0))
            * num.cast("double")
            / F.nullif(den.cast("double"), F.lit(0.0)),
            6,
        ).alias("chi2"),
    )


def cochran_q(
    df: DataFrame,
    unit_col: str,
    treatment_col: str,
    outcome_col: str,
    *,
    n_treatments: int,
) -> DataFrame:
    """Cochran's Q — the k-sample extension of :func:`mcnemar`: did
    ANY of k systems' per-item success rates differ, on the same item
    panel (k paired binary columns in long form). The standard "which
    of my k prompts/models is actually different" omnibus before
    pairwise McNemar drill-downs. Complete-panel design like
    :func:`fleiss_kappa`: items with an outcome count other than
    ``n_treatments`` are EXCLUDED; duplicate (unit, treatment) rows
    collapse by MAX (any success counts, :func:`ab_test`'s unit
    rule). One row ``(n_items, k, df, q)``; Q is chi-square with k-1
    df under the null. Q NULL when the denominator is 0 (every item
    all-success or all-failure — no discrimination).

    Exactness: Q = (k-1) * (k*sum(C_j^2) - T^2) /
    (k*T - sum(R_i^2)) with C_j the per-treatment success totals, R_i
    the per-item success totals, T the grand total — ALL exact
    integers on decimal(38,0), one double division, replayed
    bit-for-bit in SQL.

    Scale design: two map-combinable aggregates (per-item, then
    1-row) plus an O(k) treatment aggregate broadcast in — the panel
    is never self-joined.
    """
    assert n_treatments >= 2
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    r = (
        df.where(F.col(outcome_col).isNotNull())
        .groupBy(
            F.col(unit_col).alias("_u"),
            F.col(treatment_col).alias("_t"),
        )
        .agg(
            F.max(F.col(outcome_col).cast("boolean").cast("int")).alias(
                "_y"
            )
        )
    )
    per_u = (
        r.groupBy("_u")
        .agg(
            F.count(F.lit(1)).alias("_m"),
            F.sum("_y").alias("_r"),
        )
        .where(F.col("_m") == n_treatments)
    )
    s = per_u.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_N"),
        F.coalesce(
            F.sum("_r").cast("decimal(38,0)"),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_T"),
        F.coalesce(
            F.sum(
                F.col("_r").cast("decimal(19,0)")
                * F.col("_r").cast("decimal(19,0)")
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_R2"),
    )
    cj = (
        r.join(per_u.select("_u"), "_u", "left_semi")
        .groupBy("_t")
        .agg(F.sum("_y").alias("_c"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("_c").cast("decimal(19,0)")
                    * F.col("_c").cast("decimal(19,0)")
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("_C2")
        )
    )
    out = s.crossJoin(F.broadcast(cj))
    k = F.lit(n_treatments).cast("decimal(38,0)")
    num = (k - 1) * (k * F.col("_C2") - F.col("_T") * F.col("_T"))
    den = k * F.col("_T") - F.col("_R2")
    return out.select(
        F.col("_N").cast("long").alias("n_items"),
        F.lit(n_treatments).cast("long").alias("k"),
        F.lit(n_treatments - 1).cast("long").alias("df"),
        F.round(
            num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0)),
            6,
        ).alias("q"),
    )


def icc(
    df: DataFrame,
    unit_col: str,
    rater_col: str,
    value_col: str,
    *,
    n_raters: int,
    scale: int = 6,
) -> DataFrame:
    """Intraclass correlation ICC(2,1) and ICC(3,1) — chance-corrected
    agreement for CONTINUOUS scores on the two-way complete panel
    (every item scored by the same ``n_raters`` raters): the
    continuous sibling of :func:`fleiss_kappa` (categories),
    :func:`kendall_w` (ranks) and :func:`cronbach_alpha` (consistency
    of the SUM). ICC(2,1) treats raters as random (absolute agreement
    — generalizes to new raters); ICC(3,1) treats them as fixed
    (consistency — rater level offsets forgiven). Reporting both is
    the standard Shrout-Fleiss audit. Items with a score count other
    than ``n_raters`` are EXCLUDED; duplicate (unit, rater) rows
    collapse to their MIN value.

    One row ``(n_items, n_raters, icc2_1, icc3_1)``; NULL when
    n_items < 2 or the denominator is 0 (a constant panel).

    Exactness: scores freeze to scaled longs, then the two-way ANOVA
    sums-of-squares are cleared of every division —
    B = n*sum(R_i^2) - T^2, C = k*sum(C_j^2) - T^2,
    E = (nk*Q - T^2) - B - C — and

        ICC(2,1) = (n(k-1)B - nE) /
                   (n(k-1)B + n(k-1)E + k(n-1)C - kE)
        ICC(3,1) = (n(k-1)B - nE) / (n(k-1)B + n(k-1)E)

    with ALL terms exact integers on decimal(38,0); one double
    division each — replayed bit-for-bit in SQL.

    Scale design: one collapse to the (item, rater) grain, one
    per-item aggregate, one O(k) per-rater aggregate broadcast in —
    the panel is never self-joined, no windows.
    """
    assert n_raters >= 2
    mult = float(10 ** int(scale))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    r = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(
            F.col(unit_col).alias("_u"), F.col(rater_col).alias("_r")
        )
        .agg(
            F.round(
                F.min(F.col(value_col)).cast("double") * F.lit(mult)
            )
            .cast("long")
            .alias("_s")
        )
    )
    per_u = (
        r.groupBy("_u")
        .agg(
            F.count(F.lit(1)).alias("_m"),
            # decimal accumulation: a LONG per-unit row sum wraps at
            # n_raters * |v|*scale > 2^63, and the unit-total sum _T
            # below wraps at n_units * that (r10 audit). |_ri| CAN
            # exceed the decimal(19,0) square envelope when
            # n_raters * |v|*scale >= 10^19 even though every row
            # honors the per-row contract — the paired-count guards
            # in the s/cj aggregates NULL the ICCs in that regime
            # instead of silently skipping the overflowed unit.
            F.sum(F.col("_s").cast("decimal(28,0)"))
            .cast("decimal(38,0)")
            .alias("_ri"),
            F.sum(
                F.col("_s").cast("decimal(19,0)")
                * F.col("_s").cast("decimal(19,0)")
            ).alias("_qi"),
        )
        .where(F.col("_m") == n_raters)
    )
    # Silent-skip guards (code-review r10): a decimal overflow NULLs a
    # per-unit/per-rater TERM (|_ri| or |_c| >= 10^19 fails the dec19
    # cast; a unit's _qi square-sum can pass 10^38 under sign-mixed
    # inputs whose other sums cancel), and F.sum would silently SKIP
    # it while the counts still include it — wrong ICCs instead of
    # NULL. Each sum of a nullable term carries a paired count and the
    # output gate NULLs on mismatch (fail-loud).
    r2_term = dec(F.col("_ri").cast("decimal(19,0)")) * F.col(
        "_ri"
    ).cast("decimal(19,0)")
    s = per_u.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.coalesce(
            F.sum("_ri").cast("decimal(38,0)"),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_T"),
        F.coalesce(F.sum("_qi"), F.lit(0).cast("decimal(38,0)")).alias(
            "_Q"
        ),
        F.coalesce(
            F.sum(r2_term),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_R2"),
        # Raw-sum null gates: a decimal(38,0) SUM overflow returns NULL
        # (ansi off) and the coalesces above would read it as 0 while
        # every TERM was non-NULL, slipping past the paired counts
        # (ADVICE r10). Carried into the output gate below.
        F.sum("_qi").isNotNull().alias("_q_ok"),
        F.sum(r2_term).isNotNull().alias("_r2_ok"),
        F.count(F.lit(1)).alias("_sn"),
        F.count("_qi").alias("_qin"),
        F.count(r2_term).alias("_r2n"),
    )
    c2_term = dec(F.col("_c").cast("decimal(19,0)")) * F.col("_c").cast(
        "decimal(19,0)"
    )
    cj = (
        r.join(per_u.select("_u"), "_u", "left_semi")
        .groupBy("_r")
        # per-rater column sum over ALL units — n_units * |v|*scale,
        # the widest sum in the kernel; decimal accumulation (r10
        # audit)
        .agg(
            F.sum(F.col("_s").cast("decimal(28,0)"))
            .cast("decimal(38,0)")
            .alias("_c")
        )
        .agg(
            F.coalesce(
                F.sum(c2_term),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("_C2"),
            F.sum(c2_term).isNotNull().alias("_c2_ok"),
            F.count(F.lit(1)).alias("_cjn"),
            F.count(c2_term).alias("_c2n"),
        )
    )
    out = s.crossJoin(F.broadcast(cj))
    k = F.lit(n_raters).cast("decimal(38,0)")
    n = F.col("_n")
    b = n * F.col("_R2") - F.col("_T") * F.col("_T")
    c = k * F.col("_C2") - F.col("_T") * F.col("_T")
    a_tot = n * k * F.col("_Q") - F.col("_T") * F.col("_T")
    e = a_tot - b - c
    num = n * (k - 1) * b - n * e
    den2 = n * (k - 1) * b + n * (k - 1) * e + k * (n - 1) * c - k * e
    den3 = n * (k - 1) * b + n * (k - 1) * e
    ok = (
        (n >= 2)
        & (F.col("_qin") == F.col("_sn"))
        & (F.col("_r2n") == F.col("_sn"))
        & (F.col("_c2n") == F.col("_cjn"))
        & F.col("_q_ok")
        & F.col("_r2_ok")
        & F.col("_c2_ok")
    )
    return out.select(
        n.cast("long").alias("n_items"),
        F.lit(n_raters).cast("long").alias("n_raters"),
        F.when(
            ok,
            F.round(
                num.cast("double")
                / F.nullif(den2.cast("double"), F.lit(0.0)),
                6,
            ),
        ).alias("icc2_1"),
        F.when(
            ok,
            F.round(
                num.cast("double")
                / F.nullif(den3.cast("double"), F.lit(0.0)),
                6,
            ),
        ).alias("icc3_1"),
    )


def classification_report(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class precision / recall / F1 with supports — the standard
    model-eval table (sklearn's classification_report as a DataFrame),
    the multi-class companion to :func:`mcnemar` (paired comparison)
    and :func:`cohen_kappa` (agreement). One row per class in the
    UNION of true and predicted labels: ``(label, support, predicted,
    tp, precision, recall, f1)``; precision NULL when the class is
    never predicted, recall NULL when it never occurs, f1 NULL when
    tp + fp + fn = 0. Rows with a NULL label or prediction are
    dropped. Micro/macro averages are one trivial aggregate over this
    output — left to the caller so the schema stays per-class.

    Exactness: everything is integer counts off the confusion-cell
    grain until three double divisions (f1 computed directly as
    2*tp/(2*tp + fp + fn) — no compounding through rounded
    precision/recall) — replayed bit-for-bit in SQL.

    Scale design: ONE map-combinable collapse to the (label, pred)
    confusion grain (bounded by k^2 classes, not rows), then O(k)
    marginal aggregates full-outer-joined on the class key.
    """
    base = df.where(
        F.col(label_col).isNotNull() & F.col(pred_col).isNotNull()
    ).select(
        F.col(label_col).alias("_l"), F.col(pred_col).alias("_p")
    )
    cells = base.groupBy("_l", "_p").agg(F.count(F.lit(1)).alias("_n"))
    truth = cells.groupBy(F.col("_l").alias("_c")).agg(
        F.sum("_n").alias("support")
    )
    pred = cells.groupBy(F.col("_p").alias("_c")).agg(
        F.sum("_n").alias("predicted")
    )
    tp = (
        cells.where(F.col("_l") == F.col("_p"))
        .groupBy(F.col("_l").alias("_c"))
        .agg(F.sum("_n").alias("tp"))
    )
    out = (
        truth.join(pred, "_c", "full_outer")
        .join(tp, "_c", "left")
        .select(
            F.col("_c").alias("label"),
            F.coalesce("support", F.lit(0)).cast("long").alias("support"),
            F.coalesce("predicted", F.lit(0))
            .cast("long")
            .alias("predicted"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
    )
    tpd = F.col("tp").cast("double")
    return out.select(
        "label",
        "support",
        "predicted",
        "tp",
        F.round(
            tpd / F.nullif(F.col("predicted").cast("double"), F.lit(0.0)),
            6,
        ).alias("precision"),
        F.round(
            tpd / F.nullif(F.col("support").cast("double"), F.lit(0.0)), 6
        ).alias("recall"),
        F.round(
            F.lit(2.0)
            * tpd
            / F.nullif(
                (F.col("support") + F.col("predicted")).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("f1"),
    )


def brier_decomposition(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    *,
    round_probs: int = 6,
) -> DataFrame:
    """Murphy decomposition of the Brier score — splits a
    probabilistic classifier's squared error into WHY it is wrong:
    ``brier = reliability - resolution + uncertainty``. Reliability
    (lower better) is miscalibration — :func:`calibration_report`'s
    ECE cousin in squared form; resolution (higher better) is how far
    the forecasts dare to move from the base rate; uncertainty is the
    data's irreducible ``ybar*(1-ybar)``. Two models with equal Brier
    can differ entirely in character — this says which is bold and
    which is merely hedged. One row ``(n, base_rate, brier,
    reliability, resolution, uncertainty)``; NULL scores when n = 0.

    The decomposition conditions on DISTINCT forecast values (not
    bins), where the identity is exact; ``round_probs`` quantizes
    first (mann_whitney's grain contract), which also makes the
    identity hold at the quantized forecasts.

    Exactness: probabilities freeze to 1e-6 scaled longs; per
    distinct forecast the cleared numerators e = n*p_s - 1e6*pos and
    f = N*pos - n*P are exact integers, and the per-value quotients
    e^2/n, f^2/n ride the kruskal_wallis round((e/n)*e*1e6) IEEE
    freeze — so every sum is an exact integer sum; brier itself is a
    fully exact integer sum of (p_s - 1e6*y)^2. Replayed bit-for-bit
    in SQL.

    Scale design: ONE collapse to the distinct-forecast grain with a
    1-row totals broadcast, then an O(distinct) aggregate.
    """
    mult = 1000000
    p = F.round(F.col(prob_col).cast("double"), int(round_probs))
    y = F.col(label_col).cast("boolean").cast("int")
    base = df.where(p.isNotNull() & y.isNotNull()).select(
        F.round(p * F.lit(float(mult))).cast("long").alias("_p"),
        y.alias("_y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per_p = base.groupBy("_p").agg(
        F.count(F.lit(1)).alias("_n"),
        F.coalesce(F.sum("_y"), F.lit(0)).alias("_pos"),
        F.coalesce(
            F.sum(
                dec(
                    (F.col("_p") - F.col("_y") * F.lit(mult)).cast(
                        "decimal(19,0)"
                    )
                    * (F.col("_p") - F.col("_y") * F.lit(mult)).cast(
                        "decimal(19,0)"
                    )
                )
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_sq"),
    )
    # rename before aggregating: tot derives from per_p, so the
    # crossJoin back would otherwise carry two `_n` lineages
    tot = (
        per_p.select(
            F.col("_n").alias("_tn"), F.col("_pos").alias("_tpos")
        )
        .agg(
            F.coalesce(F.sum("_tn"), F.lit(0)).alias("_N"),
            F.coalesce(F.sum("_tpos"), F.lit(0)).alias("_P"),
        )
    )
    # fresh names on the fact side: tot derives from per_p, so ANY
    # shared name (even non-output ones in tot's subtree) resolves
    # ambiguously after the self-join dedup
    j = per_p.select(
        F.col("_p").alias("_cp"),
        F.col("_n").alias("_cn"),
        F.col("_pos").alias("_cpos"),
        F.col("_sq").alias("_csq"),
    ).crossJoin(F.broadcast(tot))
    e = (
        F.col("_cn").cast("decimal(38,0)") * F.col("_cp")
        - F.lit(mult) * F.col("_cpos").cast("decimal(38,0)")
    )
    f_ = (
        F.col("_N").cast("decimal(38,0)") * F.col("_cpos")
        - F.col("_cn").cast("decimal(38,0)") * F.col("_P")
    )
    # x^2/n frozen at 1e-6 resolution (the kruskal_wallis device);
    # the 1e6 divides back out in the final expressions
    frz = lambda x: F.round(  # noqa: E731
        x.cast("double")
        / F.col("_cn").cast("double")
        * x.cast("double")
        * F.lit(1000000.0)
    ).cast("decimal(38,0)")
    agg = j.agg(
        F.coalesce(
            F.sum(F.col("_csq")), F.lit(0).cast("decimal(38,0)")
        ).alias("_bs"),
        F.coalesce(F.sum(frz(e)), F.lit(0).cast("decimal(38,0)")).alias(
            "_rel"
        ),
        F.coalesce(F.sum(frz(f_)), F.lit(0).cast("decimal(38,0)")).alias(
            "_res"
        ),
    ).crossJoin(F.broadcast(tot))
    nd = F.col("_N").cast("double")
    pd_ = F.col("_P").cast("double")
    m2 = F.lit(float(mult) * float(mult))
    ok = F.col("_N") > 0
    return agg.select(
        F.col("_N").cast("long").alias("n"),
        F.when(ok, F.round(pd_ / nd, 6)).alias("base_rate"),
        F.when(
            ok, F.round(F.col("_bs").cast("double") / nd / m2, 6)
        ).alias("brier"),
        F.when(
            ok,
            F.round(
                F.col("_rel").cast("double")
                / F.lit(1000000.0)
                / nd
                / m2,
                6,
            ),
        ).alias("reliability"),
        F.when(
            ok,
            F.round(
                F.col("_res").cast("double")
                / F.lit(1000000.0)
                / (nd * nd * nd),
                6,
            ),
        ).alias("resolution"),
        F.when(
            ok,
            F.round(pd_ * (nd - pd_) / (nd * nd), 6),
        ).alias("uncertainty"),
    )


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    round_scores: int = 3,
) -> DataFrame:
    """Exact isotonic regression of the positive rate on the score —
    the Zadrozny-Elkan calibration map: the unique monotone
    nondecreasing curve minimizing squared error to the labels, i.e.
    what :func:`calibration_report` measures, repaired. Returns the
    per-distinct-score mapping table ``(score, n, frac_pos,
    calibrated)``; join it back (or range-join new scores against it)
    to calibrate a model's output without assuming a sigmoid shape.

    Computed via the minimax identity — iso(i) = max_{j<=i}
    min_{l>=i} avg(y over scores j..l) — NOT the sequential
    pool-adjacent-violators stack, which cannot distribute. On the
    quantized distinct-score grain (d values; ``round_scores`` bounds
    it, mann_whitney's contract) the identity needs the d^2 interval
    table: interval averages come from ONE fused prefix pass
    (cumulative n and positives), then a suffix-min along l within
    each j and a prefix-max along j within each i — two windows whose
    partitions are bounded by d, NOT by the data. Exact integer
    numerators/denominators up to the one avg division; min/max
    comparisons of identical IEEE doubles replay bit-for-bit in SQL.

    Scale contract: d^2 intervals at the default round_scores=3 is at
    most ~1e6 rows per thousand distinct scores — independent of
    input size; the raw data is touched exactly once (the collapse).
    Pytest proves equality with the sequential PAV stack on random
    panels.
    """
    from kafka_streams_plumber_spark.operators.ordering import (
        running_total,
    )
    from kafka_streams_plumber_spark.plans.scale import truncate_lineage

    s = F.round(F.col(score_col).cast("double"), int(round_scores))
    y = F.col(label_col).cast("boolean").cast("int")
    base = df.where(s.isNotNull() & y.isNotNull()).select(
        s.alias("_s"), y.alias("_y")
    )
    grain = base.groupBy("_s").agg(
        F.count(F.lit(1)).alias("_n"),
        F.coalesce(F.sum("_y"), F.lit(0)).alias("_pos"),
    )
    g = truncate_lineage(
        running_total(
            grain, ["_s"], ["_n", "_pos"], out_col=["_cn", "_cpos"]
        )
    )
    lo = g.select(
        F.col("_s").alias("_j"),
        (F.col("_cn") - F.col("_n")).alias("_cnj"),
        (F.col("_cpos") - F.col("_pos")).alias("_cposj"),
    )
    hi = g.select(
        F.col("_s").alias("_l"),
        F.col("_cn").alias("_cnl"),
        F.col("_cpos").alias("_cposl"),
    )
    pairs = lo.join(F.broadcast(hi), F.col("_j") <= F.col("_l")).select(
        "_j",
        "_l",
        (
            (F.col("_cposl") - F.col("_cposj")).cast("double")
            / (F.col("_cnl") - F.col("_cnj")).cast("double")
        ).alias("_avg"),
    )
    w_sfx = (
        Window.partitionBy("_j")
        .orderBy(F.col("_l").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = pairs.select(
        "_j", F.col("_l").alias("_i"), F.min("_avg").over(w_sfx).alias("_m")
    )
    w_pfx = (
        Window.partitionBy("_i")
        .orderBy(F.col("_j").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    iso = (
        m.select("_j", "_i", F.max("_m").over(w_pfx).alias("_iso"))
        .where(F.col("_j") == F.col("_i"))
        .select(F.col("_i").alias("_s"), "_iso")
    )
    return (
        grain.join(iso, "_s")
        .select(
            F.col("_s").alias("score"),
            F.col("_n").cast("long").alias("n"),
            F.round(
                F.col("_pos").cast("double") / F.col("_n").cast("double"),
                6,
            ).alias("frac_pos"),
            F.round(F.col("_iso"), 6).alias("calibrated"),
        )
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col,
    *,
    round_scores: int | None = None,
    term_scale: int = 10**9,
) -> DataFrame:
    """Average precision (area under the precision-recall curve, step
    form) — the ranking-quality number that matters when positives
    are RARE: ROC-AUC stays rosy at 1:10000 imbalance because true
    negatives dominate both axes, while AP only credits the ranker
    for positives pushed to the top. sklearn's
    ``average_precision_score`` step integral AP = sum_n (R_n -
    R_{n-1}) * P_n over thresholds at each distinct score
    (descending). One row ``(n, n_pos, ap)``; AP NULL when there are
    no positives.

    Exactness: collapse to the distinct-score grain (tp_v, t_v per
    score); one prefix pass ordered by score DESCENDING gives
    inclusive cumTP_v and cum_v — exact integers; each threshold's
    contribution tp_v * cumTP_v / cum_v is ONE fixed-shape double
    frozen to a 1/``term_scale`` scaled integer, so the sum over
    thresholds is an exact integer sum (no order-dependent double
    accumulation), divided once by n_pos * term_scale. SQL replays
    bit-for-bit.

    Scale design: one map-combinable collapse, one range-exchange
    prefix pass (ordering.running_total over the negated score), one
    1-row fold. ``round_scores`` quantizes scores first to bound the
    grain (the mann_whitney contract).
    """
    from kafka_streams_plumber_spark.operators.ordering import (
        running_total,
    )

    s = F.col(score_col).cast("double")
    if round_scores is not None:
        s = F.round(s, int(round_scores))
    y = label_col if isinstance(label_col, Column) else F.col(label_col)
    base = df.where(s.isNotNull() & y.isNotNull()).select(
        s.alias("_s"), y.cast("boolean").alias("_y")
    )
    per = base.groupBy("_s").agg(
        F.count(F.lit(1)).alias("_t"),
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_tp"),
    )
    # descending-score prefix: order the SAME range exchange by -s
    r = running_total(
        per.withColumn("_ns", -F.col("_s")),
        ["_ns"],
        ["_t", "_tp"],
        out_col=["_cum", "_ctp"],
    )
    term = F.round(
        F.col("_tp").cast("double")
        * F.col("_ctp").cast("double")
        / F.col("_cum").cast("double")
        * F.lit(float(term_scale))
    ).cast("decimal(38,0)")
    agg = r.agg(
        F.coalesce(F.sum("_t"), F.lit(0)).cast("long").alias("_n"),
        F.coalesce(F.sum("_tp"), F.lit(0)).cast("long").alias("_p"),
        F.coalesce(
            F.sum(term), F.lit(0).cast("decimal(38,0)")
        ).alias("_sum"),
    )
    ap = F.when(
        F.col("_p") > 0,
        F.round(
            F.col("_sum").cast("double")
            / F.lit(float(term_scale))
            / F.col("_p").cast("double"),
            6,
        ),
    )
    return agg.select(
        F.col("_n").alias("n"),
        F.col("_p").alias("n_pos"),
        ap.alias("ap"),
    )


def mcc_multiclass(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Matthews correlation coefficient, multiclass (Gorodkin's R_K) —
    the single-number classifier score that is immune to class
    imbalance: accuracy and micro-F1 reward predicting the majority
    class, R_K is ~0 for any constant predictor and 1 only for a
    perfect one. The number to gate a label-model promotion on when
    the label mix is skewed (which training-data label mixes always
    are). One row ``(n, k_classes, accuracy, mcc)`` over the
    (label, pred) pairs; mcc NULL when either side is constant
    (zero variance — e.g. a single-class eval slice).

    Exactness: R_K = (c*s - sum_k t_k*p_k) / sqrt((s^2 - sum p_k^2) *
    (s^2 - sum t_k^2)) with c = trace, s = n, t/p the true/predicted
    marginals — ALL exact integers on decimal(38,0) from one collapse
    to the confusion grain; one final double sqrt. SQL replays
    bit-for-bit.

    Scale design: one map-combinable collapse to the k x k confusion
    grain, two k-row marginal folds joined on class (full outer,
    zero-filled), one 1-row fold. No windows, no Python.
    """
    base = df.where(
        F.col(label_col).isNotNull() & F.col(pred_col).isNotNull()
    ).select(
        F.col(label_col).cast("string").alias("_l"),
        F.col(pred_col).cast("string").alias("_p"),
    )
    cells = base.groupBy("_l", "_p").agg(F.count(F.lit(1)).alias("_c"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tmarg = cells.groupBy("_l").agg(F.sum("_c").alias("_t")).select(
        F.col("_l").alias("_k"), "_t"
    )
    pmarg = cells.groupBy("_p").agg(F.sum("_c").alias("_pc")).select(
        F.col("_p").alias("_k"), "_pc"
    )
    marg = tmarg.join(pmarg, "_k", "full_outer").select(
        "_k",
        F.coalesce(F.col("_t"), F.lit(0)).alias("_t"),
        F.coalesce(F.col("_pc"), F.lit(0)).alias("_pc"),
    )
    msum = marg.agg(
        F.count(F.lit(1)).alias("_kk"),
        F.coalesce(
            F.sum(
                dec(F.col("_t").cast("decimal(19,0)"))
                * F.col("_pc").cast("decimal(19,0)")
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_tp"),
        F.coalesce(
            F.sum(
                dec(F.col("_t").cast("decimal(19,0)"))
                * F.col("_t").cast("decimal(19,0)")
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_tt"),
        F.coalesce(
            F.sum(
                dec(F.col("_pc").cast("decimal(19,0)"))
                * F.col("_pc").cast("decimal(19,0)")
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_pp"),
    )
    csum = cells.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("decimal(38,0)").alias("_s"),
        F.coalesce(
            F.sum(F.when(F.col("_l") == F.col("_p"), F.col("_c"))),
            F.lit(0),
        ).cast("decimal(38,0)").alias("_corr"),
    )
    j = csum.crossJoin(F.broadcast(msum))
    s2 = F.col("_s") * F.col("_s")
    num = F.col("_corr") * F.col("_s") - F.col("_tp")
    dp = s2 - F.col("_pp")
    dt = s2 - F.col("_tt")
    mcc = F.round(
        num.cast("double")
        / F.nullif(
            F.sqrt(dp.cast("double") * dt.cast("double")), F.lit(0.0)
        ),
        6,
    )
    return j.select(
        F.col("_s").cast("long").alias("n"),
        F.col("_kk").cast("long").alias("k_classes"),
        F.round(
            F.col("_corr").cast("double")
            / F.nullif(F.col("_s").cast("double"), F.lit(0.0)),
            6,
        ).alias("accuracy"),
        mcc.alias("mcc"),
    )
