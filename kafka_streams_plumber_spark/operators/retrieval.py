"""BM25 ranked retrieval over a document corpus.

Beyond-reference surface (the reference has no joins or aggregations,
SURVEY §2.1): training-data pipelines use lexical retrieval constantly —
mining hard negatives for embedding training, decontamination lookups,
nearest-document audits, RAG evaluation sets. TF-IDF scoring already
exists (queries.py:q_tfidf); this adds the full Okapi BM25 ranking
function with a query side and top-k retrieval.

Scale design: the corpus is tokenized ONCE into a postings frame
(doc_id, term, tf) — one explode + one groupBy, map-side combined.
Document-frequency (per-term) and corpus aggregates (N, avgdl) reduce
to tiny frames that join back by BROADCAST, so the corpus itself is
shuffled exactly once (the postings groupBy). The query side is small
by construction (a query workload, not a second corpus) and is
broadcast into the postings join — the 100 TB side never moves. Top-k
per query uses the two-phase local-prune ranker (stats.topk_per_group),
not a single-task-per-query window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.stats import topk_per_group

#: Tokenizer shared by corpus and query sides: lowercase, split on
#: ASCII whitespace runs, drop empties. Mirrors operators/text.tokens
#: and is replayable in DuckDB as string_split_regex(lower(x), '[ \t\n\r]+').
_WS = "[ \\t\\n\\r]+"


def _terms(col):
    return F.filter(
        F.split(F.lower(F.trim(col)), _WS), lambda t: t != F.lit("")
    )


def doc_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, tf, dl): term frequencies plus document length.

    One explode + one map-combinable groupBy; dl (tokens in doc) is
    carried on every posting row to keep the scorer join-free on the
    corpus side.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _terms(F.col(text_col)).alias("toks")
    ).select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
    return toks.groupBy("doc_id", "dl", "term").agg(
        F.count("*").alias("tf")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id: str = "query_id",
    query_text: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k documents per query.

    Returns (query_id, doc_id, score, rank) with

        score(q, d) = sum_{t in q∩d} idf(t) * tf * (k1+1)
                      / (tf + k1 * (1 - b + b * dl/avgdl))
        idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))

    Repeated query terms score once (set semantics — the standard
    bag-of-words simplification for short queries). Ranking orders by
    round(score, 6) DESC then doc_id: the rounding is deliberate, so
    float-sum association order (which differs across partitionings and
    engines) cannot flip ranks between mathematically-tied documents.
    """
    post = doc_postings(docs, text_col, id_col)

    # per-term document frequency — O(vocab) rows, broadcast back
    dfreq = post.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # corpus scalars as a one-row broadcast (no driver collect); a
    # second corpus SCAN (cheap, column-pruned) instead of a second
    # postings SHUFFLE
    scal = docs.select(
        F.size(_terms(F.col(text_col))).alias("dl")
    ).agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    qterms = (
        queries.select(
            F.col(query_id).alias("query_id"),
            F.explode(_terms(F.col(query_text))).alias("term"),
        )
        .distinct()
    )

    scored = (
        post.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(scal))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "part",
            F.col("idf")
            * (F.col("tf") * (1.0 + k1))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("part"), 6).alias("score"))
    )
    return topk_per_group(
        scored,
        "query_id",
        [F.col("score").desc(), F.col("doc_id")],
        k,
        rank_fn=F.row_number,
        rank_col="rank",
    ).select("query_id", "doc_id", "score", "rank")


def bm25_oracle_sql(
    queries_sql: str,
    *,
    docs_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB oracle replaying :func:`bm25_topk` step for step.

    ``queries_sql`` must select (query_id, query_text).
    """
    return f"""
    WITH q AS ({queries_sql}),
    dtok AS (
      SELECT {id_col} AS doc_id,
             list_filter(string_split_regex(lower(trim({text_col})),
                                            '[ \t\n\r]+'),
                         t -> t <> '') AS toks
      FROM {docs_table}
    ),
    post AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM (
        SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM dtok
      ) GROUP BY doc_id, dl, term
    ),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM post GROUP BY term),
    scal AS (
      SELECT count(*)::DOUBLE AS n_docs, avg(len(toks)) AS avgdl FROM dtok
    ),
    qterms AS (
      SELECT DISTINCT query_id, unnest(
        list_filter(string_split_regex(lower(trim(query_text)),
                                       '[ \t\n\r]+'), t -> t <> '')
      ) AS term FROM q
    ),
    scored AS (
      SELECT query_id, doc_id,
             round(sum(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * (1.0 + {k1}))
               / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))
             ), 6) AS score
      FROM post JOIN qterms USING (term) JOIN dfreq USING (term), scal
      GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, score, rank FROM (
      SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def overlap_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id: str = "query_id",
    query_text: str = "query_text",
    k: int = 10,
) -> DataFrame:
    """Distinct-term-overlap top-k: the simplest lexical ranking
    (|q ∩ d| set overlap), used as the second leg of hybrid fusion and
    as a recall-floor baseline for BM25. Same shuffle shape as
    :func:`bm25_topk` minus the statistics joins."""
    dterm = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_terms(F.col(text_col))).alias("term"),
    ).distinct()
    qterms = (
        queries.select(
            F.col(query_id).alias("query_id"),
            F.explode(_terms(F.col(query_text))).alias("term"),
        )
        .distinct()
    )
    scored = (
        dterm.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    return topk_per_group(
        scored,
        "query_id",
        [F.col("overlap").desc(), F.col("doc_id")],
        k,
        rank_fn=F.row_number,
        rank_col="rank",
    ).select("query_id", "doc_id", "overlap", "rank")


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    k_rrf: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of N ranked
    lists: score(d) = Σ_r 1/(k_rrf + rank_r(d)) over the rankings where
    d appears. The standard hybrid-retrieval combiner (lexical +
    vector) — rank-only, so the legs' incomparable score scales never
    need calibration. Inputs carry (query_id, doc_id, rank); output is
    (query_id, doc_id, rrf, rank), rrf rounded to 6dp BEFORE ranking.

    Plan: unionAll of the (already tiny, top-k-per-query) legs, one
    map-combinable groupBy, one two-phase top-k — nothing here touches
    the corpus again, so fusion cost is independent of corpus size.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    u = None
    for r in rankings:
        leg = r.select(
            "query_id",
            "doc_id",
            (1.0 / (F.lit(float(k_rrf)) + F.col("rank"))).alias("contrib"),
        )
        u = leg if u is None else u.unionAll(leg)
    fused = (
        u.groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("rrf"))
    )
    return topk_per_group(
        fused,
        "query_id",
        [F.col("rrf").desc(), F.col("doc_id")],
        k,
        rank_fn=F.row_number,
        rank_col="rank",
    ).select("query_id", "doc_id", "rrf", "rank")


def overlap_oracle_cte(
    *,
    docs_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> str:
    """DuckDB fragment replaying :func:`overlap_topk`; expects a CTE
    ``q(query_id, query_text)`` to be in scope."""
    return f"""
      SELECT query_id, doc_id, overlap, rank FROM (
        SELECT query_id, doc_id, overlap,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY overlap DESC, doc_id) AS rank
        FROM (
          SELECT query_id, doc_id, count(*) AS overlap FROM (
            SELECT DISTINCT {id_col} AS doc_id, unnest(
              list_filter(string_split_regex(lower(trim({text_col})),
                                             '[ \t\n\r]+'), t -> t <> '')
            ) AS term FROM {docs_table}
          ) d JOIN (
            SELECT DISTINCT query_id, unnest(
              list_filter(string_split_regex(lower(trim(query_text)),
                                             '[ \t\n\r]+'), t -> t <> '')
            ) AS term FROM q
          ) qt USING (term)
          GROUP BY query_id, doc_id
        )
      ) WHERE rank <= {k}
    """


def relevant_by_all_terms(
    docs: DataFrame,
    queries: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id: str = "query_id",
    query_text: str = "query_text",
) -> DataFrame:
    """Deterministic qrels: a document is relevant to a query iff it
    contains EVERY distinct query term (boolean-AND ground truth — the
    strictest lexical relevance, useful as a recall floor when no human
    judgments exist). Returns (query_id, doc_id)."""
    dterm = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_terms(F.col(text_col))).alias("term"),
    ).distinct()
    qterms = queries.select(
        F.col(query_id).alias("query_id"),
        F.explode(_terms(F.col(query_text))).alias("term"),
    ).distinct()
    nq = qterms.groupBy("query_id").agg(F.count(F.lit(1)).alias("_nq"))
    return (
        dterm.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("_hit"))
        .join(F.broadcast(nq), "query_id")
        .where(F.col("_hit") == F.col("_nq"))
        .select("query_id", "doc_id")
    )


def ranking_metrics(
    ranking: DataFrame,
    qrels: DataFrame,
    *,
    k: int = 10,
) -> DataFrame:
    """Per-query IR metrics of a ranked list against relevance pairs.

    ``ranking`` carries (query_id, doc_id, rank); ``qrels`` carries the
    relevant (query_id, doc_id) pairs. Returns one row per query:

    - ``hits``      relevant docs retrieved in the top k
    - ``n_rel``     total relevant docs (recall denominator)
    - ``recall``    hits / n_rel
    - ``mrr``       1/rank of the first relevant hit (0 if none)
    - ``ndcg``      DCG@k / ideal-DCG@k with the standard
                    1/log2(rank+1) discount

    Division results are rounded to 6 places AFTER the aggregate (the
    bm25 convention: association order of tiny double sums cannot flip
    the rounded value). The ideal DCG is an in-expression ``aggregate``
    over ``sequence(1, min(n_rel, k))`` — no driver math, no extra
    shuffle. Queries with no relevant docs are omitted (undefined
    recall). All joins are on (query_id, doc_id) against the tiny top-k
    frame; cost is independent of corpus size.
    """
    topk = ranking.where(F.col("rank") <= k)
    nrel = qrels.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    judged = topk.join(
        qrels.withColumn("_rel", F.lit(1)), ["query_id", "doc_id"], "left"
    ).withColumn("_rel", F.coalesce("_rel", F.lit(0)))
    per_q = judged.groupBy("query_id").agg(
        F.sum("_rel").alias("hits"),
        F.max(
            F.when(F.col("_rel") == 1, 1.0 / F.col("rank")).otherwise(0.0)
        ).alias("_mrr"),
        F.sum(F.col("_rel") / F.log2(F.col("rank") + 1)).alias("_dcg"),
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(k))),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1),
    )
    return (
        per_q.join(F.broadcast(nrel), "query_id")
        .select(
            "query_id",
            "hits",
            "n_rel",
            F.round(F.col("hits") / F.col("n_rel"), 6).alias("recall"),
            F.round("_mrr", 6).alias("mrr"),
            F.round(F.col("_dcg") / idcg, 6).alias("ndcg"),
        )
    )


def rbo(
    ranking_a: DataFrame,
    ranking_b: DataFrame,
    *,
    k: int,
    p: float = 0.9,
    key_col: str = "query_id",
    item_col: str = "doc_id",
    rank_col: str = "rank",
    value_scale: int = 10**9,
) -> DataFrame:
    """Rank-biased overlap (Webber et al., TOIS 2010) between two
    rankings, truncated at depth ``k``: per key,
    ``RBO@k = (1-p) * sum_{d=1..k} p^(d-1) * |A@d n B@d| / d`` —
    top-weighted agreement in [0, 1], with persistence ``p`` setting
    how fast attention decays down the list (p=0.9 ~ top-10 focus).

    The ranker-drift monitor ranking_metrics can't provide: recall@k /
    nDCG need relevance labels, RBO compares two SYSTEMS label-free —
    "how much did the new BM25 config / embedding model / quality
    ensemble actually change what surfaces at the top". Handles
    non-conjoint lists: items present in only one ranking simply never
    join the intersection.

    Scale design: an item at ranks (ra, rb) enters every prefix
    intersection at depth max(ra, rb), so per-depth overlap X_d is one
    equi-join + a cumulative count over the per-key depth spine — an
    O(k)-row bounded window per key, never a rescan of the rankings.
    Depth terms are summed as scaled longs (9 dp), order-proof and
    SQL-replayable. Keys appearing in only one ranking emit rbo = 0.
    """
    if not (0.0 < p < 1.0):
        raise ValueError("p must be in (0, 1)")
    if k < 1:
        raise ValueError("k must be >= 1")

    a = ranking_a.select(
        F.col(key_col).alias("_k"),
        F.col(item_col).alias("_i"),
        F.col(rank_col).alias("_ra"),
    ).where(F.col(rank_col) <= k)
    b = ranking_b.select(
        F.col(key_col).alias("_k"),
        F.col(item_col).alias("_i"),
        F.col(rank_col).alias("_rb"),
    ).where(F.col(rank_col) <= k)

    entries = (
        a.join(b, ["_k", "_i"])
        .select("_k", F.greatest("_ra", "_rb").alias("_d0"))
        .groupBy("_k", "_d0")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    keys = a.select("_k").union(b.select("_k")).distinct()
    spine = keys.select(
        "_k", F.explode(F.sequence(F.lit(1), F.lit(int(k)))).alias("_d")
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("_k")
        .orderBy("_d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    depth = (
        spine.join(
            entries,
            (spine["_k"] == entries["_k"]) & (spine["_d"] == entries["_d0"]),
            "left",
        )
        .select(spine["_k"], "_d", F.coalesce("_n", F.lit(0)).alias("_n"))
        .withColumn("_x", F.sum("_n").over(w))
    )
    # pow is libm-implementation-dependent at the last ulp: pin it to
    # 12 dp (the temperature_mix device) so both engines sum identical
    # quantities
    term = (
        F.round(F.pow(F.lit(float(p)), F.col("_d") - 1), 12)
        * (F.col("_x") / F.col("_d"))
    )
    out = depth.groupBy("_k").agg(
        (
            F.sum(F.round(term * value_scale, 0).cast("long")).cast("double")
            / value_scale
        ).alias("_s"),
        F.max(F.when(F.col("_d") == k, F.col("_x"))).alias("overlap_at_k"),
    )
    return out.select(
        F.col("_k").alias(key_col),
        F.round((1.0 - float(p)) * F.col("_s"), 6).alias("rbo"),
        "overlap_at_k",
    )
