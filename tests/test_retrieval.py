"""BM25 retrieval (operators/retrieval.py)."""

from __future__ import annotations

import math

from kafka_streams_plumber_spark.operators.retrieval import (
    bm25_topk,
    doc_postings,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark join fast fast"),
            (2, "spark scan"),
            (3, "slow table scan hash"),
            (4, "unrelated words only here"),
        ],
        "doc_id long, text string",
    )


def _queries(spark):
    return spark.createDataFrame(
        [(10, "spark fast"), (20, "hash scan")],
        "query_id long, query_text string",
    )


def test_postings_tf_and_dl(spark):
    p = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in doc_postings(_docs(spark)).collect()
    }
    assert p[(1, "fast")] == (2, 4)
    assert p[(1, "spark")] == (1, 4)
    assert p[(4, "unrelated")] == (1, 4)


def test_bm25_ranks_matching_docs_first(spark):
    out = bm25_topk(_docs(spark), _queries(spark), k=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    # query 10 "spark fast": doc1 has both terms (fast twice) -> top
    q10 = sorted(by_q[10])
    assert q10[0][1] == 1
    # doc4 shares no term -> absent
    assert all(d != 4 for _, d, _ in q10)
    # query 20 "hash scan": doc3 has both -> top
    q20 = sorted(by_q[20])
    assert q20[0][1] == 3
    # scores positive and ranks contiguous from 1
    for rows in by_q.values():
        assert [r for r, _, _ in sorted(rows)] == list(range(1, len(rows) + 1))
        assert all(s > 0 for _, _, s in rows)


def test_bm25_score_formula_single_term(spark):
    """Hand-check one cell: query 'hash' -> only doc3 (tf=1, dl=4)."""
    docs = _docs(spark)
    q = spark.createDataFrame([(1, "hash")], "query_id long, query_text string")
    rows = bm25_topk(docs, q, k=5).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 3
    n_docs, avgdl, df_t, tf, dl, k1, b = 4, 3.5, 1, 1, 4, 1.2, 0.75
    idf = math.log(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
    expect = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert abs(rows[0]["score"] - round(expect, 6)) < 1e-9


def test_bm25_partition_invariant(spark):
    docs = _docs(spark)
    a = bm25_topk(docs.repartition(8), _queries(spark), k=4).collect()
    b = bm25_topk(docs.coalesce(1), _queries(spark), k=4).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert {key(r): r["doc_id"] for r in a} == {key(r): r["doc_id"] for r in b}


def test_ranking_metrics_hand_computed(spark):
    """recall/MRR/nDCG against a hand-worked example."""
    import math

    from kafka_streams_plumber_spark.operators.retrieval import ranking_metrics

    ranking = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2)],
        "query_id long, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        # q1: docs 11, 12, 99 relevant (99 not retrieved); q2: none of
        # the retrieved docs relevant but doc 77 is -> zero metrics row
        [(1, 11), (1, 12), (1, 99), (2, 77)],
        "query_id long, doc_id long",
    )
    got = {r["query_id"]: r for r in ranking_metrics(ranking, qrels, k=10).collect()}
    q1 = got[1]
    assert (q1["hits"], q1["n_rel"]) == (2, 3)
    assert q1["recall"] == round(2 / 3, 6)
    assert q1["mrr"] == 0.5  # first relevant at rank 2
    dcg = 1 / math.log2(3) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert q1["ndcg"] == round(dcg / idcg, 6)
    q2 = got[2]
    assert (q2["hits"], q2["recall"], q2["mrr"], q2["ndcg"]) == (0, 0.0, 0.0, 0.0)


def test_relevant_by_all_terms_requires_every_term(spark):
    from kafka_streams_plumber_spark.operators.retrieval import (
        relevant_by_all_terms,
    )

    docs = spark.createDataFrame(
        [(1, "spark join fast engine"), (2, "spark join"), (3, "fast")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(1, "spark fast")], "query_id long, query_text string"
    )
    got = {(r["query_id"], r["doc_id"]) for r in relevant_by_all_terms(docs, qs).collect()}
    assert got == {(1, 1)}  # doc 2 lacks 'fast', doc 3 lacks 'spark'


def test_rbo_identical_and_disjoint(spark):
    from kafka_streams_plumber_spark.operators.retrieval import rbo

    ident = spark.createDataFrame(
        [(1, d, r) for r, d in enumerate([10, 11, 12], 1)],
        "query_id long, doc_id long, rank long",
    )
    r = rbo(ident, ident, k=3, p=0.9).collect()[0]
    # identical lists: A_d = 1 at every depth -> (1-p) * sum p^(d-1)
    want = round(0.1 * (1 + 0.9 + 0.81), 6)
    assert abs(r["rbo"] - want) < 1e-6 and r["overlap_at_k"] == 3

    other = spark.createDataFrame(
        [(1, d, r) for r, d in enumerate([20, 21, 22], 1)],
        "query_id long, doc_id long, rank long",
    )
    r = rbo(ident, other, k=3, p=0.9).collect()[0]
    assert r["rbo"] == 0.0 and r["overlap_at_k"] == 0


def test_rbo_top_weighted_and_entry_depth(spark):
    from kafka_streams_plumber_spark.operators.retrieval import rbo

    # same membership, swapped top-2: item enters intersection at
    # depth max(ra, rb) = 2, so A_1 = 0, A_2 = 1, A_3 = 1
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank long",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 10, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank long",
    )
    r = rbo(a, b, k=3, p=0.9).collect()[0]
    want = round(0.1 * (0.9 * (2 / 2) + 0.81 * (3 / 3)), 6)
    assert abs(r["rbo"] - want) < 1e-6

    # agreement only at the top is worth more than only at the bottom
    top_agree = rbo(
        a,
        spark.createDataFrame(
            [(1, 10, 1), (1, 21, 2), (1, 22, 3)],
            "query_id long, doc_id long, rank long",
        ),
        k=3, p=0.9,
    ).collect()[0]["rbo"]
    bottom_agree = rbo(
        a,
        spark.createDataFrame(
            [(1, 20, 1), (1, 21, 2), (1, 12, 3)],
            "query_id long, doc_id long, rank long",
        ),
        k=3, p=0.9,
    ).collect()[0]["rbo"]
    assert top_agree > bottom_agree


def test_rbo_key_in_one_ranking_only_emits_zero(spark):
    from kafka_streams_plumber_spark.operators.retrieval import rbo

    a = spark.createDataFrame(
        [(1, 10, 1), (2, 10, 1)], "query_id long, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 10, 1)], "query_id long, doc_id long, rank long"
    )
    got = {r["query_id"]: r["rbo"] for r in rbo(a, b, k=2, p=0.5).collect()}
    assert got[2] == 0.0 and got[1] > 0
