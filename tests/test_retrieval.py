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
