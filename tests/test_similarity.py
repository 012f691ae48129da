"""Similarity-search operators: exact baseline sanity + ANN recall."""

from __future__ import annotations

import math
import random

import pytest

from kafka_streams_plumber_spark.operators.similarity import (
    cosine_topk,
    embedding_dup_pairs,
    embedding_dup_pairs_exact,
    rp_lsh_topk,
)

DIM = 16


def _unit(rng):
    v = [rng.gauss(0, 1) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


@pytest.fixture()
def vectors(spark):
    rng = random.Random(7)
    rows = []
    for i in range(40):
        rows.append((i, _unit(rng)))
    # plant a near-dup of vector 0: tiny perturbation
    base = rows[0][1]
    rows.append((100, [x + 0.01 * e for x, e in zip(base, _unit(rng))]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_finds_planted_neighbor(spark, vectors):
    q = vectors.filter("vec_id = 0")
    out = cosine_topk(vectors, q, k=3)
    rows = out.collect()
    assert rows[0].neighbor_id == 100 and rows[0].rank == 1
    assert rows[0].sim > 0.99


def test_topk_is_k_per_query_and_ranked(spark, vectors):
    q = vectors.filter("vec_id < 4")
    out = cosine_topk(vectors, q, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
        sims = [r.sim for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != qid for r in rs)


def test_lsh_recall_at_least_half_of_exact(spark, vectors):
    """ANN with 8 tables x 4 planes recovers most true top-3 (recall rises
    with tables, falls with planes — measured 0.71 at this setting, 0.42
    at 4x6; general top-k needs shallow planes + many tables)."""
    q = vectors.filter("vec_id < 8")
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(vectors, q, k=3).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in rp_lsh_topk(vectors, q, dim=DIM, k=3, n_planes=4, n_tables=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall {recall}"


def test_embedding_dup_lsh_finds_planted_pair(spark, vectors):
    exact = {(r.a_id, r.b_id) for r in embedding_dup_pairs_exact(vectors, threshold=0.95).collect()}
    assert (0, 100) in exact
    lsh = {
        (r.a_id, r.b_id)
        for r in embedding_dup_pairs(
            vectors, dim=DIM, threshold=0.95, n_planes=6, n_tables=8
        ).collect()
    }
    assert (0, 100) in lsh


def test_ivf_recall_and_topk_shape(spark, vectors):
    """IVF with 8 cells / 4 probes / multi-assign 2 recovers most true
    top-3; each query gets exactly k ranked rows with rank 1..k."""
    from kafka_streams_plumber_spark.operators.similarity import ivf_topk

    q = vectors.filter("vec_id < 8")
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(vectors, q, k=3).collect()}
    rows = ivf_topk(vectors, q, k=3, n_cells=8, nprobe=4, assign=2).collect()
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"recall {recall}"
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ivf_no_duplicate_neighbors(spark, vectors):
    """Multi-assignment must not surface the same (query, neighbor)
    twice in the ranked output."""
    from kafka_streams_plumber_spark.operators.similarity import ivf_topk

    q = vectors.filter("vec_id < 8")
    rows = ivf_topk(vectors, q, k=5, n_cells=8, nprobe=6, assign=3).collect()
    pairs = [(r.query_id, r.neighbor_id) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_quantize_embeddings_roundtrip(spark):
    """int8 codes reconstruct within scale/2 per element; zero vectors
    get scale 1.0 and all-zero codes; codes stay in [-127, 127]."""
    import pyspark.sql.functions as F

    from kafka_streams_plumber_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0]), (3, [127.0, -127.0, 63.5])],
        "vec_id long, embedding array<float>",
    )
    out = quantize_embeddings(df)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert rows[2]["scale"] == 1.0 and rows[2]["codes"] == [0, 0, 0]
    assert rows[1]["code_min"] >= -127 and rows[1]["code_max"] <= 127
    # reconstruction error bounded by scale/2
    err = (
        df.join(out, "vec_id")
        .select(
            F.array_max(
                F.zip_with(
                    "embedding",
                    "codes",
                    lambda x, c: F.abs(x.cast("double") - c * F.col("scale")),
                )
            ).alias("e"),
            "scale",
        )
        .filter(F.col("e") > F.col("scale") / 2 + 1e-12)
        .count()
    )
    assert err == 0


def test_matryoshka_truncate_renormalizes_head(spark):
    from kafka_streams_plumber_spark.operators.similarity import matryoshka_truncate

    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 0.0, 0.0, 1.0]), (2, [0.0, 2.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    rows = {
        r["vec_id"]: r
        for r in matryoshka_truncate(df, dims=2).collect()
    }
    # head of vec 1 = [3,4] -> norm 5, renormalized [0.6, 0.8]
    assert abs(rows[1]["trunc_norm"] - 5.0) < 1e-12
    assert [round(x, 12) for x in rows[1]["trunc"]] == [0.6, 0.8]
    # full norm includes the tail
    assert abs(rows[1]["full_norm"] - (9 + 16 + 1) ** 0.5) < 1e-12
    assert [round(x, 12) for x in rows[2]["trunc"]] == [0.0, 1.0]


def test_hash_embed_feeds_similarity_stack(spark):
    from pyspark.sql import functions as F

    from kafka_streams_plumber_spark.operators.similarity import (
        cosine,
        hash_embed,
    )

    df = spark.createDataFrame(
        [
            (1, "spark query plan optimizer"),
            (2, "spark query plan optimizer"),
            (3, "completely different words entirely"),
        ],
        ["doc_id", "text"],
    )
    e = df.select("doc_id", hash_embed("text", dim=32).alias("v"))
    rows = {r["doc_id"]: r["v"] for r in e.collect()}
    # identical docs embed identically; unit norm
    assert rows[1] == rows[2]
    assert abs(sum(x * x for x in rows[1]) - 1.0) < 1e-9
    # cosine to an unrelated doc is well below self-similarity
    pairs = (
        e.alias("a").crossJoin(e.alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("x"),
            F.col("b.doc_id").alias("y"),
            cosine(F.col("a.v"), F.col("b.v")).alias("c"),
        )
        .collect()
    )
    cs = {(r["x"], r["y"]): r["c"] for r in pairs}
    assert abs(cs[(1, 2)] - 1.0) < 1e-9
    assert cs[(1, 3)] < 0.6


def test_hash_embed_unnormalized_counts_are_integers(spark):
    from kafka_streams_plumber_spark.operators.similarity import hash_embed

    df = spark.createDataFrame([(1, "a b a")], ["doc_id", "text"])
    v = df.select(hash_embed("text", dim=8, normalize=False).alias("v")).collect()[0]["v"]
    assert sum(abs(x) for x in v) in (1, 3)  # 'a' twice may cancel or stack
    assert all(isinstance(x, int) for x in v)


# ---------------------------------------------------------------------
# PCA top component
# ---------------------------------------------------------------------

from kafka_streams_plumber_spark.operators.similarity import (  # noqa: E402
    pca_top_component,
)


def test_pca_matches_numpy_eigenvector(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    # anisotropic cloud: dominant direction along a known vector
    base = rng.normal(size=(300, 8))
    base[:, 0] *= 6.0  # inflate variance of axis 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pca_top_component(df, dim=8, iterations=12)
    got = np.array(
        [r["loading"] for r in out.orderBy("pos").collect()], dtype=float
    )
    eig_got = out.first()["eigenvalue"]

    x = np.array([r[1] for r in rows], dtype=float)
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / len(x)
    w, v = np.linalg.eigh(cov)
    top = v[:, -1]
    if np.dot(top, got) < 0:
        top = -top
    assert np.abs(got - top).max() < 1e-3, (got, top)
    assert abs(eig_got - w[-1]) / w[-1] < 1e-2


def test_pca_partition_invariant(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=6)]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = [
        (r["pos"], round(r["loading"], 9))
        for r in pca_top_component(df.repartition(8), dim=6, iterations=4)
        .orderBy("pos")
        .collect()
    ]
    b = [
        (r["pos"], round(r["loading"], 9))
        for r in pca_top_component(df.coalesce(1), dim=6, iterations=4)
        .orderBy("pos")
        .collect()
    ]
    assert a == b


def test_embedding_diversity_separates_collapsed_space(spark):
    from kafka_streams_plumber_spark.operators.similarity import (
        embedding_diversity,
    )

    # collapsed: every vector identical -> mean_cos = 1, high_share = 1
    same = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    r = embedding_diversity(same, threshold=0.95).collect()[0]
    assert r["n_pairs"] == 5
    assert abs(r["mean_cos"] - 1.0) < 1e-6 and r["high_share"] == 1.0

    # diverse: orthogonal one-hot pairs -> mean 0 regardless of pairing
    import itertools
    vecs = []
    for i in range(10):
        v = [0.0] * 10
        v[i] = 1.0
        vecs.append((i, v))
    ortho = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    )
    r = embedding_diversity(ortho, threshold=0.95).collect()[0]
    assert r["mean_cos"] == 0.0 and r["high_share"] == 0.0


def test_embedding_diversity_deterministic_and_odd_drop(spark):
    from kafka_streams_plumber_spark.operators.similarity import (
        embedding_diversity,
    )

    rows = [(i, [float(i), 1.0]) for i in range(7)]  # odd count
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r1 = embedding_diversity(df, seed=5).collect()[0]
    r2 = embedding_diversity(df, seed=5).collect()[0]
    assert r1 == r2                      # replayable
    assert r1["n_pairs"] == 3            # 7 vectors -> 3 pairs, 1 dropped
    r3 = embedding_diversity(df, seed=6).collect()[0]
    assert r3["n_pairs"] == 3            # different seed, same bookkeeping


def test_centroid_similarity_groups_by_content(spark):
    from kafka_streams_plumber_spark.operators.similarity import (
        centroid_similarity,
    )

    animal = "cat dog bird fish cat dog"
    tech = "code data model train code data"
    docs = spark.createDataFrame(
        [
            (1, animal, "a1"), (2, animal + " cat", "a2"),
            (3, tech, "t1"), (4, tech + " data", "t2"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r["group_a"], r["group_b"]): r["cosine"]
        for r in centroid_similarity(docs, "source", "text").collect()
    }
    assert len(got) == 6
    # same-topic sources are far more similar than cross-topic ones
    assert got[("a1", "a2")] > 0.9 and got[("t1", "t2")] > 0.9
    assert got[("a1", "t1")] < got[("a1", "a2")]


def test_centroid_similarity_no_shared_bucket_is_zero(spark):
    from kafka_streams_plumber_spark.operators.similarity import (
        centroid_similarity,
    )

    # one token each, different buckets (dim large enough to separate)
    docs = spark.createDataFrame(
        [(1, "aaa", "x"), (2, "bbb", "y")],
        "doc_id long, text string, source string",
    )
    rows = centroid_similarity(docs, "source", "text", dim=512).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["dot"] == 0 and r["cosine"] == 0.0


def test_embedding_diversity_zero_vector_dropped(spark):
    from kafka_streams_plumber_spark.operators.similarity import (
        embedding_diversity,
    )

    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0]), (4, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = embedding_diversity(df, seed=1).collect()[0]
    # the zero vector's pair is excluded, never a NaN poisoning the mean
    assert r["n_pairs"] <= 2
    assert r["mean_cos"] is not None
