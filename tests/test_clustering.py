"""kmeans_fit/assign/inertia: Lloyd convergence, determinism across
partitionings, broadcast-only assignment plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    kmeans_inertia,
)


@pytest.fixture(scope="module")
def emb(spark):
    # two clearly separated blobs on a line + ids
    rows = [(i, [float(i % 7) / 10.0, 0.0]) for i in range(40)]
    rows += [(100 + i, [10.0 + float(i % 5) / 10.0, 5.0]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_inertia_monotone_nonincreasing(spark, emb):
    prev = None
    for iters in (0, 1, 3):
        c = kmeans_fit(emb, k=2, iters=iters)
        inertia = kmeans_inertia(emb, c).collect()[0]["inertia"]
        if prev is not None:
            assert inertia <= prev + 1e-9
        prev = inertia


def test_two_blobs_separate(spark, emb):
    c = kmeans_fit(emb, k=2, iters=5)
    a = kmeans_assign(emb, c)
    groups = (
        a.groupBy("cluster")
        .agg(F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    assert len(groups) == 2
    for g in groups:
        assert g["n"] == 40
        # no cluster spans both blobs
        assert g["hi"] < 100 or g["lo"] >= 100


def test_deterministic_across_partitionings(spark, emb):
    c1 = kmeans_fit(emb.repartition(1), k=3, iters=3)
    c8 = kmeans_fit(emb.repartition(8), k=3, iters=3)
    r1 = sorted((r["cluster"], tuple(r["centroid"]), r["n"]) for r in c1.collect())
    r8 = sorted((r["cluster"], tuple(r["centroid"]), r["n"]) for r in c8.collect())
    assert r1 == r8


def test_assign_plan_has_no_shuffle_of_corpus(spark, emb):
    c = kmeans_fit(emb, k=2, iters=1)
    plan = (
        kmeans_assign(emb, c)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # assignment is scan + one-row broadcast join: the only Exchange is
    # the SinglePartition collect_list that packs the k centroids — the
    # corpus itself is never hash-shuffled
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_kmeans_reliable_checkpoint_matches_local(spark, tmp_path):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    local = kmeans_fit(df, k=3, iters=2).collect()
    reliable = kmeans_fit(
        df, k=3, iters=2, checkpoint_dir=str(tmp_path / "km")
    ).collect()
    assert sorted(
        [(r["cluster"], r["n"], [round(x, 9) for x in r["centroid"]]) for r in local]
    ) == sorted(
        [(r["cluster"], r["n"], [round(x, 9) for x in r["centroid"]]) for r in reliable]
    )


def test_kcenter_matches_bruteforce_greedy(spark):
    """The distributed greedy trajectory equals a literal Python
    re-run of farthest-point selection with the same arithmetic."""
    import random

    from kafka_streams_plumber_spark.operators.clustering import kcenter_select

    rng = random.Random(11)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(40)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    # brute force with float32-faithful inputs (Spark stores float)
    import struct as st

    def f32(x):
        return st.unpack("f", st.pack("f", x))[0]

    v32 = {i: [f32(x) for x in v] for i, v in vecs.items()}

    def d2(a, b):
        return sum(
            int(round((x - y) * 1000)) ** 2 for x, y in zip(v32[a], v32[b])
        )

    centers = [min(v32)]
    mind = {i: d2(i, centers[0]) for i in v32}
    expected = [(1, centers[0], None)]
    for rnd in range(2, 6):
        nxt = max(mind, key=lambda i: (mind[i], -i))
        expected.append((rnd, nxt, mind[nxt]))
        for i in v32:
            mind[i] = min(mind[i], d2(i, nxt))
    got = sorted(
        map(tuple, kcenter_select(df, k=5).collect())
    )
    assert got == expected


def test_kcenter_reliable_checkpoint_identical(spark, tmp_path):
    from kafka_streams_plumber_spark.operators.clustering import kcenter_select

    df = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    fast = sorted(map(tuple, kcenter_select(df, k=3).collect()))
    rel = sorted(map(tuple, kcenter_select(
        df, k=3, checkpoint_dir=str(tmp_path)).collect()))
    assert fast == rel


def test_clustering_agreement_identical_and_permuted(spark):
    from kafka_streams_plumber_spark.operators.clustering import (
        clustering_agreement,
    )

    rows = [(i, i % 3, (i % 3 + 1) % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, a int, b int")
    # b is a pure relabeling of a: perfect agreement
    r = clustering_agreement(df, "a", "b").collect()[0]
    assert r["n"] == 30 and r["clusters_a"] == 3 and r["clusters_b"] == 3
    assert r["ari"] == 1.0 and abs(r["nmi"] - 1.0) < 1e-6


def test_clustering_agreement_sklearn_parity(spark):
    import itertools
    import math

    from kafka_streams_plumber_spark.operators.clustering import (
        clustering_agreement,
    )

    a = [0, 0, 0, 1, 1, 1, 2, 2]
    b = [0, 0, 1, 1, 2, 2, 2, 2]
    df = spark.createDataFrame(
        list(zip(range(len(a)), a, b)), "id long, a int, b int"
    )
    r = clustering_agreement(df, "a", "b").collect()[0]

    # reference ARI computed from first principles
    from collections import Counter
    cells = Counter(zip(a, b))
    ca, cb = Counter(a), Counter(b)
    c2 = lambda x: x * (x - 1) // 2
    sij = sum(c2(v) for v in cells.values())
    sa = sum(c2(v) for v in ca.values())
    sb = sum(c2(v) for v in cb.values())
    n2 = c2(len(a))
    exp = sa * sb / n2
    ari = (sij - exp) / ((sa + sb) / 2 - exp)
    assert abs(r["ari"] - round(ari, 6)) < 1e-6

    n = len(a)
    mi = sum(
        (c / n) * math.log(c * n / (ca[x] * cb[y]))
        for (x, y), c in cells.items()
    )
    ha = -sum((v / n) * math.log(v / n) for v in ca.values())
    hb = -sum((v / n) * math.log(v / n) for v in cb.values())
    assert abs(r["nmi"] - round(mi / ((ha + hb) / 2), 6)) < 1e-5


def test_clustering_agreement_random_near_zero_ari(spark):
    from kafka_streams_plumber_spark.operators.clustering import (
        clustering_agreement,
    )

    # b assigns by a hash unrelated to a: ARI ~ 0 (chance-corrected)
    rows = [(i, i % 2, (i * 2654435761) % 97 % 2) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, a int, b int")
    r = clustering_agreement(df, "a", "b").collect()[0]
    assert abs(r["ari"]) < 0.15 and 0.0 <= r["nmi"] < 0.15
