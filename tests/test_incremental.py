"""Incremental-ingestion operators: signature-index dedup, CMS
sketches, FK audit, exact per-group quotas."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.dedup import (
    build_minhash_index,
    incremental_minhash_dedup,
)
from kafka_streams_plumber_spark.operators.diff import audit_fk
from kafka_streams_plumber_spark.operators.sampling import sample_per_group
from kafka_streams_plumber_spark.operators.sketches import cms_build, cms_lookup


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog wearing number %d"
    rows = [(i, base % (i % 5)) for i in range(10)]  # 5 distinct texts x2
    rows += [(100 + i, f"totally unrelated document text {i} " * 5) for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_drops_indexed_copies(spark):
    d = _docs(spark)
    index = build_minhash_index(d.filter(F.col("doc_id") < 5), "text", "doc_id")
    batch = d.filter(F.col("doc_id") >= 5)
    kept = incremental_minhash_dedup(batch, index, "text", "doc_id", threshold=0.9)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # docs 5..9 repeat texts 0..4 (indexed) -> dropped; 100.. unique -> kept
    assert ids == [100, 101, 102, 103, 104]


def test_incremental_dedup_index_append_roundtrip(spark):
    d = _docs(spark)
    idx1 = build_minhash_index(d.filter(F.col("doc_id") < 5), "text", "doc_id")
    b1 = d.filter((F.col("doc_id") >= 100))
    kept1 = incremental_minhash_dedup(b1, idx1, "text", "doc_id", threshold=0.9)
    # append kept batch to the index; re-ingesting the same batch now drops all
    idx2 = idx1.union(build_minhash_index(kept1, "text", "doc_id"))
    kept2 = incremental_minhash_dedup(b1, idx2, "text", "doc_id", threshold=0.9)
    assert kept1.count() == 5 and kept2.count() == 0


def test_cms_never_undercounts_and_is_tight_when_sparse(spark):
    df = spark.createDataFrame(
        [(i % 10,) for i in range(1000)] + [(999,)], "k long"
    )
    sketch = cms_build(df, "k", depth=4, width=2048)
    est = {
        r["key"]: r["est"]
        for r in cms_lookup(sketch, df, "k", depth=4, width=2048).collect()
    }
    true = {i: 100 for i in range(10)}
    true[999] = 1
    for k, t in true.items():
        assert est[k] >= t
        assert est[k] <= t + 2  # 11 distinct keys in 2048 cells: no crowding
    # mergeable: union of two half-sketches == sketch of the union
    h1 = cms_build(df.filter(F.col("k") < 5), "k")
    h2 = cms_build(df.filter(F.col("k") >= 5), "k")
    merged = h1.union(h2).groupBy("j", "cell").agg(F.sum("cnt").alias("cnt"))
    est_m = {
        r["key"]: r["est"] for r in cms_lookup(merged, df, "k").collect()
    }
    assert est_m == est


def test_audit_fk_counts(spark):
    fact = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (None,)], "fk long"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "dk long")
    r = audit_fk(fact, dim, "fk", "dk").collect()[0]
    assert r["n_fact"] == 5
    assert r["n_orphans"] == 2  # key 9 and the NULL
    assert r["orphan_rate"] == 0.4
    assert r["n_dim"] == 3
    assert r["n_dim_unref"] == 1  # key 3


def test_sample_per_group_exact_quota(spark):
    rows = [(g * 1000 + i, "g%d" % g) for g in range(3) for i in range(g * 10 + 5)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = sample_per_group(df, "id", "grp", 8)
    counts = {
        r["grp"]: r["n"]
        for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    # group sizes 5, 15, 25 -> quotas min(8, n)
    assert counts == {"g0": 5, "g1": 8, "g2": 8}
    # deterministic across partitionings
    a = sorted(r["id"] for r in sample_per_group(df.repartition(1), "id", "grp", 8).collect())
    b = sorted(r["id"] for r in sample_per_group(df.repartition(7), "id", "grp", 8).collect())
    assert a == b
