"""Sketch-based aggregates: HLL accuracy bound vs exact."""

from __future__ import annotations

from kafka_streams_plumber_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_tolerance(spark):
    # the contract query now self-checks: it emits the exact per-group
    # cardinality plus within_bound = |HLL estimate - exact| <= 10%
    # (the raw estimate left the output so the DuckDB oracle can pin
    # the row hash; this test keeps the accuracy assertion end-to-end)
    exact = {
        (r["event_type"]): r["users"]
        for r in QUERIES["q_count_distinct"](spark, SF).collect()
    }
    rows = QUERIES["q_approx_distinct"](spark, SF).collect()
    got = {r["event_type"]: r for r in rows}
    assert exact.keys() == got.keys()
    for k, v in exact.items():
        assert got[k]["users_exact"] == v, (k, v, got[k])
        assert got[k]["within_bound"], (k, v)


# ---------------------------------------------------------------------
# Bloom filter / bloom-pruned join
# ---------------------------------------------------------------------

from kafka_streams_plumber_spark.operators.sketches import (  # noqa: E402
    bloom_build,
    bloom_might_contain,
    bloom_prune_join,
)


def _bloom_words(spark, keys, **kw):
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    m_bits = kw.get("m_bits", 1 << 16)
    words = [0] * (m_bits // 32)
    for row in bloom_build(df, "k", **kw).collect():
        words[row["word"]] = row["bits"]
    return words


def test_bloom_no_false_negatives(spark):
    keys = list(range(0, 2000, 3))
    words = _bloom_words(spark, keys)
    probe = spark.createDataFrame([(k,) for k in keys], "k long")
    kept = probe.filter(bloom_might_contain(words, "k")).count()
    assert kept == len(keys)  # every inserted key must pass


def test_bloom_prunes_most_non_members(spark):
    members = list(range(100))
    words = _bloom_words(spark, members)
    probe = spark.createDataFrame([(k,) for k in range(100, 20100)], "k long")
    fp = probe.filter(bloom_might_contain(words, "k")).count()
    # 100 keys in 2^16 bits, k=5 -> fp rate well under 1%
    assert fp < 0.01 * 20000, fp


def test_bloom_prune_join_exact(spark):
    probe = spark.createDataFrame(
        [(i % 500, i) for i in range(5000)], "k long, payload long"
    )
    build = spark.createDataFrame(
        [(k, f"v{k}") for k in range(0, 500, 7)], "k long, tag string"
    )
    got = bloom_prune_join(probe, build, "k")
    want = probe.join(build, "k")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bloom_probe_filter_is_shuffle_free(spark):
    """The pruning predicate must evaluate pre-exchange: a pure
    projection over the scan, no join/explode on the probe side."""
    from kafka_streams_plumber_spark.plans.inspect import shuffle_count

    words = _bloom_words(spark, [1, 2, 3])
    probe = spark.createDataFrame([(k,) for k in range(100)], "k long")
    pruned = probe.filter(bloom_might_contain(words, "k"))
    assert shuffle_count(pruned) == 0


def test_hll_accuracy_and_linear_counting(spark):
    """5000 sequential keys estimate within ~4 standard errors
    (1.04/sqrt(1024) ~ 3.3%); a 5-key set rides the linear-counting
    branch and lands within 0.5; NULL keys are excluded."""
    from pyspark.sql import functions as F

    from kafka_streams_plumber_spark.operators.sketches import hll_distinct

    df = spark.range(5000).select(
        F.lit("g").alias("g"), F.col("id").alias("k")
    )
    r = hll_distinct(df, "g", "k", p=10).collect()[0]
    assert abs(r["n_est"] - 5000) / 5000 < 0.13
    assert r["registers_used"] <= 1024

    small = spark.createDataFrame(
        [("g", v) for v in (10, 20, 30, 40, 50)] + [("g", None)],
        "g string, k long",
    )
    s = hll_distinct(small, "g", "k", p=10).collect()[0]
    assert abs(s["n_est"] - 5) < 0.5


def test_hll_registers_merge_equals_whole(spark):
    """Sketch mergeability: registers built on two halves, unioned and
    max-reduced, must equal the registers (and the estimate) of the
    whole — the property that makes per-batch sketches composable."""
    from pyspark.sql import functions as F

    from kafka_streams_plumber_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    whole = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 7919).alias("k"),
    )
    h1 = whole.where(F.col("k") % 2 == 0)
    h2 = whole.where(F.col("k") % 2 != 0)
    merged = (
        hll_registers(h1, "g", "k", p=8)
        .union(hll_registers(h2, "g", "k", p=8))
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    direct = hll_registers(whole, "g", "k", p=8)
    a = {(r["g"], r["bucket"]): r["rho"] for r in merged.collect()}
    b = {(r["g"], r["bucket"]): r["rho"] for r in direct.collect()}
    assert a == b
    ea = {
        r["g"]: r["n_est"]
        for r in hll_estimate(merged, "g", p=8).collect()
    }
    eb = {
        r["g"]: r["n_est"]
        for r in hll_estimate(direct, "g", p=8).collect()
    }
    assert ea == eb
