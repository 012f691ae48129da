"""operators/ordering.py — deterministic global permutation + sharding."""

from __future__ import annotations

from kafka_streams_plumber_spark.operators.ordering import (
    epoch_shards,
    global_order,
)


def test_global_order_is_a_permutation(spark):
    df = spark.range(500).withColumnRenamed("id", "doc_id").repartition(7)
    out = global_order(df, "doc_id", seed=1, pos_col="pos")
    pos = sorted(r["pos"] for r in out.collect())
    assert pos == list(range(500))


def test_global_order_deterministic_across_partitionings(spark):
    df1 = spark.range(300).withColumnRenamed("id", "doc_id").repartition(3)
    df2 = spark.range(300).withColumnRenamed("id", "doc_id").repartition(11)
    a = {r["doc_id"]: r["pos"] for r in global_order(df1, "doc_id", seed=9).collect()}
    b = {r["doc_id"]: r["pos"] for r in global_order(df2, "doc_id", seed=9).collect()}
    assert a == b


def test_global_order_seed_changes_permutation(spark):
    df = spark.range(300).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["pos"] for r in global_order(df, "doc_id", seed=1).collect()}
    b = {r["doc_id"]: r["pos"] for r in global_order(df, "doc_id", seed=2).collect()}
    assert a != b
    assert sorted(a.values()) == sorted(b.values())


def test_epoch_shards_balanced_and_consistent(spark):
    df = spark.range(501).withColumnRenamed("id", "doc_id").repartition(5)
    out = epoch_shards(df, "doc_id", n_shards=8, seed=3).collect()
    sizes = {}
    for r in out:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
    # 501 rows over 8 round-robin shards: sizes differ by at most 1
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sum(sizes.values()) == 501
    # interleaving shards by (pos_in_shard, shard) reconstructs the
    # global permutation
    glob = {
        r["doc_id"]: r["pos"]
        for r in global_order(df, "doc_id", seed=3, pos_col="pos").collect()
    }
    for r in out:
        assert glob[r["doc_id"]] == r["pos_in_shard"] * 8 + r["shard"]


def test_rank_by_matches_row_number(spark):
    from pyspark.sql import functions as F

    from kafka_streams_plumber_spark.operators.ordering import rank_by

    df = spark.createDataFrame(
        [(i, (i * 37) % 50) for i in range(200)], ["id", "v"]
    )
    got = {r["id"]: r["pos"] for r in rank_by(df, ["v", "id"]).collect()}
    expect = {
        r["id"]: r["rn"]
        for r in df.selectExpr(
            "id", "row_number() OVER (ORDER BY v, id) - 1 AS rn"
        ).collect()
    }
    assert got == expect


def test_rank_many_equals_per_metric_rank_by(spark):
    """The fused single-exchange multi-metric rank must agree with one
    rank_by per metric (tie-broken by id) on every metric, including
    heavily tied columns and across partitionings."""
    from pyspark.sql import functions as F

    from kafka_streams_plumber_spark.operators.ordering import (
        rank_by,
        rank_many,
    )

    df = spark.createDataFrame(
        [(i, (i * 37) % 50, (i * 13) % 7, 1000 - i) for i in range(300)],
        ["id", "a", "b", "c"],
    ).repartition(7)
    fused = {
        r["id"]: (r["a_rank"], r["b_rank"], r["c_rank"])
        for r in rank_many(df, ["a", "b", "c"], "id").collect()
    }
    per = {}
    for m in ("a", "b", "c"):
        for r in rank_by(df.select("id", m), [m, "id"], pos_col="p").collect():
            per.setdefault(r["id"], {})[m] = r["p"]
    assert len(fused) == 300
    for i, (ra, rb, rc) in fused.items():
        assert (ra, rb, rc) == (per[i]["a"], per[i]["b"], per[i]["c"]), i
    # each metric's ranks are a permutation of 0..n-1
    for k in range(3):
        assert sorted(v[k] for v in fused.values()) == list(range(300))


def test_rank_normalize_bounds_and_mean(spark):
    from kafka_streams_plumber_spark.operators.ordering import rank_normalize

    df = spark.createDataFrame(
        [(i, float(i), float(100 - i)) for i in range(101)], ["id", "a", "b"]
    )
    out = {r["id"]: r for r in rank_normalize(df, "id", ["a", "b"]).collect()}
    # a and b are perfectly anti-correlated: every composite is 0.5
    assert all(abs(r["quality"] - 0.5) < 1e-12 for r in out.values())
    assert out[0]["a_rank"] == 0 and out[0]["b_rank"] == 100
    assert out[100]["a_rank"] == 100 and out[100]["b_rank"] == 0


def test_write_training_shards_layout_and_manifest(spark, tmp_path):
    """Shard dirs exist, rows stream in pos order, interleaving
    reconstructs the global permutation, manifest matches the data."""
    from kafka_streams_plumber_spark.operators.ordering import (
        global_order,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, 10 + i % 7) for i in range(97)], "doc_id long, n_tok long"
    )
    out = str(tmp_path / "corpus")
    manifest = write_training_shards(
        df, out, "doc_id", n_shards=4, token_col="n_tok"
    ).collect()

    m = {r["shard"]: r for r in manifest}
    assert set(m) == {0, 1, 2, 3}
    assert sum(r["n_rows"] for r in manifest) == 97
    assert max(r["n_rows"] for r in manifest) - min(
        r["n_rows"] for r in manifest
    ) <= 1

    back = spark.read.parquet(f"{out}/data")
    assert back.count() == 97
    # per-shard: rows are 0..n-1 in pos; token sums match the manifest
    for k in range(4):
        rows = (
            back.filter(f"shard = {k}")
            .select("doc_id", "pos_in_shard", "n_tok")
            .collect()
        )
        assert sorted(r["pos_in_shard"] for r in rows) == list(range(len(rows)))
        assert sum(r["n_tok"] for r in rows) == m[k]["n_tokens"]
        assert m[k]["max_pos"] == len(rows) - 1
    # interleaving shards by position == the global permutation
    perm = {
        r["doc_id"]: r["_gp"]
        for r in global_order(df, "doc_id", pos_col="_gp").collect()
    }
    got = {
        r["doc_id"]: r["pos_in_shard"] * 4 + r["shard"]
        for r in back.collect()
    }
    assert got == perm
    # written manifest parquet matches the returned frame
    disk = {
        r["shard"]: r
        for r in spark.read.parquet(f"{out}/_manifest").collect()
    }
    assert {k: (v["n_rows"], v["n_tokens"]) for k, v in disk.items()} == {
        k: (v["n_rows"], v["n_tokens"]) for k, v in m.items()
    }


def test_running_total_matches_serial_cumsum(spark):
    from pyspark.sql import functions as F

    from kafka_streams_plumber_spark.operators.ordering import running_total

    rows = [(i, (i * 7) % 13, float(i % 5 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, k long, v double")
    out = running_total(
        df.repartition(8), [F.col("k"), F.col("id")], "v", out_col="rt"
    ).collect()
    got = {(r["k"], r["id"]): r["rt"] for r in out}
    acc = 0.0
    for k, i, v in sorted((r[1], r[0], r[2]) for r in rows):
        acc += v
        assert got[(k, i)] == acc


def test_vocab_coverage_hand_computed(spark):
    from kafka_streams_plumber_spark.operators.text import vocab_coverage

    # masses: a=50, b=30, c=15, d=5 (total 100)
    text = " ".join(["a"] * 50 + ["b"] * 30 + ["c"] * 15 + ["d"] * 5)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        r["target"]: (r["tokens_needed"], r["mass_covered"], r["vocab_total"])
        for r in vocab_coverage(df, targets=(0.5, 0.8, 0.95, 1.0)).collect()
    }
    assert got[0.5] == (1, 0.5, 4)     # a alone covers 50%
    assert got[0.8] == (2, 0.8, 4)     # a+b = 80%
    assert got[0.95] == (3, 0.95, 4)   # a+b+c = 95%
    assert got[1.0] == (4, 1.0, 4)


def test_vocab_cov_and_centroid_sim_oracles_split_on_cr(spark):
    """Regression for ADVICE r5: the q_vocab_cov / q_centroid_sim
    oracle whitespace classes held literal control chars with the \\r
    normalized away, so a CR-separated corpus tokenized differently in
    DuckDB than in Spark. Feed CR-laced documents through BOTH sides
    and require identical values."""
    import duckdb
    import pandas as pd

    from kafka_streams_plumber_spark import queries as Q
    from kafka_streams_plumber_spark.operators.similarity import (
        centroid_similarity,
    )
    from kafka_streams_plumber_spark.operators.text import vocab_coverage

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "source": ["web", "web", "news", "news"],
            "text": [
                "alpha\rbeta\r\ngamma alpha",
                "beta\tdelta\ralpha",
                "gamma\r\repsilon beta",
                "alpha\rzeta",
            ],
        }
    )
    sdf = spark.createDataFrame(docs)

    con = duckdb.connect()
    con.register("documents", docs)

    got = sorted(
        (
            (r["target"], r["tokens_needed"], r["mass_covered"], r["vocab_total"])
            for r in vocab_coverage(sdf, targets=(0.9, 0.95, 0.99)).collect()
        )
    )
    want = sorted(
        (float(t), int(n), float(m), int(v))
        for t, n, m, v in con.execute(Q.ORACLES["q_vocab_cov"]).fetchall()
    )
    assert got == want

    got_cs = sorted(
        (r["group_a"], r["group_b"], r["dot"], r["cosine"])
        for r in centroid_similarity(sdf, "source", "text", dim=64).collect()
    )
    want_cs = sorted(
        (a, b, int(d), float(c))
        for a, b, d, c in con.execute(Q.ORACLES["q_centroid_sim"]).fetchall()
    )
    assert got_cs == want_cs


def test_running_total_multi_column_and_fused_rank(spark):
    """List-valued value_col/out_col + pos_col: every cumulative column
    and the global ordinal ride ONE range exchange and agree with the
    stacked single-column form."""
    from kafka_streams_plumber_spark.operators.ordering import (
        running_total,
    )

    rows = [(5, 1, 10), (3, 2, 20), (8, 3, 30), (1, 4, 40), (8, 5, 50)]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    out = {
        r["k"]: (r["ca"], r["cb"], r["pos"])
        for r in running_total(
            df, ["k"], ["a", "b"], out_col=["ca", "cb"], pos_col="pos"
        ).collect()
    }
    # ascending k: 1, 3, 5, 8, 8 -> cumulative a: 4, 6, 7, 10, 15
    assert out[1] == (4, 40, 0)
    assert out[3] == (4 + 2, 40 + 20, 1)
    assert out[5] == (7, 70, 2)
    # the two k=8 rows serialize consistently; the LAST holds the total
    ca_vals = sorted(v[0] for v in [out[8]])
    assert out[8][0] in (10, 15)  # one row visible per key in dict
    # totals check over full frame instead:
    full = running_total(
        df, ["k", "a"], ["a", "b"], out_col=["ca", "cb"], pos_col="pos"
    ).collect()
    last = max(full, key=lambda r: r["pos"])
    assert last["ca"] == 15 and last["cb"] == 150 and last["pos"] == 4
    assert sorted(r["pos"] for r in full) == [0, 1, 2, 3, 4]

    # mismatched lengths are an explicit error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        running_total(df, ["k"], ["a", "b"], out_col="only_one")


def test_running_min_suffix_min_shape(spark):
    """running_min over a DESC key is the suffix-min (the BH q-value
    shape); over an ASC key it is the plain prefix-min."""
    from kafka_streams_plumber_spark.operators.ordering import running_min

    rows = [(1, 5.0), (2, 3.0), (3, 4.0), (4, 1.0), (5, 2.0)]
    df = spark.createDataFrame(rows, "k long, v double")
    from pyspark.sql import functions as F

    pre = {
        r["k"]: r["rm"]
        for r in running_min(df, ["k"], "v", out_col="rm").collect()
    }
    assert pre == {1: 5.0, 2: 3.0, 3: 3.0, 4: 1.0, 5: 1.0}
    suf = {
        r["k"]: r["rm"]
        for r in running_min(
            df, [F.col("k").desc()], "v", out_col="rm"
        ).collect()
    }
    assert suf == {5: 2.0, 4: 1.0, 3: 1.0, 2: 1.0, 1: 1.0}
