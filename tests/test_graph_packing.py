"""Connected components, dedup clustering, sequence packing, centroids."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)
from kafka_streams_plumber_spark.operators.packing import pack_sequences
from kafka_streams_plumber_spark.operators.similarity import label_centroids


def test_connected_components_chain_and_clique(spark):
    # chain 1-2-3-4 (diameter 3), clique 10-11-12, isolated pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a_id bigint, b_id bigint",
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_transitive_closure_across_rounds(spark):
    # a long path exercises multiple propagation rounds
    n = 20
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a_id bigint, b_id bigint"
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert set(comp.values()) == {0}


def test_connected_components_pointer_jumping_round_count(spark):
    # r12 optimization pin: label distance to the component minimum
    # roughly halves per round (one adjacency hop + one label-
    # compression hop), so a diameter-31 path must fully converge
    # within max_iter=8 (~log2(31)+change-detect rounds). Plain
    # min-of-neighbors propagation would need 31 rounds and, capped at
    # 8, would leave far nodes labeled with intermediate ids.
    n = 31
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a_id bigint, b_id bigint"
    )
    comp = {
        r["node"]: r["component"]
        for r in connected_components(edges, max_iter=8).collect()
    }
    assert set(comp.values()) == {0}
    assert len(comp) == n + 1


def test_dedup_clusters_keeps_one_canonical_per_cluster(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 6)], "a_id bigint, b_id bigint"
    )
    out = dedup_clusters(docs, pairs).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[5]["cluster_id"] == 1 and not by_id[5]["keep"]
    assert by_id[3]["cluster_id"] == 1 and not by_id[3]["keep"]
    assert by_id[1]["keep"]
    assert by_id[6]["cluster_id"] == 2 and not by_id[6]["keep"]
    # singletons survive as their own cluster
    assert by_id[0]["keep"] and by_id[0]["cluster_id"] == 0
    kept = [r for r in out if r["keep"]]
    assert {r["doc_id"] for r in kept} == {0, 1, 2, 4, 7}


def test_pack_sequences_contiguous_fill(spark):
    docs = spark.createDataFrame(
        [(i, 300) for i in range(12)], "doc_id bigint, n_tokens int"
    )
    out = pack_sequences(docs, "doc_id", "n_tokens", seq_len=512, n_shards=1).collect()
    rows = sorted(out, key=lambda r: r["doc_id"])
    # cumulative starts: 0, 300, 600, ... -> seq boundaries every 512
    assert [r["seq_idx"] for r in rows] == [0, 0, 1, 1, 2, 2, 3, 4, 4, 5, 5, 6]
    assert rows[0]["offset"] == 0 and rows[1]["offset"] == 300
    assert rows[2]["offset"] == 88  # 600 % 512: straddled the boundary
    # every shard's token stream is gapless: offsets reconstruct cumsum
    assert all(r["shard"] == 0 for r in rows)


def test_pack_sequences_sharding_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, 100 + i) for i in range(200)], "doc_id bigint, n_tokens int"
    )
    a = pack_sequences(docs, "doc_id", "n_tokens", seq_len=256, n_shards=8)
    b = pack_sequences(docs, "doc_id", "n_tokens", seq_len=256, n_shards=8)
    assert sorted(a.collect()) == sorted(b.collect())
    assert a.select("shard").distinct().count() == 8


def test_label_centroids_exact_values(spark):
    rows = [
        (1, [1.0, 2.0], 0),
        (2, [3.0, 4.0], 0),
        (3, [10.0, 20.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    out = {r["label"]: r for r in label_centroids(df).collect()}
    assert out[0]["centroid"] == [2.0, 3.0] and out[0]["n"] == 2
    assert out[1]["centroid"] == [10.0, 20.0] and out[1]["n"] == 1


def test_length_bucketed_batches_invariants(spark):
    from kafka_streams_plumber_spark.operators.packing import length_bucketed_batches

    rows = [(i, 10 + (i * 37) % 200) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    out = length_bucketed_batches(
        df, "doc_id", "n_tok", batch_size=8, bucket_edges=(32, 64, 128), n_shards=4
    ).collect()
    assert len(out) == 300
    by_key: dict = {}
    for r in out:
        # bucket edges respected
        edges = [32, 64, 128]
        if r["bucket"] < 3:
            assert r["n_tok"] <= edges[r["bucket"]]
            assert r["bucket"] == 0 or r["n_tok"] > edges[r["bucket"] - 1]
            assert r["pad_to"] == edges[r["bucket"]]
        else:
            assert r["n_tok"] > 128 and r["pad_to"] is None
        by_key.setdefault((r["bucket"], r["shard"], r["batch_idx"]), []).append(r)
    for (_, _, bidx), members in by_key.items():
        assert len(members) <= 8
    # deterministic across recomputation
    out2 = length_bucketed_batches(
        df, "doc_id", "n_tok", batch_size=8, bucket_edges=(32, 64, 128), n_shards=4
    ).collect()
    key = lambda r: r["doc_id"]
    assert sorted(out, key=key) == sorted(out2, key=key)


# ---------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------

from kafka_streams_plumber_spark.operators.graph import pagerank  # noqa: E402


def test_pagerank_two_node_cycle_is_uniform(spark):
    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    out = {r["node"]: r["rank"] for r in pagerank(e, iterations=10).collect()}
    # symmetric 2-cycle: fixed point is rank 1.0 everywhere
    assert abs(out[1] - 1.0) < 1e-9 and abs(out[2] - 1.0) < 1e-9


def test_pagerank_star_matches_hand_rollout(spark):
    # 3 leaves -> hub; hub -> leaf 1 only
    e = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (0, 1)], "src long, dst long"
    )
    out = {r["node"]: r["rank"] for r in pagerank(e, iterations=3).collect()}
    d = 0.85
    r = {0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0}
    for _ in range(3):
        r = {
            0: (1 - d) + d * (r[1] + r[2] + r[3]),
            1: (1 - d) + d * r[0],
            2: (1 - d),
            3: (1 - d),
        }
    for n in r:
        assert abs(out[n] - r[n]) < 1e-9, (n, out[n], r[n])


def test_pagerank_weights_split_contribution(spark):
    # node 0 sends 2/3 of its mass to 1, 1/3 to 2
    e = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 1.0)], "src long, dst long, w double"
    )
    out = {r["node"]: r["rank"] for r in pagerank(e, weight="w", iterations=1).collect()}
    assert abs(out[1] - (0.15 + 0.85 * (2 / 3))) < 1e-9
    assert abs(out[2] - (0.15 + 0.85 * (1 / 3))) < 1e-9


def test_pagerank_partition_invariant(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(200)]
    e = spark.createDataFrame(edges, "src long, dst long")
    a = {
        r["node"]: round(r["rank"], 9)
        for r in pagerank(e.repartition(8), iterations=4).collect()
    }
    b = {
        r["node"]: round(r["rank"], 9)
        for r in pagerank(e.coalesce(1), iterations=4).collect()
    }
    assert a == b


def test_reliable_checkpoint_paths_match_local(spark, tmp_path):
    # checkpoint_dir switches iterative lineage truncation from
    # localCheckpoint (fast, dies with an executor) to reliable
    # df.checkpoint into a shared dir (survives executor loss on real
    # clusters); results must be identical either way
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 8)], ["a_id", "b_id"]
    )
    local = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    reliable = {
        (r["node"], r["component"])
        for r in connected_components(
            edges, checkpoint_dir=str(tmp_path / "cc")
        ).collect()
    }
    assert local == reliable

    pr_edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], ["src", "dst"]
    )
    pl = {
        (r["node"], round(r["rank"], 9))
        for r in pagerank(pr_edges, iterations=3).collect()
    }
    pr = {
        (r["node"], round(r["rank"], 9))
        for r in pagerank(
            pr_edges, iterations=3, checkpoint_dir=str(tmp_path / "pr")
        ).collect()
    }
    assert pl == pr


def test_label_propagation_two_cliques(spark):
    """Two K4 cliques joined by one weak bridge settle into two
    communities labeled by their min member (matches a hand-run of the
    synchronous min-tie-break recurrence, which converges by round 2)."""
    from itertools import combinations

    from kafka_streams_plumber_spark.operators.graph import label_propagation

    k4a = list(combinations([1, 2, 3, 4], 2))
    k4b = list(combinations([10, 11, 12, 13], 2))
    edges = spark.createDataFrame(
        k4a + k4b + [(4, 10)], "a_id long, b_id long"
    )
    out = {r["node"]: r["label"] for r in
           label_propagation(edges, iterations=5).collect()}
    assert {out[n] for n in (1, 2, 3, 4)} == {1}
    assert {out[n] for n in (10, 11, 12, 13)} == {10}


def test_label_propagation_weight_beats_count(spark):
    """A single heavy edge outvotes two unit edges."""
    from kafka_streams_plumber_spark.operators.graph import label_propagation

    # node 5's neighbors: 1 (w=10), 2 (w=1), 3 (w=1). After round 1 it
    # must carry label 1 regardless of the min tie-break.
    edges = spark.createDataFrame(
        [(1, 5, 10), (2, 5, 1), (3, 5, 1)], "a_id long, b_id long, w long"
    )
    out = {r["node"]: r["label"] for r in
           label_propagation(edges, weight="w", iterations=1).collect()}
    assert out[5] == 1


def test_label_propagation_reliable_checkpoint_identical(spark, tmp_path):
    """checkpoint_dir mode returns the same labeling."""
    from kafka_streams_plumber_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (3, 4)], "a_id long, b_id long"
    )
    fast = sorted(map(tuple, label_propagation(edges, iterations=3).collect()))
    reliable = sorted(map(tuple, label_propagation(
        edges, iterations=3, checkpoint_dir=str(tmp_path)).collect()))
    assert fast == reliable


def test_dedup_weights_mass_conservation(spark):
    """Cluster weights sum to one per cluster; singletons weigh 1.0."""
    from kafka_streams_plumber_spark.operators.graph import dedup_weights

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "a_id long, b_id long"
    )
    out = dedup_weights(docs, pairs).collect()
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["weight"])
           for r in out}
    assert got[0] == (0, 3, round(1 / 3, 6))
    assert got[1][0] == 0 and got[2][0] == 0
    assert got[3] == (3, 2, 0.5) and got[4] == (3, 2, 0.5)
    assert got[5] == (5, 1, 1.0)


def test_kcore_peels_recursively(spark):
    """A triangle + pendant chain: the 2-core is exactly the triangle
    (chain nodes peel in cascade even though the first has degree 2)."""
    from kafka_streams_plumber_spark.operators.graph import kcore

    # triangle 1-2-3; chain 3-4-5-6 (4 has deg 2 initially but peels
    # after 6 and 5 go)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)],
        "a_id long, b_id long",
    )
    out = {r["node"]: r["degree"] for r in kcore(edges, 2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
    # 3-core of the same graph is empty
    assert kcore(edges, 3).count() == 0


def test_kcore_matches_sequential_peeling(spark):
    import random
    from collections import defaultdict

    from kafka_streams_plumber_spark.operators.graph import kcore

    rng = random.Random(9)
    edges = list({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {r["node"] for r in kcore(df, 3, max_iter=20).collect()}

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    # sequential peeling (any order) converges to the unique 3-core
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < 3:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    assert got == set(adj)


def test_neighborhood_jaccard_hand_computed(spark):
    """Path graph 1-2-3-4 plus edge 1-3: non-adjacent pair (2,4) shares
    {3}: deg(2)=2, deg(4)=1 -> jaccard = 1/(2+1-1) = 0.5; pair (1,4)
    shares {3}: deg(1)=2... hand-check below. Adjacent pairs never
    appear; the hub cap shrinks common counts only."""
    from pyspark.sql import functions as F

    from kafka_streams_plumber_spark.operators.graph import (
        neighborhood_jaccard,
    )

    edges = [(1, 2), (2, 3), (3, 4), (1, 3)]
    df = spark.createDataFrame(edges, "a_id int, b_id int")
    got = {
        (r["node_a"], r["node_b"]): r
        for r in neighborhood_jaccard(df).collect()
    }
    # adjacency: 1:{2,3}, 2:{1,3}, 3:{2,4,1}, 4:{3}
    # non-adjacent pairs with common neighbors:
    #   (1,4): common {3} -> 1/(2+1-1) = 0.5
    #   (2,4): common {3} -> 1/(2+1-1) = 0.5
    assert set(got) == {(1, 4), (2, 4)}
    assert got[(1, 4)]["common_neighbors"] == 1
    assert got[(1, 4)]["jaccard"] == 0.5
    assert got[(2, 4)]["jaccard"] == 0.5

    # max_degree=2 drops center 3 (deg 3): no wedges survive
    assert neighborhood_jaccard(df, max_degree=2).count() == 0


def test_hits_hand_computed_bipartite(spark):
    """Directed star: a->x, a->y, b->y, c->y. Pure-Python reference
    of the same max-normalized power iteration; pure hubs get auth 0,
    pure authorities get hub 0, top of each score pins at 1.0."""
    from kafka_streams_plumber_spark.operators.graph import hits

    edges = [("a", "x"), ("a", "y"), ("b", "y"), ("c", "y")]
    nodes = sorted({n for e in edges for n in e})
    h = {n: 1.0 for n in nodes}
    a = {n: 0.0 for n in nodes}
    for _ in range(5):
        a = {n: 0.0 for n in nodes}
        for s, d in edges:
            a[d] += h[s]
        m = max(a.values())
        a = {n: (v / m if m else 0.0) for n, v in a.items()}
        h = {n: 0.0 for n in nodes}
        for s, d in edges:
            h[s] += a[d]
        m = max(h.values())
        h = {n: (v / m if m else 0.0) for n, v in h.items()}

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: (round(r["hub"], 6), round(r["auth"], 6))
        for r in hits(df, "src", "dst", iterations=5).collect()
    }
    assert set(got) == set(nodes)
    for n in nodes:
        assert got[n] == (round(h[n], 6), round(a[n], 6)), n
    assert got["a"][0] == 1.0 and got["y"][1] == 1.0
    assert got["x"][0] == 0.0 and got["a"][1] == 0.0


def test_hits_weighted_and_oracle_parity_duckdb(spark):
    """Weighted edges change the scores; the unrolled SQL oracle
    replays the Spark iteration bit-for-bit on DuckDB."""
    import duckdb

    from kafka_streams_plumber_spark.operators.graph import (
        hits,
        hits_oracle_sql,
    )

    edges = [
        (1, 10, 3.0), (1, 11, 1.0), (2, 10, 1.0), (3, 11, 2.0),
        (3, 12, 1.0), (2, 12, 5.0),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {
        r["node"]: (round(r["hub"], 6), round(r["auth"], 6))
        for r in hits(df, "src", "dst", weight="w", iterations=4).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE edges AS SELECT * FROM (VALUES "
        + ", ".join(f"({s}, {d}, {w})" for s, d, w in edges)
        + ") t(src, dst, w)"
    )
    sql = hits_oracle_sql(
        "SELECT src, dst, w FROM edges", iterations=4
    )
    want = {
        int(n): (round(hh, 6), round(aa, 6))
        for n, hh, aa in con.execute(sql).fetchall()
    }
    assert got == want


def test_degree_assortativity_hand_computed(spark):
    """Star K_{1,4} -> r = -1 (pure hub-and-spoke); a cycle -> NULL
    (all degrees equal, zero variance); triangle + pendant ->
    -20/28 = -0.714286 (networkx agrees); duplicate/self-loop edges
    are cleaned first."""
    from kafka_streams_plumber_spark.operators.graph import (
        degree_assortativity,
    )

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    r = degree_assortativity(star).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["r"]) == (5, 4, -1.0)

    cycle = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src long, dst long"
    )
    rc = degree_assortativity(cycle).collect()[0]
    assert rc["r"] is None and rc["n_edges"] == 5

    tri = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (2, 3), (1, 4), (4, 4)],
        "src long, dst long",
    )
    rt = degree_assortativity(tri).collect()[0]
    assert (rt["n_nodes"], rt["n_edges"]) == (4, 4)
    assert rt["r"] == -0.714286


def test_clustering_coefficient_hand_computed(spark):
    """Triangle + pendant: wedges 5, triangles 1, global C = 3/5,
    avg local = (1/3 + 1 + 1)/3 = 0.777778 (networkx agrees); K4 is
    fully clustered (both 1.0); a path has no triangles (global 0,
    local 0); dirty edges (dupes, self-loops, both orientations) are
    canonicalized first."""
    from kafka_streams_plumber_spark.operators.graph import (
        clustering_coefficient,
    )

    tri = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (2, 3), (1, 4), (4, 4)],
        "src long, dst long",
    )
    r = clustering_coefficient(tri).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (
        4, 4, 5, 1,
    )
    assert r["global_c"] == 0.6
    assert r["avg_local_c"] == 0.777778

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "src long, dst long",
    )
    rk = clustering_coefficient(k4).collect()[0]
    assert (rk["global_c"], rk["avg_local_c"]) == (1.0, 1.0)
    assert (rk["n_wedges"], rk["n_triangles"]) == (12, 4)

    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    rp = clustering_coefficient(path).collect()[0]
    assert (rp["global_c"], rp["avg_local_c"]) == (0.0, 0.0)
    assert rp["n_triangles"] == 0
