"""Dedup operator semantics on synthetic fixtures (near-dup planted)."""

from __future__ import annotations

import pytest

from kafka_streams_plumber_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away today "
    "while the sun shines bright over the green hills of the old valley"
)
NEAR = BASE.replace("lazy", "sleepy")  # one-token edit -> high jaccard
OTHER = (
    "completely different content about spark query engines and columnar "
    "execution with vectorized operators shuffling partitions across nodes"
)


@pytest.fixture()
def docs(spark):
    rows = [(0, BASE), (1, NEAR), (2, OTHER), (3, BASE)]  # 3 = exact copy of 0
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = {r.keep_id: r.n_copies for r in exact_dedup(docs, ["text"], "doc_id").collect()}
    assert out[0] == 2  # doc 3 collapsed into doc 0
    assert out[1] == 1 and out[2] == 1


def test_minhash_finds_planted_pair(spark, docs):
    pairs = {(r.a_id, r.b_id) for r in minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5).collect()}
    assert (0, 1) in pairs  # near-dup
    assert (0, 3) in pairs  # exact dup
    assert not any({a, b} == {0, 2} for a, b in pairs)  # unrelated not paired


def test_minhash_dedup_keeps_lowest_id(spark, docs):
    kept = sorted(r.doc_id for r in minhash_dedup(docs, "text", "doc_id", threshold=0.5).collect())
    assert kept == [0, 2]


def test_ngram_jaccard_exact_values(spark, docs):
    rows = {(r.a_id, r.b_id): r.jaccard for r in ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.2).collect()}
    assert rows[(0, 3)] == 1.0  # identical docs
    assert 0.5 < rows[(0, 1)] < 1.0  # one-token edit


def test_minhash_agrees_with_exact_jaccard(spark, docs):
    """LSH + verify must equal exact all-pairs at high thresholds."""
    lsh = {(r.a_id, r.b_id, r.jaccard) for r in minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5).collect()}
    exact = {(r.a_id, r.b_id, r.jaccard) for r in ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5).collect()}
    assert lsh == exact


def test_simhash_ranks_near_dups_closer(spark, docs):
    pairs = {(r.a_id, r.b_id): r.hamming for r in simhash_pairs(docs, "text", "doc_id", max_hamming=64, bands=4, allow_probabilistic=True).collect()}
    assert pairs[(0, 3)] == 0  # identical -> same simhash
    assert pairs[(0, 1)] <= 10  # near-dup -> small hamming
    far = pairs.get((0, 2), 64)
    assert far > pairs[(0, 1)]  # unrelated doc is farther than near-dup


def test_decontaminate_flags_overlapping_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated content about spark engines"),
            (3, "a quick brown fox appears in this doc too"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox run")], "doc_id bigint, text string"
    )
    from kafka_streams_plumber_spark.operators.dedup import decontaminate

    out = {r["doc_id"]: r for r in decontaminate(docs, bench, k=3).collect()}
    assert out[1]["contaminated"]  # shares "the quick brown" / "quick brown fox"
    assert out[3]["contaminated"]  # shares "quick brown fox"
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0


def test_decontaminate_min_hits_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id bigint, text string"
    )
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma")], "doc_id bigint, text string"
    )
    from kafka_streams_plumber_spark.operators.dedup import decontaminate

    strict = decontaminate(docs, bench, k=3, min_hits=2).collect()[0]
    assert strict["n_hits"] == 1 and not strict["contaminated"]


def test_decontaminate_spans_merges_overlaps(spark):
    from kafka_streams_plumber_spark.operators.dedup import decontaminate_spans

    # doc 1 contains the benchmark phrase "a b c d" (two overlapping
    # 3-gram hits at pos 2,3 -> ONE span [2, 6)) plus an isolated hit
    # "x y z" at pos 8 -> second span [8, 11)
    docs = spark.createDataFrame(
        [
            (1, "p q a b c d r s x y z"),
            (2, "nothing shared here at all"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "a b c d"), (101, "x y z")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in decontaminate_spans(docs, bench, k=3).collect()}
    assert 2 not in out
    r = out[1]
    assert r["n_hit_grams"] == 3          # pos 2, 3 and pos 8
    assert r["n_spans"] == 2
    assert r["covered_tokens"] == (6 - 2) + (11 - 8)


def test_decontaminate_spans_repeated_gram_hits_each_position(spark):
    from kafka_streams_plumber_spark.operators.dedup import decontaminate_spans

    docs = spark.createDataFrame([(1, "a b c k k k a b c")], ["doc_id", "text"])
    bench = spark.createDataFrame([(9, "a b c")], ["doc_id", "text"])
    r = decontaminate_spans(docs, bench, k=3).collect()[0]
    # the same gram appears at pos 0 and pos 6: two separate spans
    assert r["n_hit_grams"] == 2 and r["n_spans"] == 2
    assert r["covered_tokens"] == 6


def test_simhash_md5_mode_finds_same_near_dups(spark):
    from kafka_streams_plumber_spark.operators.dedup import simhash_pairs

    base = "the quick brown fox jumps over the lazy dog " * 5
    docs = spark.createDataFrame(
        [
            (1, base + "end"),
            (2, base + "fin"),  # 1 of 46 tokens differs
            (3, "completely unrelated text about spark plans and bytes"),
        ],
        ["doc_id", "text"],
    )
    for mode in ("xxhash64", "md5"):
        pairs = {
            (r["a_id"], r["b_id"])
            for r in simhash_pairs(
                docs, "text", "doc_id", max_hamming=16, hash_fn=mode
            ).collect()
        }
        assert (1, 2) in pairs, mode
        assert (1, 3) not in pairs and (2, 3) not in pairs, mode


def test_semantic_dedup_transitive_keep(spark):
    """A near-dup chain a~b, b~c clusters all three even if a!~c
    directly (transitive), and only the min id survives."""
    from kafka_streams_plumber_spark.operators.dedup import semantic_dedup

    a = BASE
    b = BASE.replace("lazy", "sleepy").replace("quick", "fast")
    c = (
        BASE.replace("lazy", "sleepy")
        .replace("quick", "fast")
        .replace("brown", "red")
        .replace("sun", "moon")
    )
    rows = [(10, a), (11, b), (12, c), (13, OTHER)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = semantic_dedup(docs, "text", "doc_id", dim=64, threshold=0.8)
    got = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in out.collect()}
    assert got[10] == (10, True)
    assert got[11] == (10, False)
    assert got[12] == (10, False)
    assert got[13] == (13, True)


def test_semantic_dedup_lsh_path_matches_exact(spark):
    """exact=False (sign-LSH candidates) recovers the same clusters as
    the exact baseline on a corpus of well-separated near-dup groups."""
    from kafka_streams_plumber_spark.operators.dedup import semantic_dedup

    rows = [
        (0, BASE),
        (1, BASE.replace("lazy", "sleepy")),
        (2, OTHER),
        (3, OTHER.replace("spark", "flink")),
        (4, "tiny unrelated doc about cooking pasta with garlic and olive oil"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = semantic_dedup(docs, "text", "doc_id", threshold=0.8)
    lsh = semantic_dedup(
        docs, "text", "doc_id", threshold=0.8, exact=False,
        n_planes=8, n_tables=8,
    )
    e = sorted(map(tuple, exact.select("doc_id", "cluster_id", "keep").collect()))
    l = sorted(map(tuple, lsh.select("doc_id", "cluster_id", "keep").collect()))
    assert e == l
    assert sum(1 for (_, _, k) in e if k) == 3


def test_semantic_dedup_auto_sizing_matches_exact(spark):
    """target_bucket_size (data-derived plane count — the 100 TB form;
    fixed planes make candidates grow n^2/2^planes) recovers the same
    clusters as the exact baseline."""
    from kafka_streams_plumber_spark.operators.dedup import semantic_dedup

    rows = [
        (0, BASE),
        (1, BASE.replace("lazy", "sleepy")),
        (2, OTHER),
        (3, OTHER.replace("spark", "flink")),
        (4, "tiny unrelated doc about cooking pasta with garlic and olive oil"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = semantic_dedup(docs, "text", "doc_id", threshold=0.8)
    auto = semantic_dedup(
        docs, "text", "doc_id", threshold=0.8, exact=False,
        n_tables=8, target_bucket_size=2,
    )
    e = sorted(map(tuple, exact.select("doc_id", "cluster_id", "keep").collect()))
    a = sorted(map(tuple, auto.select("doc_id", "cluster_id", "keep").collect()))
    assert e == a


def test_semantic_decontaminate_catches_paraphrase(spark):
    """A reworded benchmark doc breaks every 8-gram (n-gram rule blind)
    but keeps cosine high — the embedding rule flags it."""
    from kafka_streams_plumber_spark.operators.dedup import (
        decontaminate,
        semantic_decontaminate,
    )

    words = BASE.split(" ")
    # substitute every 6th word: no 8-gram survives, most mass shared
    reword = " ".join(
        w if i % 6 else f"sub{i}" for i, w in enumerate(words)
    )
    corpus = spark.createDataFrame(
        [(1, reword), (2, OTHER)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(BASE,)], "text string")

    ngram = {r["doc_id"]: r["contaminated"]
             for r in decontaminate(corpus, bench, k=8).collect()}
    assert ngram == {1: False, 2: False}

    sem = {r["doc_id"]: r for r in
           semantic_decontaminate(corpus, bench, threshold=0.7).collect()}
    assert sem[1]["contaminated"] and sem[1]["n_hits"] == 1
    assert sem[1]["max_cos"] >= 0.7
    assert not sem[2]["contaminated"] and sem[2]["max_cos"] is None


def test_split_leakage_flags_cross_split_near_dups_only(spark):
    """Three near-identical docs: two in train, one in test, plus an
    unrelated val doc and a NULL-split near-dup. Only the (test,
    train) pair surfaces — train-train dups and NULL-split rows are
    not leakage."""
    from kafka_streams_plumber_spark.operators.dedup import split_leakage

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "train"),
        (2, base + " extra", "train"),
        (3, base, "test"),
        (4, "completely different text about spark plans and shuffles", "val"),
        (5, base, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    got = sorted(
        (r["held_id"], r["held_split"], r["train_id"])
        for r in split_leakage(
            df, "text", "doc_id", "split", threshold=0.5
        ).collect()
    )
    # doc 3 leaks from BOTH train docs; nothing else crosses
    assert got == [(3, "test", 1), (3, "test", 2)]
