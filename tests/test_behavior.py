"""Funnel / cohort / gap-fill (operators/behavior.py), triangle counts
(operators/graph.py), set-similarity join (operators/setsim.py), PMI
collocations (operators/collocate.py), RRF fusion (operators/retrieval.py).

Hand-computable micro-fixtures; the sf0.01 oracle equivalence is covered
by the queries.py contracts (q_funnel, q_cohort, q_gapfill, q_setsim,
q_triangles, q_pmi, q_rrf).
"""

from __future__ import annotations

import datetime as dt
import itertools

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.behavior import (
    cohort_retention,
    funnel,
    gap_fill,
)
from kafka_streams_plumber_spark.operators.collocate import pmi_bigrams
from kafka_streams_plumber_spark.operators.graph import triangle_counts
from kafka_streams_plumber_spark.operators.retrieval import (
    overlap_topk,
    rrf_fuse,
)
from kafka_streams_plumber_spark.operators.setsim import jaccard_prefix_join


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def test_funnel_strict_order(spark):
    rows = [
        # user 1 completes all 3 steps in order
        (1, "a", _ts(1)), (1, "b", _ts(2)), (1, "c", _ts(3)),
        # user 2 has b BEFORE a -> stops at stage 1
        (2, "b", _ts(1)), (2, "a", _ts(2)),
        # user 3 never signs up -> counted nowhere
        (3, "b", _ts(1)), (3, "c", _ts(2)),
        # user 4: a then c (skips b) -> stage 1 only
        (4, "a", _ts(1)), (4, "c", _ts(2)),
    ]
    out = funnel(_events(spark, rows), ["a", "b", "c"])
    got = {r["stage"]: (r["step"], r["users"]) for r in out.collect()}
    assert got == {1: ("a", 3), 2: ("b", 1), 3: ("c", 1)}


def test_funnel_same_timestamp_counts(spark):
    rows = [(1, "a", _ts(1)), (1, "b", _ts(1))]
    out = funnel(_events(spark, rows), ["a", "b"])
    got = {r["stage"]: r["users"] for r in out.collect()}
    assert got == {1: 1, 2: 1}


def test_cohort_offsets(spark):
    # user 1 first active week of Jan 1 (Mon), again 2 weeks later;
    # user 2 joins week of Jan 8, active that week only
    rows = [
        (1, "x", _ts(2)),   # week of Jan 1
        (1, "x", _ts(16)),  # week of Jan 15 -> offset 2
        (2, "x", _ts(9)),   # week of Jan 8
        (2, "x", _ts(10)),  # same week -> still offset 0, distinct once
    ]
    out = cohort_retention(_events(spark, rows), granularity="week")
    got = {(r["cohort_ms"], r["offset"]): r["users"] for r in out.collect()}
    w1 = int(dt.datetime(2024, 1, 1).timestamp() * 1000)
    w2 = int(dt.datetime(2024, 1, 8).timestamp() * 1000)
    assert got == {(w1, 0): 1, (w1, 2): 1, (w2, 0): 1}


def test_gap_fill_forward_fills(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(1, 0), 10.0),
            (1, _ts(1, 0, 30), 5.0),  # same hour bucket -> summed
            (1, _ts(1, 3), 7.0),      # gap of 2 empty buckets
        ],
        "key long, ts timestamp, v double",
    )
    out = gap_fill(
        df, key_col="key", ts_col="ts", value_col="v", step_s=3600
    ).orderBy("bucket_ms")
    rows = out.collect()
    assert [r["value"] for r in rows] == [15.0, 15.0, 15.0, 7.0]
    assert [r["filled"] for r in rows] == [False, True, True, False]
    assert rows[1]["bucket_ms"] - rows[0]["bucket_ms"] == 3600_000


def test_gap_fill_max_buckets_caps_runaway_key(spark):
    df = spark.createDataFrame(
        [(1, _ts(1), 1.0), (1, _ts(30), 2.0)],
        "key long, ts timestamp, v double",
    )
    out = gap_fill(
        df, key_col="key", ts_col="ts", value_col="v", step_s=3600,
        max_buckets=10,
    )
    rows = out.orderBy("bucket_ms").collect()
    # the 10-bucket retained window starts inside the gap; the 9 leading
    # buckets have no retained observation to fill from -> dropped (the
    # contract is "every emitted filled row carries a value"), leaving
    # only the observed tail bucket
    assert len(rows) == 1
    assert rows[-1]["value"] == 2.0 and not rows[-1]["filled"]


def test_triangle_counts_two_triangles_sharing_edge(spark):
    # triangles (1,2,3) and (2,3,4) share edge 2-3; edge list is noisy:
    # duplicates, reversed orientation, a self-loop, a dangling edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 4), (4, 3), (3, 2), (5, 5), (4, 9),
         (1, 2)],
        "a_id long, b_id long",
    )
    got = {r["node"]: r["triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_jaccard_prefix_join_matches_bruteforce(spark):
    docs = [
        (1, "red green blue yellow"),
        (2, "red green blue purple"),
        (3, "red green blue yellow"),
        (4, "cat dog"),
        (5, "cat dog bird"),
        (6, "zebra"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    t = 0.5
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["jaccard"])
        for r in jaccard_prefix_join(df, threshold=t).collect()
    }
    sets = {i: set(s.split()) for i, s in docs}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= t:
            want[(a, b)] = (inter, round(inter / union, 6))
    assert got == want


def test_pmi_prefers_fixed_phrase(spark):
    # "new york" always adjacent; "the" pairs with everything
    rows = [("new york is big the end",), ("the new york story the it",),
            ("new york new york the a",)] * 3
    df = spark.createDataFrame(rows, "text string")
    out = pmi_bigrams(df, min_count=3)
    got = {(r["w1"], r["w2"]): r for r in out.collect()}
    assert ("new", "york") in got
    ny = got[("new", "york")]
    assert ny["pairs"] == 12
    # the deterministic collocation beats "the new": both components are
    # common, but they co-occur only by sentence structure
    assert ("the", "new") in got
    assert ny["pmi"] > got[("the", "new")]["pmi"]


def test_rrf_fusion_prefers_doc_ranked_by_both(spark):
    r1 = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id long, doc_id long, rank long"
    )
    r2 = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id long, doc_id long, rank long"
    )
    out = rrf_fuse([r1, r2], k_rrf=60, k=10).collect()
    by_rank = sorted(out, key=lambda r: r["rank"])
    # doc 11 appears in both lists -> wins; doc 10 (rank 1 in one list) next
    assert by_rank[0]["doc_id"] == 11
    assert by_rank[1]["doc_id"] == 10
    assert abs(by_rank[0]["rrf"] - round(1 / 62 + 1 / 61, 6)) < 1e-9


def test_overlap_topk_counts_distinct_terms(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a a a b"), (3, "x y")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(1, "a b q")], "query_id long, query_text string")
    got = {r["doc_id"]: (r["overlap"], r["rank"]) for r in overlap_topk(docs, qs).collect()}
    # repeated 'a' in doc 2 counts once; ties broken by doc_id
    assert got == {1: (2, 1), 2: (2, 2)}


def test_rolling_zscore_flags_spike(spark):
    from kafka_streams_plumber_spark.operators.behavior import rolling_zscore

    rows = [(1, _ts(1, h), 10.0 + (h % 2)) for h in range(10)]
    rows.append((1, _ts(1, 10), 100.0))  # spike after a stable run
    df = spark.createDataFrame(rows, "key long, ts timestamp, v double")
    out = rolling_zscore(
        df, key_col="key", ts_col="ts", value_col="v", window=5
    ).orderBy("ts_ms").collect()
    # first row: no predecessors -> NULL; second: n=1 -> NULL
    assert out[0]["z"] is None and out[1]["z"] is None
    # the spike's z-score dwarfs every stable row's
    stable = [abs(r["z"]) for r in out[2:-1]]
    assert abs(out[-1]["z"]) > 10 * max(stable)


def test_rolling_zscore_excludes_current_row(spark):
    from kafka_streams_plumber_spark.operators.behavior import rolling_zscore

    # constant history, then a jump: if the row were included in its own
    # window the variance would absorb the jump and shrink z
    rows = [(1, _ts(1, h), 5.0) for h in range(5)] + [(1, _ts(1, 6), 9.0)]
    df = spark.createDataFrame(rows, "key long, ts timestamp, v double")
    out = rolling_zscore(
        df, key_col="key", ts_col="ts", value_col="v", window=5
    ).orderBy("ts_ms").collect()
    # history is constant -> zero variance -> z pinned to NULL on every
    # engine (the "flatline broke" signal), never Inf/NaN
    assert out[-1]["z"] is None


def test_event_transitions_probabilities(spark):
    from kafka_streams_plumber_spark.operators.behavior import event_transitions

    rows = [
        (1, "a", _ts(1)), (1, "b", _ts(2)), (1, "a", _ts(3)), (1, "c", _ts(4)),
        (2, "a", _ts(1)), (2, "b", _ts(2)),
    ]
    out = event_transitions(_events(spark, rows)).collect()
    got = {(r["from_type"], r["to_type"]): (r["pairs"], r["prob"]) for r in out}
    # from 'a': ->b twice, ->c once; user boundary breaks (1,'c')->(2,'a')
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    assert got[("a", "c")] == (1, round(1 / 3, 6))
    assert got[("b", "a")] == (1, 1.0)
    assert ("c", "a") not in got


def test_source_overlap_matrix_counts_cross_source_pairs(spark):
    from kafka_streams_plumber_spark.operators.setsim import source_overlap_matrix

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "web"),
            (2, "a b c d", "books"),   # dup of 1 across sources
            (3, "a b c e", "web"),     # near-dup of 1 within web
            (4, "x y z w", "books"),   # unique
        ],
        "doc_id long, text string, source string",
    )
    out = source_overlap_matrix(docs, threshold=0.6)
    got = {
        (r["source_a"], r["source_b"]): (r["dup_pairs"], r["docs_a"], r["docs_b"])
        for r in out.collect()
    }
    # pairs: (1,2) web-books J=1.0; (1,3) web-web J=3/5=0.6; (2,3) books-web 0.6
    # books side of the cross rows is doc 2 alone; web side is docs 1 and 3
    assert got[("books", "web")] == (2, 1, 2)
    assert got[("web", "web")] == (1, 1, 1)


def test_containment_join_finds_quote_inclusion_bruteforce(spark):
    from kafka_streams_plumber_spark.operators.setsim import containment_join

    quote = "the quick brown fox jumps over the lazy dog"
    docs = [
        (1, quote),
        # doc 1 quoted whole inside a much longer doc: C(1->2)=1.0 while
        # Jaccard is small — the pair the symmetric passes never flag
        (2, "intro words here " + quote + " and a long tail of extra "
            "commentary that dilutes the jaccard far below threshold"),
        (3, "completely different content about other things entirely"),
        (4, quote),  # exact dup of 1: containment 1.0 both directions
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    t = 0.8
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["containment"])
        for r in containment_join(df, threshold=t).collect()
    }

    def sh(s, k=3):
        w = s.lower().split(" ")
        return (
            {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}
            if len(w) >= k
            else {" ".join(w)}
        )

    sets = {i: sh(s) for i, s in docs}
    want = {}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            c = inter / len(sets[a])
            if c >= t:
                want[(a, b)] = (inter, round(c, 6))
    assert got == want
    assert (1, 2) in got and got[(1, 2)][1] == 1.0  # the quote inclusion
    assert (2, 1) not in got  # asymmetric: the long doc is not contained
    assert (1, 4) in got and (4, 1) in got  # exact dup, both directions


def test_containment_positional_filter_never_drops_true_pairs(spark):
    """r12 pin for the PPJoin positional candidate filter: on a seeded
    random corpus with heavy shingle sharing, the filtered candidate
    path must return EXACTLY the brute-force containment pairs at
    several thresholds (the filter may only drop false candidates —
    a true pair's minimal common token is in a's prefix and bounds the
    overlap validly, see _containment_candidates)."""
    import random

    from kafka_streams_plumber_spark.operators.setsim import containment_join

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(24):
        n = rng.randint(3, 14)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant guaranteed containments: doc quoted inside a longer doc
    docs.append((100, docs[0][1]))
    docs.append((101, docs[1][1] + " " + docs[0][1] + " tail words here"))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def sh(s, k=3):
        w = s.lower().split(" ")
        return (
            {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}
            if len(w) >= k
            else {" ".join(w)}
        )

    sets = {i: sh(s) for i, s in docs}
    for t in (0.5, 0.8, 1.0):
        got = {
            (r["doc_a"], r["doc_b"]): (r["inter"], r["containment"])
            for r in containment_join(df, threshold=t).collect()
        }
        want = {}
        for a in sets:
            for b in sets:
                if a == b:
                    continue
                inter = len(sets[a] & sets[b])
                c = inter / len(sets[a])
                if c >= t:
                    want[(a, b)] = (inter, round(c, 6))
        assert got == want, f"threshold {t}"


def test_containment_join_respects_block_col(spark):
    from kafka_streams_plumber_spark.operators.setsim import containment_join

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f", "web"),
            (2, "a b c d e f", "books"),  # identical but different block
            (3, "a b c d e f", "web"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in containment_join(
            docs, threshold=0.9, block_col="source"
        ).collect()
    }
    assert got == {(1, 3), (3, 1)}


def test_pmi_null_text_does_not_skew_totals(spark):
    # size(NULL) is -1 under non-ANSI Spark; the shared tokenizer must
    # map NULL text to an EMPTY array so token totals match the oracle
    rows = [("a b a b",), (None,), ("a b",)]
    df = spark.createDataFrame(rows, "text string")
    out = {(r["w1"], r["w2"]): r["pmi"] for r in pmi_bigrams(df, min_count=2).collect()}
    # T1=6 tokens, T2=4 bigrams, c(a)=c(b)=3, pairs(a,b)=3
    # pmi = ln(3 * 36 / (4 * 9)) = ln(3)
    import math
    assert out[("a", "b")] == round(math.log(3.0), 6)


def test_gap_fill_custom_agg_uses_caller_column_name(spark):
    df = spark.createDataFrame(
        [(1, _ts(1, 0), 10.0), (1, _ts(1, 0, 30), 20.0)],
        "key long, ts timestamp, reading double",
    )
    out = gap_fill(
        df, key_col="key", ts_col="ts", value_col="reading", step_s=3600,
        agg=F.avg("reading"),
    ).collect()
    assert len(out) == 1 and out[0]["value"] == 15.0


def test_funnel_conversion_window(spark):
    rows = [
        # user 1: b follows a within 1 h -> converts
        (1, "a", _ts(1, 0)), (1, "b", _ts(1, 0, 30)),
        # user 2: b follows a but 5 h later -> window blocks stage 2
        (2, "a", _ts(1, 0)), (2, "b", _ts(1, 5)),
        # user 3: first b too late, second b in window -> converts
        (3, "a", _ts(1, 0)), (3, "b", _ts(1, 5)), (3, "b", _ts(1, 0, 45)),
    ]
    out = funnel(
        _events(spark, rows), ["a", "b"], within_ms=3600 * 1000
    )
    got = {r["stage"]: r["users"] for r in out.collect()}
    assert got == {1: 3, 2: 2}


def test_funnel_window_counts_retry_of_earlier_step(spark):
    # the round-2 judge counterexample: greedy earliest-occurrence
    # anchoring starts the conversion window at a@00:00 and misses b,
    # but the chain a@01:40 -> b@01:45 converts within 10 minutes
    rows = [
        (1, "a", _ts(1, 0, 0)),
        (1, "a", _ts(1, 1, 40)),
        (1, "b", _ts(1, 1, 45)),
    ]
    out = funnel(_events(spark, rows), ["a", "b"], within_ms=600_000)
    got = {r["stage"]: r["users"] for r in out.collect()}
    assert got == {1: 1, 2: 1}


def test_funnel_window_mid_funnel_retry(spark):
    # advisor case: a@0, b@0:30, b@0:50, c@1:40 with a 1 h per-step
    # window — only the chain through the SECOND b reaches c
    rows = [
        (1, "a", _ts(1, 0, 0)),
        (1, "b", _ts(1, 0, 30)),
        (1, "b", _ts(1, 0, 50)),
        (1, "c", _ts(1, 1, 40)),
    ]
    out = funnel(
        _events(spark, rows), ["a", "b", "c"], within_ms=3_600_000
    )
    got = {r["stage"]: r["users"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_funnel_unreached_stage_emits_zero_row(spark):
    rows = [(1, "a", _ts(1))]
    out = funnel(_events(spark, rows), ["a", "b", "c"], within_ms=1000)
    got = {r["stage"]: (r["step"], r["users"]) for r in out.collect()}
    assert got == {1: ("a", 1), 2: ("b", 0), 3: ("c", 0)}


def test_funnel_whole_window_anchors_at_latest_chain_start(spark):
    # user 1: only the chain anchored at the SECOND a finishes within
    # the 1 h whole-funnel window (a@2:00 -> b@2:10 -> c@2:50);
    # user 2's single chain spans 90 min -> blocked at stage 3
    rows = [
        (1, "a", _ts(1, 0, 0)),
        (1, "a", _ts(1, 2, 0)),
        (1, "b", _ts(1, 2, 10)),
        (1, "c", _ts(1, 2, 50)),
        (2, "a", _ts(1, 0, 0)),
        (2, "b", _ts(1, 0, 40)),
        (2, "c", _ts(1, 1, 30)),
    ]
    out = funnel(
        _events(spark, rows), ["a", "b", "c"], whole_within_ms=3_600_000
    )
    got = {r["stage"]: r["users"] for r in out.collect()}
    assert got == {1: 2, 2: 2, 3: 1}


def test_funnel_combined_per_step_and_whole_windows(spark):
    # per-step window admits each hop (30 min each) but the whole-funnel
    # window (45 min) blocks the final stage
    rows = [
        (1, "a", _ts(1, 0, 0)),
        (1, "b", _ts(1, 0, 30)),
        (1, "c", _ts(1, 1, 0)),
    ]
    out = funnel(
        _events(spark, rows),
        ["a", "b", "c"],
        within_ms=1_800_000,
        whole_within_ms=2_700_000,
    )
    got = {r["stage"]: r["users"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 0}


def test_gap_fill_truncation_drops_leading_unfillable_rows(spark):
    # truncation point lands inside the observation gap: buckets 21-25
    # are in the retained window but precede the first retained
    # observation (bucket 26) -> dropped, never emitted value=NULL
    df = spark.createDataFrame(
        [(1, _ts(1, 0), 1.0), (1, _ts(2, 2), 2.0), (1, _ts(2, 5), 3.0)],
        "key long, ts timestamp, v double",
    )
    out = gap_fill(
        df, key_col="key", ts_col="ts", value_col="v", step_s=3600,
        max_buckets=9,
    )
    rows = out.orderBy("bucket_ms").collect()
    assert len(rows) == 4  # buckets 26..29, not the 9-bucket spine
    assert all(r["value"] is not None for r in rows)
    assert [r["filled"] for r in rows] == [False, True, True, False]


def test_rolling_zscore_null_values_do_not_inflate_count(spark):
    from kafka_streams_plumber_spark.operators.behavior import rolling_zscore

    # two real observations then a NULL; the 4th row's history must be
    # n=2 over {5, 7} (mean 6, var 2), not n=3 with a biased mean
    rows = [
        (1, _ts(1, 0), 5.0),
        (1, _ts(1, 1), 7.0),
        (1, _ts(1, 2), None),
        (1, _ts(1, 3), 8.0),
    ]
    df = spark.createDataFrame(rows, "key long, ts timestamp, v double")
    out = rolling_zscore(
        df, key_col="key", ts_col="ts", value_col="v", window=5
    ).orderBy("ts_ms").collect()
    import math

    assert out[3]["z"] == round((8.0 - 6.0) / math.sqrt(2.0), 6)


def test_ewma_hand_computed(spark):
    """Windowed EWMA equals the literal weighted average of the last W
    observations; the first row is its own average."""
    from kafka_streams_plumber_spark.operators.behavior import ewma

    rows = [("u", i, float(v)) for i, v in enumerate([10, 20, 40])]
    df = spark.createDataFrame(rows, "k string, seq long, value double")
    out = {r["seq"]: r["ewma"] for r in
           ewma(df, "k", ["seq"], "value", alpha=0.5, window=4).collect()}
    assert out[0] == 10.0
    assert out[1] == round((20 + 0.5 * 10) / 1.5, 6)
    assert out[2] == round((40 + 0.5 * 20 + 0.25 * 10) / 1.75, 6)


def test_ewma_window_truncates_and_nulls_skipped(spark):
    from kafka_streams_plumber_spark.operators.behavior import ewma

    rows = [("u", 0, 100.0), ("u", 1, None), ("u", 2, 7.0)]
    df = spark.createDataFrame(rows, "k string, seq long, value double")
    out = {r["seq"]: r["ewma"] for r in
           ewma(df, "k", ["seq"], "value", alpha=0.5, window=2).collect()}
    # seq2's window = {seq1 (NULL, skipped), seq2} -> just 7.0
    assert out[2] == 7.0
    assert out[1] == round((0.5 * 100) / 0.5, 6)  # only the lagged obs
    assert out[0] == 100.0


def test_ewma_keys_independent(spark):
    from kafka_streams_plumber_spark.operators.behavior import ewma

    rows = [("a", 0, 1.0), ("b", 0, 9.0), ("a", 1, 3.0)]
    df = spark.createDataFrame(rows, "k string, seq long, value double")
    out = {(r["k"], r["seq"]): r["ewma"] for r in
           ewma(df, "k", ["seq"], "value", alpha=0.5, window=8).collect()}
    assert out[("b", 0)] == 9.0
    assert out[("a", 1)] == round((3 + 0.5 * 1) / 1.5, 6)


def test_rfm_hand_computed(spark):
    """Quintile boundaries, tie-breaks, exact cent sums, and the
    composed code on a small fixture."""
    from datetime import datetime

    from kafka_streams_plumber_spark.operators.behavior import rfm

    def ts(d):
        return datetime(2024, 1, d)

    # 5 users, strictly increasing recency/frequency/monetary by id
    rows = []
    for i in range(1, 6):
        for j in range(i):  # frequency = i
            rows.append((i, ts(i), 10.0 * i))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r["user"]: r for r in
           rfm(df, "user_id", "ts", "value", buckets=5).collect()}
    for i in range(1, 6):
        r = out[i]
        # rank i-1 of 5 -> score i in every dimension
        assert (r["r_score"], r["f_score"], r["m_score"]) == (i, i, i)
        assert r["rfm"] == i * 111
        assert r["frequency"] == i
        assert r["monetary"] == 10.0 * i * i


def test_active_user_metrics_hand_computed(spark):
    """DAU/WAU on a tiny three-day fixture, including a returning user
    counted once per window and a ghost-day exclusion."""
    from datetime import datetime

    from kafka_streams_plumber_spark.operators.behavior import (
        active_user_metrics,
    )

    def ev(u, d, h=0):
        return (u, datetime(2024, 1, d, h))

    rows = [
        ev(1, 1), ev(1, 1, 5), ev(2, 1),   # day0: users {1,2}
        ev(1, 2),                          # day1: {1}
        # day3 skipped entirely (ghost day within windows)
        ev(3, 4),                          # day3(idx): {3}
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["day"]: r for r in
           active_user_metrics(df, "user_id", "ts", window_days=3).collect()}
    days = sorted(out)
    d0, d1, d3 = days
    assert d1 == d0 + 1 and d3 == d0 + 3
    assert (out[d0]["dau"], out[d0]["wau"]) == (2, 2)
    assert (out[d1]["dau"], out[d1]["wau"]) == (1, 2)  # window {d-2..d1}
    # day3's trailing-3 window = {d1..d3}: users {1 (d1), 3} -> wau 2
    assert (out[d3]["dau"], out[d3]["wau"]) == (1, 2)
    assert out[d1]["stickiness"] == 0.5
    # the skipped day emits no row
    assert d0 + 2 not in out


def test_association_rules_hand_computed(spark):
    from kafka_streams_plumber_spark.operators.behavior import (
        association_rules,
    )

    # baskets: u1={x,y}, u2={x,y}, u3={x}, u4={y,z} -> N=4 keys
    events = spark.createDataFrame(
        [
            (1, "x"), (1, "y"), (1, "x"),  # duplicate event collapses
            (2, "x"), (2, "y"),
            (3, "x"),
            (4, "y"), (4, "z"),
        ],
        "user_id long, event_type string",
    )
    got = {
        (r["antecedent"], r["consequent"]): (
            r["n_both"], r["n_ante"], r["n_cons"],
            r["support"], r["confidence"], r["lift"],
        )
        for r in association_rules(events).collect()
    }
    # x->y: both=2, n(x)=3, n(y)=3; conf=2/3, lift=(2/3)/(3/4)=8/9
    assert got[("x", "y")] == (2, 3, 3, 0.5, round(2 / 3, 6), round(8 / 9, 6))
    # y->x symmetric counts, same lift
    assert got[("y", "x")] == (2, 3, 3, 0.5, round(2 / 3, 6), round(8 / 9, 6))
    # z->y: both=1, n(z)=1, conf=1.0, lift=1/(3/4)=4/3
    assert got[("z", "y")] == (1, 1, 3, 0.25, 1.0, round(4 / 3, 6))
    assert ("x", "z") not in got  # never co-occur

    # min_pair_count prunes singleton pairs
    pruned = {
        (r["antecedent"], r["consequent"])
        for r in association_rules(events, min_pair_count=2).collect()
    }
    assert pruned == {("x", "y"), ("y", "x")}


def test_adamic_adar_hand_computed(spark):
    import math

    from kafka_streams_plumber_spark.operators.graph import adamic_adar

    # path 1-2-3 plus hub 4 connected to 1,2,3; edge list noisy
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 1), (4, 2), (4, 3), (2, 1), (5, 5)],
        "a_id long, b_id long",
    )
    got = {
        (r["node_a"], r["node_b"]): (r["common_neighbors"], r["adamic_adar"])
        for r in adamic_adar(edges).collect()
    }
    # non-adjacent pairs: only (1,3) — common neighbors 2 (deg 3) and 4
    # (deg 3): score = 2 / ln(3)
    assert set(got) == {(1, 3)}
    cn, aa = got[(1, 3)]
    assert cn == 2
    assert abs(aa - round(2 * round(1 / math.log(3), 9), 6)) < 1e-6


def test_adamic_adar_hub_cap_drops_center(spark):
    from kafka_streams_plumber_spark.operators.graph import adamic_adar

    # star: hub 0 connected to 1..5; only the hub is a common neighbor
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "a_id long, b_id long"
    )
    full = adamic_adar(edges).collect()
    assert len(full) == 10  # C(5,2) leaf pairs via the hub
    capped = adamic_adar(edges, max_degree=3).collect()
    assert capped == []  # hub center dropped -> no wedges survive


def test_forecast_baseline_error_hand_computed(spark):
    from kafka_streams_plumber_spark.operators.behavior import (
        forecast_baseline_error,
    )

    # perfectly seasonal series, period 2 buckets: 10, 20, 10, 20 ...
    rows = [(1, _ts(1, h), 10.0 if h % 2 == 0 else 20.0) for h in range(8)]
    df = spark.createDataFrame(rows, "key long, ts timestamp, v double")
    r = forecast_baseline_error(
        df, "key", "ts", "v", season=2, step_s=3600
    ).collect()[0]
    # seasonal forecast is exact -> mae_seasonal = 0, mase = 0;
    # naive always misses by 10
    assert r["n_buckets"] == 8 and r["n_naive"] == 7 and r["n_seasonal"] == 6
    assert r["mae_naive"] == 10.0 and r["mae_seasonal"] == 0.0
    assert r["mase"] == 0.0


def test_forecast_baseline_error_gap_never_shifts(spark):
    from kafka_streams_plumber_spark.operators.behavior import (
        forecast_baseline_error,
    )

    # bucket 2 missing: bucket 3's naive baseline (bucket 2) must be
    # ABSENT, not silently replaced by bucket 1
    rows = [
        (1, _ts(1, 0), 1.0),
        (1, _ts(1, 1), 2.0),
        (1, _ts(1, 3), 8.0),
    ]
    df = spark.createDataFrame(rows, "key long, ts timestamp, v double")
    r = forecast_baseline_error(
        df, "key", "ts", "v", season=24, step_s=3600
    ).collect()[0]
    assert r["n_buckets"] == 3
    assert r["n_naive"] == 1  # only bucket 1 has a true predecessor
    assert r["mae_naive"] == 1.0  # |2-1|
    assert r["n_seasonal"] == 0 and r["mase"] is None


def test_forecast_baseline_error_broken_seasonality_flags_high_mase(spark):
    from kafka_streams_plumber_spark.operators.behavior import (
        forecast_baseline_error,
    )

    # smooth ramp: naive is great, "seasonal" (period 3) is bad -> mase > 1
    rows = [(1, _ts(1, h), float(h)) for h in range(9)]
    df = spark.createDataFrame(rows, "key long, ts timestamp, v double")
    r = forecast_baseline_error(
        df, "key", "ts", "v", season=3, step_s=3600
    ).collect()[0]
    assert r["mae_naive"] == 1.0 and r["mae_seasonal"] == 3.0
    assert r["mase"] == 3.0


def test_cusum_matches_sequential_recurrence(spark):
    """Distributed prefix closed form == the textbook sequential
    S_i = max(0, S_{i-1} + x - k), including reset-to-zero stretches
    and the alarm decision."""
    from kafka_streams_plumber_spark.operators.behavior import cusum

    xs = [5.0, 5.0, 9.0, 2.0, 1.0, 8.0, 9.5, 9.0, 3.0]
    target = 5.0
    s, want = 0.0, []
    for x in xs:
        s = max(0.0, s + x - target)
        want.append(round(s, 6))
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t long, v double"
    ).repartition(4)
    got = [
        (r["cusum"], r["alarm"])
        for r in cusum(df, ["t"], "v", target=target, threshold=6.0)
        .orderBy("t")
        .collect()
    ]
    assert [g[0] for g in got] == want
    assert [g[1] for g in got] == [w > 6.0 for w in want]


def test_cusum_slack_suppresses_small_drift(spark):
    from kafka_streams_plumber_spark.operators.behavior import cusum

    # constant +0.4 drift over target: slack 0.5 keeps S at 0
    df = spark.createDataFrame(
        [(i, 10.4) for i in range(20)], "t long, v double"
    )
    out = cusum(df, ["t"], "v", target=10.0, slack=0.5).collect()
    assert all(r["cusum"] == 0.0 for r in out)


def test_seasonal_decompose_flags_out_of_phase_spike(spark):
    """Alternating 10/20 series with one 100 spike: phase medians stay
    10/20 (robust), the deseasonalized series is zero except the
    spike, MAD is 0, so ONLY the spike flags (zero-MAD limit: any
    nonzero residual anomalous, robust_z NULL)."""
    from kafka_streams_plumber_spark.operators.behavior import (
        seasonal_decompose,
    )

    vals = [10.0, 20.0] * 5
    vals[6] = 100.0
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "idx long, v double"
    )
    out = {
        r["idx"]: r
        for r in seasonal_decompose(df, "idx", "v", period=2).collect()
    }
    assert out[0]["seasonal"] == 10.0 and out[1]["seasonal"] == 20.0
    assert out[6]["residual"] == 90.0 and out[6]["anomaly"]
    for i in set(range(10)) - {6}:
        assert out[i]["residual"] == 0.0 and not out[i]["anomaly"]
        assert out[i]["robust_z"] is None  # zero MAD


def test_seasonal_decompose_robust_z_hand_computed(spark):
    """Noisy two-phase series: medians 12/22, residuals +-2/0, MAD=2,
    z = r / (1.4826 * 2); nothing crosses the 3.5-sigma bar."""
    from kafka_streams_plumber_spark.operators.behavior import (
        seasonal_decompose,
    )

    vals = [10.0, 20.0, 12.0, 22.0, 14.0, 24.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "idx long, v double"
    )
    out = {
        r["idx"]: r
        for r in seasonal_decompose(df, "idx", "v", period=2).collect()
    }
    assert out[0]["seasonal"] == 12.0 and out[1]["seasonal"] == 22.0
    assert out[0]["level"] == 0.0
    for i, exp_r in [(0, -2.0), (2, 0.0), (4, 2.0)]:
        assert out[i]["residual"] == exp_r
        assert out[i]["robust_z"] == round(exp_r / (1.4826 * 2.0), 6)
        assert not out[i]["anomaly"]


def test_page_hinkley_matches_sequential_reference(spark):
    """PH equals the sequential textbook recurrence (running mean,
    U_t = sum(x_s - mean_s - delta), PH = U - prefix-min U) computed
    in pure Python with the same scaled-long quantization."""
    from kafka_streams_plumber_spark.operators.behavior import page_hinkley

    vals = [10.0, 10.5, 9.8, 10.2, 30.0, 31.0, 29.5, 30.5]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t long, v double"
    ).repartition(3)
    got = {
        r["t"]: (r["ph"], r["alarm"])
        for r in page_hinkley(
            df, ["t"], "v", delta=0.0, threshold=5.0
        ).collect()
    }
    # sequential reference with the identical quantization
    S = 10**6
    P, U, M = 0, 0, None
    for i, v in enumerate(vals):
        xs = round(v * S)
        P += xs
        term = round(xs - P / (i + 1) - 0.0)
        U += term
        M = U if M is None else min(M, U)
        ph = round((U - M) / S, 6)
        assert got[i] == (ph, (U - M) > 5 * S), (i, got[i], ph)
    # the level shift at t=4 must alarm by the end
    assert got[7][1] is True
    # stable series never alarms
    flat = spark.createDataFrame(
        [(i, 10.0) for i in range(10)], "t long, v double"
    )
    out = page_hinkley(flat, ["t"], "v", threshold=1.0).collect()
    assert all(not r["alarm"] for r in out)


def test_seasonal_decompose_grouped_isolated(spark):
    """group_cols: each group gets its own seasonal/level/MAD — a
    spike in group a never flags (or shifts baselines in) group b."""
    from kafka_streams_plumber_spark.operators.behavior import (
        seasonal_decompose,
    )

    rows = [("a", i, [10.0, 20.0][i % 2]) for i in range(10)] + [
        ("b", i, 5.0) for i in range(10)
    ]
    rows[6] = ("a", 6, 100.0)  # phase-0 spike in group a only
    df = spark.createDataFrame(rows, "g string, idx long, v double")
    out = {
        (r["g"], r["idx"]): r
        for r in seasonal_decompose(
            df, "idx", "v", period=2, group_cols=["g"]
        ).collect()
    }
    assert out[("a", 6)]["anomaly"] and out[("a", 6)]["residual"] == 90.0
    for i in range(10):
        assert out[("b", i)]["residual"] == 0.0
        assert not out[("b", i)]["anomaly"]
        assert out[("b", i)]["seasonal"] == 5.0


def test_trend_break_hand_computed(spark):
    """Flat 10s then a line 20 + 2*(x - 5): pre slope 0, post slope 2,
    and the level gap at the breakpoint equals the fitted difference.
    Explicit and median-default breakpoints agree on this series."""
    from kafka_streams_plumber_spark.operators.behavior import trend_break

    rows = [(x, 10.0) for x in range(5)] + [
        (x, 20.0 + 2.0 * (x - 5)) for x in range(5, 10)
    ]
    df = spark.createDataFrame(rows, "x long, v double")
    r = trend_break(df, "x", "v", breakpoint=5).collect()[0]
    assert (r["n_pre"], r["n_post"], r["breakpoint"]) == (5, 5, 5)
    assert r["slope_pre"] == 0.0 and r["slope_post"] == 2.0
    assert r["slope_delta"] == 2.0
    # fitted pre at x=5 is 10; fitted post at x=5 is 20
    assert r["level_delta"] == 10.0

    # median default: median x of 0..9 = 4.5, floor -> 4
    m = trend_break(df, "x", "v").collect()[0]
    assert m["breakpoint"] == 4 and m["n_pre"] == 4

    # single-point segment: NULL fit, counts intact
    tiny = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0)], "x long, v double"
    )
    t = trend_break(tiny, "x", "v", breakpoint=2).collect()[0]
    assert t["n_post"] == 1 and t["slope_post"] is None
    assert t["slope_pre"] == 1.0 and t["slope_delta"] is None

    # EMPTY segment still yields the contract's one row, with the
    # surviving segment's fit intact: breakpoint beyond the index
    # range leaves post empty ...
    e = trend_break(tiny, "x", "v", breakpoint=99).collect()
    assert len(e) == 1
    assert (e[0]["n_pre"], e[0]["n_post"]) == (3, 0)
    assert e[0]["slope_pre"] == 1.0 and e[0]["slope_post"] is None
    assert e[0]["level_delta"] is None
    # ... and below it leaves pre empty
    e2 = trend_break(tiny, "x", "v", breakpoint=0).collect()
    assert len(e2) == 1
    assert (e2[0]["n_pre"], e2[0]["n_post"]) == (0, 3)
    assert e2[0]["slope_post"] == 1.0 and e2[0]["slope_pre"] is None
    # constant index with the median default: every row lands post
    const_idx = spark.createDataFrame(
        [(5, 1.0), (5, 2.0), (5, 3.0)], "x long, v double"
    )
    e3 = trend_break(const_idx, "x", "v").collect()
    assert len(e3) == 1
    assert (e3[0]["n_pre"], e3[0]["n_post"]) == (0, 3)
    assert e3[0]["slope_post"] is None  # constant index: zero den


def test_seasonal_strength_separates_seasonal_from_noise(spark):
    """A clean alternating series has strength 1 (zero residual
    variance); a constant series is NULL (zero detrended variance);
    groups are independent."""
    from kafka_streams_plumber_spark.operators.behavior import (
        seasonal_strength,
    )

    rows = [("seasonal", i, [10.0, 20.0][i % 2]) for i in range(12)] + [
        ("flat", i, 7.0) for i in range(12)
    ]
    df = spark.createDataFrame(rows, "g string, idx long, v double")
    got = {
        r["g"]: r
        for r in seasonal_strength(
            df, "idx", "v", period=2, group_cols=["g"]
        ).collect()
    }
    assert got["seasonal"]["strength"] == 1.0
    assert got["flat"]["strength"] is None  # constant: no variance at all
    assert got["seasonal"]["n_buckets"] == 12

    # pure noise with no period-2 structure: strength near 0
    noise = [(i, float((i * 37 + 11) % 7)) for i in range(40)]
    ndf = spark.createDataFrame(noise, "idx long, v double")
    s = seasonal_strength(ndf, "idx", "v", period=2).collect()[0]
    assert s["strength"] is not None and s["strength"] < 0.2


def test_ohlc_bars_hand_computed(spark):
    """Two hourly buckets: open/close pick first/last by (ts, value)
    struct order incl. the same-tick tie broken by value; high/low/
    mean are exact."""
    from datetime import datetime

    from kafka_streams_plumber_spark.operators.behavior import ohlc_bars

    t0 = datetime(2024, 1, 1, 10, 5)
    rows = [
        ("k", datetime(2024, 1, 1, 10, 5), 5.0),
        ("k", datetime(2024, 1, 1, 10, 5), 3.0),  # same tick: open = 3
        ("k", datetime(2024, 1, 1, 10, 30), 9.0),
        ("k", datetime(2024, 1, 1, 10, 59), 4.0),
        ("k", datetime(2024, 1, 1, 11, 1), 7.0),
        ("k", None, 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        r["window_start"].hour: r
        for r in ohlc_bars(df, "k", "ts", "v", window="1 hour").collect()
    }
    b10 = got[10]
    assert b10["n_events"] == 4
    assert (b10["open"], b10["close"]) == (3.0, 4.0)
    assert (b10["high"], b10["low"]) == (9.0, 3.0)
    assert b10["mean"] == 5.25
    b11 = got[11]
    assert (b11["open"], b11["close"], b11["n_events"]) == (7.0, 7.0, 1)
    assert t0  # silence unused


def test_logrank_hand_computed(spark):
    """A=[1,2] events vs B=[1,3] events: O_a=2, E_a=1.5, V=7/12 ->
    chi2 = 0.25/(7/12) = 0.428571; a censored subject counts at-risk
    but never as an event; identical groups give chi2 ~ 0."""
    from kafka_streams_plumber_spark.operators.behavior import logrank_test

    rows = [
        ("a", 1.0, 1), ("a", 2.0, 1), ("b", 1.0, 1), ("b", 3.0, 1),
    ]
    df = spark.createDataFrame(rows, "g string, t double, e int")
    r = logrank_test(df, "t", "e", "g", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["o_a"]) == (2, 2, 2)
    assert r["e_a"] == 1.5
    assert r["chi2"] == round(0.25 / (7.0 / 12.0), 6)

    # pure-Python textbook reference with censoring
    def ref(rows):
        times = sorted({t for _, t, _ in rows})
        o = e = v = 0.0
        for t in times:
            n1 = sum(1 for g, d, _ in rows if g == "a" and d >= t)
            n = sum(1 for _, d, _ in rows if d >= t)
            d1 = sum(1 for g, d, ev in rows if g == "a" and d == t and ev)
            dt = sum(1 for _, d, ev in rows if d == t and ev)
            o += d1
            e += dt * n1 / n
            if n > 1:
                v += dt * (n1 / n) * (1 - n1 / n) * (n - dt) / (n - 1)
        return o, e, (o - e) ** 2 / v

    cens = rows + [("a", 1.5, 0), ("b", 2.5, 0), ("a", 9.0, 0)]
    ro, re_, rchi = ref(cens)
    df2 = spark.createDataFrame(cens, "g string, t double, e int")
    r2 = logrank_test(df2, "t", "e", "g", "a", "b").collect()[0]
    assert r2["o_a"] == ro
    assert r2["e_a"] == round(re_, 6)
    assert abs(r2["chi2"] - rchi) < 1e-5

    same = [("a", float(i), 1) for i in range(1, 6)] + [
        ("b", float(i), 1) for i in range(1, 6)
    ]
    df3 = spark.createDataFrame(same, "g string, t double, e int")
    assert abs(logrank_test(df3, "t", "e", "g", "a", "b").collect()[0]["chi2"]) < 1e-9


def test_durbin_watson_hand_computed(spark):
    """Alternating series [1,3,1,3,1]: mean 1.8, diffs all +-2 ->
    DW = 4*4 / 4.8 = 3.333333 (oscillation >> 2); monotone ramp
    [1,2,3,4,5] -> 4/10 = 0.4 (strong positive autocorrelation);
    constant series -> NULL; a bucket gap drops its pair."""
    from kafka_streams_plumber_spark.operators.behavior import (
        durbin_watson,
    )

    rows = [("osc", i, v) for i, v in enumerate([1.0, 3.0, 1.0, 3.0, 1.0])]
    rows += [("ramp", i, float(i + 1)) for i in range(5)]
    rows += [("const", i, 2.0) for i in range(4)]
    rows += [("gap", i, float(i + 1)) for i in (0, 1, 3, 4)]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    out = {r["g"]: r for r in durbin_watson(df, "g", "i", "v").collect()}
    assert out["osc"]["dw"] == 3.333333
    assert out["osc"]["n_pairs"] == 4
    assert out["ramp"]["dw"] == 0.4
    assert out["const"]["dw"] is None
    # i=2 missing: pairs (0,1), (3,4) only
    assert out["gap"]["n_pairs"] == 2


def test_theil_sen_hand_computed(spark):
    """Perfect line v = 2i + 1 -> slope exactly 2; one wild outlier
    (up 100 at i=2) leaves the median slope close to 2 while the OLS
    slope would swing; single bucket -> NULL slope."""
    from kafka_streams_plumber_spark.operators.behavior import theil_sen

    rows = [("line", i, 2.0 * i + 1.0) for i in range(6)]
    out_vals = [1.0, 3.0, 105.0, 7.0, 9.0, 11.0]
    rows += [("out", i, v) for i, v in enumerate(out_vals)]
    rows += [("one", 0, 5.0)]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    out = {r["g"]: r for r in theil_sen(df, "g", "i", "v").collect()}
    assert out["line"]["slope"] == 2.0
    assert out["line"]["n_pairs"] == 15
    assert abs(out["out"]["slope"] - 2.0) < 0.5
    assert out["one"]["slope"] is None and out["one"]["n_pairs"] == 0


def test_theil_sen_matches_pure_python(spark):
    """Random gapped series vs an independent pure-Python pairwise-
    median kernel (quantile_cont interpolation)."""
    import random

    from kafka_streams_plumber_spark.operators.behavior import theil_sen

    random.seed(5)
    idx = sorted(random.sample(range(40), 17))
    rows = [("g", i, round(0.7 * i + random.gauss(0, 3), 4)) for i in idx]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    r = theil_sen(df, "g", "i", "v").collect()[0]
    pts = [(i, v) for _, i, v in rows]
    slopes = sorted(
        round((v2 - v1) / (i2 - i1), 6)
        for a, (i1, v1) in enumerate(pts)
        for (i2, v2) in pts[a + 1 :]
    )
    pos = (len(slopes) - 1) * 0.5
    lo, hi = slopes[int(pos)], slopes[min(int(pos) + 1, len(slopes) - 1)]
    med = lo + (hi - lo) * (pos - int(pos))
    # Spark F.round is HALF_UP; Python round() is banker's — quantize
    # the reference the way the engine does
    import decimal

    medq = float(
        decimal.Decimal(repr(med)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )
    assert r["slope"] == medq


def test_mann_kendall_hand_computed(spark):
    """Strictly increasing series: S = n(n-1)/2 with the continuity-
    corrected z; decreasing mirrors the sign; constant -> NULL; tie
    correction matches the closed form on a tied panel."""
    import math
    from collections import Counter

    from kafka_streams_plumber_spark.operators.behavior import (
        mann_kendall,
    )

    rows = [("up", i, float(i)) for i in range(10)]
    rows += [("down", i, float(-i)) for i in range(10)]
    rows += [("flat", i, 3.0) for i in range(8)]
    tied_vals = [1, 2, 2, 3, 1, 3, 3, 4, 2, 5]
    rows += [("tied", i, float(v)) for i, v in enumerate(tied_vals)]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    out = {r["g"]: r for r in mann_kendall(df, "g", "i", "v").collect()}

    n = 10
    var = n * (n - 1) * (2 * n + 5) / 18
    assert out["up"]["s"] == 45
    assert out["up"]["z"] == round(44 / math.sqrt(var), 6)
    assert out["down"]["s"] == -45
    assert out["down"]["z"] == -out["up"]["z"]
    assert out["flat"]["z"] is None and out["flat"]["s"] == 0

    s = sum(
        (tied_vals[j] > tied_vals[i]) - (tied_vals[j] < tied_vals[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    t = Counter(tied_vals)
    vart = (
        n * (n - 1) * (2 * n + 5)
        - sum(c * (c - 1) * (2 * c + 5) for c in t.values())
    ) / 18
    zc = s - 1 if s > 0 else (s + 1 if s < 0 else 0)
    assert out["tied"]["s"] == s
    assert out["tied"]["z"] == round(zc / math.sqrt(vart), 6)


def test_mann_kendall_seasonal_hand_computed(spark):
    """A pure period-4 cycle with constant per-phase values has
    var = 0 -> NULL (the plain test would see z = 0 only by luck of
    symmetry); cycle + linear trend scores a strong positive z that
    matches the per-season sequential reference; phases never
    compare across."""
    import math
    from collections import Counter

    from kafka_streams_plumber_spark.operators.behavior import (
        mann_kendall_seasonal,
    )

    cyc = [("cyc", i, float([10, 20, 5, 15][i % 4])) for i in range(32)]
    tr = [("tr", i, float([10, 20, 5, 15][i % 4]) + 0.5 * i)
          for i in range(32)]
    df = spark.createDataFrame(cyc + tr, "g string, i long, v double")
    out = {r["g"]: r for r in
           mann_kendall_seasonal(df, "g", "i", "v", period=4).collect()}
    assert out["cyc"]["s"] == 0 and out["cyc"]["z"] is None
    assert out["cyc"]["n_seasons"] == 4

    s_tot, v18 = 0, 0
    for h in range(4):
        seq = [v for g, i, v in tr if i % 4 == h]
        nh = len(seq)
        s_tot += sum(
            (seq[j] > seq[i]) - (seq[j] < seq[i])
            for i in range(nh)
            for j in range(i + 1, nh)
        )
        t = Counter(seq)
        v18 += nh * (nh - 1) * (2 * nh + 5) - sum(
            c * (c - 1) * (2 * c + 5) for c in t.values()
        )
    z = (s_tot - 1) / math.sqrt(v18 / 18)
    assert out["tr"]["s"] == s_tot
    assert out["tr"]["z"] == round(z, 6)


def test_theil_sen_seasonal_hand_computed(spark):
    """Cycle + 0.5/bucket trend: every within-phase slope is exactly
    0.5 (the cross-phase slopes a plain Theil-Sen would mix in are
    excluded), n_pairs counts per-phase C(nh,2); a one-bucket-per-
    phase series has no pairs and a NULL slope."""
    from kafka_streams_plumber_spark.operators.behavior import (
        theil_sen_seasonal,
    )

    data = [("t", i, float([10, 20, 5, 15][i % 4]) + 0.5 * i)
            for i in range(24)]
    data += [("one", i, float(i)) for i in range(4)]
    df = spark.createDataFrame(data, "g string, i long, v double")
    out = {r["g"]: r for r in
           theil_sen_seasonal(df, "g", "i", "v", period=4).collect()}
    t = out["t"]
    assert (t["n_buckets"], t["n_pairs"], t["slope"]) == (24, 60, 0.5)
    one = out["one"]
    assert one["n_pairs"] == 0 and one["slope"] is None


def test_ohlc_bars_decimal_sum_survives_int64_envelope(spark):
    """r10 long-sum audit: the per-bar mean's 1e6-scaled sum must
    accumulate on decimal — 1e6 events of ~9.4e6 in ONE (key, hour)
    bar sum the scaled longs to 9.4e18 > 2^63, where a plain long
    F.sum wraps negative (mean would read -9.05e6 instead of
    9.4e6)."""
    import pyspark.sql.functions as F

    from kafka_streams_plumber_spark.operators.behavior import ohlc_bars

    df = spark.range(1_000_000).select(
        F.lit("k").alias("key"),
        (
            F.lit("2026-01-01 03:00:00").cast("timestamp")
            + F.make_interval(secs=(F.col("id") % 3000).cast("double"))
        ).alias("ts"),
        (F.lit(9399999.0) + (F.col("id") % 2).cast("double") * 2.0).alias(
            "v"
        ),
    )
    r = ohlc_bars(df, "key", "ts", "v", window="1 hour").collect()
    assert len(r) == 1
    bar = r[0]
    assert bar["n_events"] == 1_000_000
    assert bar["high"] == 9400001.0 and bar["low"] == 9399999.0
    # exact: 500k * (9399999e6 + 9400001e6) / 1e6 / 1e6 = 9.4e6
    assert bar["mean"] == 9400000.0


def test_durbin_watson_decimal_sum_survives_int64_envelope(spark):
    """r10 long-sum audit: the per-group scaled-value sum T must ride
    decimal — an alternating 1e6-point series around 9.4e6 at scale=6
    sums the scaled longs to 9.4e18 > 2^63 (the old long sum wrapped T
    negative and drove DW to ~0); the alternating series' true DW is
    the anti-correlated limit ~4."""
    import pyspark.sql.functions as F

    from kafka_streams_plumber_spark.operators.behavior import durbin_watson

    n = 1_000_000
    df = spark.range(n).select(
        F.lit("g").alias("g"),
        F.col("id").alias("i"),
        (F.lit(9399999.0) + (F.col("id") % 2).cast("double") * 2.0).alias(
            "v"
        ),
    )
    r = durbin_watson(df, "g", "i", "v").collect()[0]

    s_lo, s_hi = 9399999 * 10**6, 9400001 * 10**6
    T = 500_000 * (s_lo + s_hi)
    assert T > 2**63 - 1  # the fixture really is in the old wrap regime
    Q = 500_000 * (s_lo * s_lo + s_hi * s_hi)
    D = (n - 1) * (2 * 10**6) ** 2
    dw = float(n) * float(D) / float(n * Q - T * T)
    assert r["n_buckets"] == n and r["n_pairs"] == n - 1
    assert r["dw"] == round(dw, 6) == 3.999996
