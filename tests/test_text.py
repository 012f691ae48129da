"""Unit tests for text-analysis operators on hand-computed fixtures
(the contract queries cover them against the DuckDB oracle at corpus
scale; these pin the edge-case semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators import text as TX


def _rep(spark, s):
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(TX.repetition_stats("text").alias("r")).collect()[0]["r"].asDict()


def test_repetition_all_unique(spark):
    r = _rep(spark, "a b c d")
    assert r == {"dup_1gram_frac": 0.0, "dup_2gram_frac": 0.0, "dup_3gram_frac": 0.0}


def test_repetition_fully_repeated(spark):
    # "x x x x": 4 words 1 distinct -> 0.75; 3 bigrams 1 distinct -> 2/3;
    # 2 trigrams 1 distinct -> 0.5
    r = _rep(spark, "x x x x")
    assert r["dup_1gram_frac"] == 0.75
    assert r["dup_2gram_frac"] == round(2 / 3, 6)
    assert r["dup_3gram_frac"] == 0.5


def test_repetition_short_docs_score_zero(spark):
    assert _rep(spark, "a b")["dup_3gram_frac"] == 0.0
    assert _rep(spark, "a")["dup_2gram_frac"] == 0.0


def test_repetition_case_folds(spark):
    # "The the" is one distinct unigram after lowering
    assert _rep(spark, "The the")["dup_1gram_frac"] == 0.5


def test_quality_and_langid_shapes(spark):
    df = spark.createDataFrame(
        [("the cat and the dog is in the house for it",),
         ("der hund ist nicht ein und das zu der die",)],
        "text string",
    )
    out = df.select(
        TX.lang_id("text").alias("lang"), TX.quality_score("text").alias("q")
    ).collect()
    assert out[0]["lang"] == "en"
    assert out[1]["lang"] == "de"
    assert all(0.0 <= r["q"] <= 1.0 for r in out)


def test_redact_pii_all_three_patterns(spark):
    df = spark.createDataFrame(
        [("mail a@b.com call +1 555-123-4567 ip 10.0.0.1 end",)], "text string"
    )
    out = df.select(TX.redact_pii("text").alias("t")).collect()[0]["t"]
    assert "a@b.com" not in out and "555" not in out and "10.0.0.1" not in out
    assert out.count("[REDACTED]") == 3


def test_dedup_spans_removes_later_occurrence(spark):
    # doc 1 repeats doc 0's opening span; with span_tokens=3, that span
    # survives only in doc 0 (first occurrence by (doc_id, span_idx))
    df = spark.createDataFrame(
        [
            (0, "a b c x y z"),
            (1, "a b c q r s"),
            (2, "q r s"),  # duplicates doc 1's second span
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in TX.dedup_spans(df, span_tokens=3).collect()
    }
    assert out[0]["clean_text"] == "a b c x y z" and out[0]["n_removed"] == 0
    assert out[1]["clean_text"] == "q r s" and out[1]["n_removed"] == 1
    assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 1
    assert out[2]["n_spans"] == 1


def test_dedup_spans_intra_doc_duplicate(spark):
    df = spark.createDataFrame(
        [(7, "a b c a b c")], "doc_id long, text string"
    )
    r = TX.dedup_spans(df, span_tokens=3).collect()[0]
    assert r["clean_text"] == "a b c" and r["n_removed"] == 1


def test_char_bigram_lm_scores_ood_text_lower(spark):
    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog ran off") for i in range(20)]
        + [(99, "zzzz qqqq xxxx zzzz qqqq xxxx")],
        "doc_id long, text string",
    )
    model = TX.char_bigram_logprobs(corpus)
    scores = {
        r["doc_id"]: r["avg_logp"]
        for r in TX.lm_score(corpus, model).collect()
    }
    # the out-of-distribution doc must score strictly lower than in-dist
    assert scores[99] < scores[0]


def test_winnow_shared_substring_shares_fingerprint(spark):
    # guarantee: shared substring of length >= k + window - 1 (= 11)
    # yields at least one common fingerprint
    shared = "commonsubstringhere"
    df = spark.createDataFrame(
        [(0, "aaa " + shared + " bbb"), (1, "ccc " + shared + " ddd")],
        "doc_id long, text string",
    )
    rows = df.select(
        TX.winnow_fingerprints("text", k=8, window=4).alias("fps")
    ).collect()
    assert set(rows[0]["fps"]) & set(rows[1]["fps"])


def test_winnow_disjoint_texts_disjoint_fps(spark):
    df = spark.createDataFrame(
        [(0, "abcdefghijklmnop"), (1, "qrstuvwxyz123456")],
        "doc_id long, text string",
    )
    rows = df.select(
        TX.winnow_fingerprints("text", k=8, window=4).alias("fps")
    ).collect()
    assert not (set(rows[0]["fps"]) & set(rows[1]["fps"]))


def test_oov_rate_counts_occurrences_not_types(spark):
    from kafka_streams_plumber_spark.operators.text import oov_rate

    docs = spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "aa aa aa aa"), (3, "zz yy")],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame([("aa",), ("bb",)], "tok string")
    out = {r["doc_id"]: r for r in oov_rate(docs, vocab).collect()}
    assert (out[1]["n_tokens"], out[1]["n_oov"], out[1]["oov_rate"]) == (4, 1, 0.25)
    assert (out[2]["n_tokens"], out[2]["n_oov"], out[2]["oov_rate"]) == (4, 0, 0.0)
    assert (out[3]["n_tokens"], out[3]["n_oov"], out[3]["oov_rate"]) == (2, 2, 1.0)


def test_split_sentences_offsets_index_original_text(spark):
    from kafka_streams_plumber_spark.operators.text import split_sentences

    text = "Hello world. How are you? Fine! ok"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        split_sentences(df, "text", "doc_id").collect(),
        key=lambda r: r["sent_idx"],
    )
    assert [r["sentence"] for r in rows] == [
        "Hello world.", "How are you?", "Fine!", "ok",
    ]
    # offsets slice the ORIGINAL string back to the raw (untrimmed) span
    for r in rows:
        assert text[r["char_start"]:r["char_end"]].rstrip() == r["sentence"]
    assert rows[-1]["char_end"] == len(text)


def test_split_sentences_no_boundary_is_single_span(spark):
    from kafka_streams_plumber_spark.operators.text import split_sentences

    df = spark.createDataFrame([(7, "no punctuation here")], ["doc_id", "text"])
    rows = split_sentences(df, "text", "doc_id").collect()
    assert len(rows) == 1
    assert rows[0]["char_start"] == 0 and rows[0]["char_end"] == 19


def test_split_sentences_survives_stray_sentinel_bytes(spark):
    from kafka_streams_plumber_spark.operators.text import split_sentences

    text = "a\x01b. c"  # stray control byte must not shift offsets
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        split_sentences(df, "text", "doc_id").collect(),
        key=lambda r: r["sent_idx"],
    )
    cleaned = "ab. c"
    assert [r["sentence"] for r in rows] == ["ab.", "c"]
    for r in rows:
        assert cleaned[r["char_start"]:r["char_end"]].rstrip() == r["sentence"]


# ---------------------------------------------------------------------
# Boilerplate line removal
# ---------------------------------------------------------------------

from kafka_streams_plumber_spark.operators.text import (  # noqa: E402
    strip_boilerplate_lines,
)


def test_boilerplate_strips_common_lines_keeps_unique(spark):
    rows = [
        (1, "s", "COOKIE BANNER\nreal content one\nFOOTER"),
        (2, "s", "COOKIE BANNER\nreal content two\nFOOTER"),
        (3, "s", "COOKIE BANNER\nsomething else\nFOOTER"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in strip_boilerplate_lines(df).collect()}
    assert out[1]["clean_text"] == "real content one"
    assert out[2]["clean_text"] == "real content two"
    assert all(r["n_removed"] == 2 for r in out.values())


def test_boilerplate_is_per_group(spark):
    rows = [
        (1, "a", "SHARED\nalpha"),
        (2, "a", "SHARED\nbeta"),
        # group b: SHARED appears once out of two docs (50% not > 50%)
        (3, "b", "SHARED\ngamma"),
        (4, "b", "delta\nepsilon"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r["clean_text"] for r in strip_boilerplate_lines(df).collect()}
    assert out[1] == "alpha" and out[2] == "beta"
    assert out[3] == "SHARED\ngamma"  # survives in group b


def test_boilerplate_small_group_untouched(spark):
    df = spark.createDataFrame(
        [(1, "solo", "ONLY\ndoc")], "doc_id long, source string, text string"
    )
    r = strip_boilerplate_lines(df, min_docs=2).first()
    assert r["clean_text"] == "ONLY\ndoc" and r["n_removed"] == 0


def test_boilerplate_all_lines_removed_yields_empty(spark):
    rows = [(1, "s", "SAME"), (2, "s", "SAME"), (3, "s", "SAME")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = strip_boilerplate_lines(df).collect()
    assert all(r["clean_text"] == "" and r["n_removed"] == 1 for r in out)


def test_boilerplate_preserves_line_order(spark):
    rows = [
        (1, "s", "x\nCOMMON\ny\nz"),
        (2, "s", "COMMON\np\nq"),
        (3, "s", "COMMON\nr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r["clean_text"] for r in strip_boilerplate_lines(df).collect()}
    assert out[1] == "x\ny\nz"


# ---------------------------------------------------------------------
# Span corruption
# ---------------------------------------------------------------------

from kafka_streams_plumber_spark.operators.text import span_corruption  # noqa: E402


def test_span_corruption_structure(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(25)))], "doc_id long, text string"
    )
    r = span_corruption(df, rate_permille=1000, block=10, span=3).first()
    # every block selected at rate 1000: spans t0-2, t10-12, t20-22 cut
    assert r["input_text"] == (
        "<extra_id_0> t3 t4 t5 t6 t7 t8 t9 "
        "<extra_id_1> t13 t14 t15 t16 t17 t18 t19 "
        "<extra_id_2> t23 t24"
    )
    assert r["target_text"] == (
        "<extra_id_0> t0 t1 t2 <extra_id_1> t10 t11 t12 <extra_id_2> t20 t21 t22"
    )
    assert r["n_spans"] == 3


def test_span_corruption_roundtrip_reconstructs_tokens(spark):
    """Splicing each target span back over its sentinel yields the
    original token stream."""
    import re

    docs = [(i, " ".join(f"w{i}_{j}" for j in range(40))) for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_corruption(df).collect()}
    for i, text in docs:
        r = out[i]
        spans = {}
        for m in re.finditer(r"<extra_id_(\d+)>((?: (?!<extra_id_)\S+)*)", r["target_text"]):
            spans[m.group(1)] = m.group(2).strip()
        rebuilt = re.sub(
            r"<extra_id_(\d+)>", lambda m: spans.get(m.group(1), ""), r["input_text"]
        )
        rebuilt = " ".join(rebuilt.split())
        assert rebuilt == text, (i, rebuilt, text)


def test_span_corruption_rate_zero_is_identity(spark):
    df = spark.createDataFrame([(7, "a b c d e")], "doc_id long, text string")
    r = span_corruption(df, rate_permille=0).first()
    assert r["input_text"] == "a b c d e" and r["target_text"] == "" and r["n_spans"] == 0


def test_span_corruption_partition_invariant(spark):
    docs = [(i, " ".join(f"x{j}" for j in range(30))) for i in range(50)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, span_corruption(df.repartition(8)).collect()))
    b = sorted(map(tuple, span_corruption(df.coalesce(1)).collect()))
    assert a == b


# ---------------------------------------------------------------------
# Zipf fit
# ---------------------------------------------------------------------

from kafka_streams_plumber_spark.operators.text import zipf_fit  # noqa: E402


def test_zipf_fit_recovers_known_slope(spark):
    # construct a corpus whose token counts follow count = 1000 / rank
    # exactly: slope should be ~ -1, r2 ~ 1
    docs = []
    for rank in range(1, 41):
        cnt = max(1, round(1000 / rank))
        docs.extend([(f"tok{rank:03d} " * 1)] * cnt)
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    r = zipf_fit(df).first()
    assert r["n_vocab"] == 40
    assert abs(r["slope"] + 1.0) < 0.05, r["slope"]
    assert r["r2"] > 0.99


def test_zipf_fit_uniform_corpus_flat_slope(spark):
    df = spark.createDataFrame(
        [(f"w{i} " * 1,) for i in range(30) for _ in range(10)], "text string"
    )
    r = zipf_fit(df).first()
    assert abs(r["slope"]) < 1e-6  # all counts equal -> flat line
    assert r["n_vocab"] == 30


def test_zipf_fit_partition_invariant(spark):
    df = spark.createDataFrame(
        [(f"a b c d e w{i % 7}",) for i in range(200)], "text string"
    )
    a = tuple(zipf_fit(df.repartition(8)).first())
    b = tuple(zipf_fit(df.coalesce(1)).first())
    assert a == b


# ---------------------------------------------------------------------
# Fill-in-the-middle
# ---------------------------------------------------------------------

from kafka_streams_plumber_spark.operators.text import fim_transform  # noqa: E402


def test_fim_roundtrip_reconstructs_document(spark):
    docs = [(i, f"doc number {i} " + "abcdefghij" * 5) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in fim_transform(df).collect()}
    orig = dict(docs)
    n_fim = 0
    for i, r in out.items():
        if not r["is_fim"]:
            assert r["fim_text"] == orig[i]
            continue
        n_fim += 1
        s = r["fim_text"]
        assert s.startswith("<PRE>")
        pre, rest = s[5:].split("<SUF>", 1)
        suf, mid = rest.split("<MID>", 1)
        assert pre + mid + suf == orig[i], i
    assert 0 < n_fim < len(docs)  # ~half selected


def test_fim_rate_bounds(spark):
    docs = [(i, "x" * 20) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    all_on = fim_transform(df, rate_permille=1000).filter("is_fim").count()
    none_on = fim_transform(df, rate_permille=0).filter("is_fim").count()
    assert all_on == 200 and none_on == 0


def test_fim_deterministic(spark):
    docs = [(i, f"text {i} " * 4) for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, fim_transform(df.repartition(8)).collect()))
    b = sorted(map(tuple, fim_transform(df.coalesce(1)).collect()))
    assert a == b


def test_content_chunks_partition_document(spark):
    """Chunks tile the token sequence: contiguous, disjoint, complete."""
    from kafka_streams_plumber_spark.operators.text import content_chunks

    text = " ".join(f"tok{i % 13}x{i % 7}" for i in range(200))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        content_chunks(df).collect(), key=lambda r: r["chunk_idx"]
    )
    assert rows[0]["start_pos"] == 0
    total = 0
    for i, r in enumerate(rows):
        assert r["chunk_idx"] == i
        assert r["start_pos"] == total
        total += r["n_tokens"]
    assert total == 200


def test_content_chunks_edit_is_local(spark):
    """Inserting tokens near the front leaves every chunk hash after
    the edited region identical — the CDC property a fixed-size
    chunker lacks."""
    from kafka_streams_plumber_spark.operators.text import content_chunks

    base = " ".join(f"w{(i * 17) % 101}q{i % 11}" for i in range(300))
    toks = base.split(" ")
    edited = " ".join(toks[:5] + ["INSERTED", "NOISE"] + toks[5:])
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    out = content_chunks(df).collect()
    h1 = {r["chunk_hash"] for r in out if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in out if r["doc_id"] == 2}
    shared = h1 & h2
    # the tail of the document re-synchronizes: most chunks survive
    assert len(shared) >= max(1, len(h1) - 3)
    assert h1 != h2  # the edited chunk itself differs


def test_heaps_fit_regimes(spark):
    """beta ~ 1 when every token is new; beta ~ 0 when vocabulary is
    exhausted immediately; natural Zipf-ish text lands in between."""
    from kafka_streams_plumber_spark.operators.text import heaps_fit

    # all-unique tokens: V == N at every checkpoint -> beta == 1, k == 1
    uniq = [(i, " ".join(f"u{i}_{j}" for j in range(10))) for i in range(60)]
    df = spark.createDataFrame(uniq, "doc_id long, text string")
    r = heaps_fit(df, checkpoints=10).collect()[0]
    assert abs(r["beta"] - 1.0) < 1e-6 and abs(r["k"] - 1.0) < 1e-6
    assert r["total_tokens"] == 600 and r["vocab"] == 600
    assert r["n_points"] == 10

    # one-word corpus: V stuck at 1 -> beta == 0
    flat = [(i, "same same same same") for i in range(60)]
    df = spark.createDataFrame(flat, "doc_id long, text string")
    r = heaps_fit(df, checkpoints=10).collect()[0]
    assert abs(r["beta"]) < 1e-6 and r["vocab"] == 1

    # sublinear growth: doc i introduces ~sqrt-spaced novelty
    mixed = [
        (i, " ".join(f"w{(i * j) % (3 * (i + 1))}" for j in range(20)))
        for i in range(80)
    ]
    df = spark.createDataFrame(mixed, "doc_id long, text string")
    r = heaps_fit(df, checkpoints=20).collect()[0]
    assert 0.05 < r["beta"] < 0.95
    assert 0.0 <= r["r2"] <= 1.0


def test_heaps_fit_checkpoint_invariants(spark):
    """Totals are checkpoint-count-invariant; empty/NULL docs count
    zero tokens; n_points never exceeds requested checkpoints."""
    from kafka_streams_plumber_spark.operators.text import heaps_fit

    rows = [(1, "a b c"), (2, None), (3, ""), (4, "a b d e"), (5, "f")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for g in (2, 5, 100):
        r = heaps_fit(df, checkpoints=g).collect()[0]
        assert r["total_tokens"] == 8 and r["vocab"] == 6
        assert r["n_points"] <= g


def test_ngram_novelty_mosaic_duplication(spark):
    """A doc stitched from two earlier docs' shingles scores ~0 novelty
    even though neither earlier doc pairwise-matches it."""
    from kafka_streams_plumber_spark.operators.text import ngram_novelty

    d1 = "alpha beta gamma delta epsilon"
    d2 = "one two three four five"
    mosaic = d1 + " " + d2  # only the seam shingles are new
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, mosaic), (4, "wholly fresh new content here")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty"])
        for r in ngram_novelty(docs).collect()
    }
    # first docs are fully novel
    assert got[1] == (3, 3, 1.0) and got[2] == (3, 3, 1.0)
    # mosaic: 8 shingles, only the 2 seam shingles are new
    assert got[3] == (8, 2, 0.25)
    assert got[4] == (3, 3, 1.0)


def test_ngram_novelty_exact_dup_scores_zero(spark):
    from kafka_streams_plumber_spark.operators.text import ngram_novelty

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["novelty"] for r in ngram_novelty(docs).collect()}
    assert got == {1: 1.0, 2: 0.0}


def test_distinctive_terms_sides_and_prior_damping(spark):
    """'spark' dominates corpus A, 'kafka' corpus B; shared filler
    words stay near zeta 0 and never outrank them. A term seen ONCE
    only in A lands on side a but scores below the heavy hitter (the
    Dirichlet prior damps rare-term noise)."""
    from kafka_streams_plumber_spark.operators.text import (
        distinctive_terms,
    )

    rows = (
        [("A", "spark spark spark the and of unique")] * 3
        + [("B", "kafka kafka kafka the and of")] * 3
    )
    df = spark.createDataFrame(rows, "src string, text string")
    out = distinctive_terms(
        df, "src", "text", group_a="A", group_b="B", top_n=3
    ).collect()
    by_side = {}
    for r in out:
        by_side.setdefault(r["side"], []).append(r)
    a_terms = [r["term"] for r in by_side["a"]]
    b_terms = [r["term"] for r in by_side["b"]]
    assert a_terms[0] == "spark" and b_terms[0] == "kafka"
    assert "unique" in a_terms
    z = {r["term"]: r["zeta"] for r in out}
    assert z["spark"] > z["unique"] > 0 > z["kafka"]
    # counts carried through
    c = {r["term"]: (r["count_a"], r["count_b"]) for r in out}
    assert c["spark"] == (9, 0) and c["kafka"] == (0, 9)


def test_tokenizer_fertility_hand_computed(spark):
    """Tiny corpus with known token/word/byte counts: ratios match the
    hand arithmetic; empty-text groups yield NULL ratios; NULL text is
    excluded entirely."""
    from kafka_streams_plumber_spark.operators.text import tokenizer_fertility

    rows = [
        # bpe: [ab, cd, !] = 3; words: [ab, cd!] = 2; bytes 6
        ("en", "s1", "ab cd!"),
        # bpe: [x, 1, y] = 3; words: [x1y] = 1; bytes 3
        ("en", "s1", "x1y"),
        # empty text: 0 tokens / 0 words / 0 bytes -> NULL ratios
        ("fr", "s2", ""),
        # NULL text: excluded
        ("de", "s3", None),
    ]
    df = spark.createDataFrame(rows, "lang string, source string, text string")
    got = {
        (r["lang"], r["source"]): r
        for r in tokenizer_fertility(df, "text", ["lang", "source"]).collect()
    }
    assert set(got) == {("en", "s1"), ("fr", "s2")}

    en = got[("en", "s1")]
    assert (en["n_docs"], en["n_tokens"], en["n_words"], en["n_bytes"]) == (
        2,
        6,
        3,
        9,
    )
    assert en["tokens_per_word"] == 2.0
    assert en["tokens_per_100_bytes"] == round(6 * 100.0 / 9, 6)

    fr = got[("fr", "s2")]
    assert (fr["n_docs"], fr["n_tokens"], fr["n_words"], fr["n_bytes"]) == (
        1,
        0,
        0,
        0,
    )
    assert fr["tokens_per_word"] is None
    assert fr["tokens_per_100_bytes"] is None


def test_vocab_drift_hand_computed(spark):
    """Per-day distinct-token novelty against the trailing window:
    recurring tokens stop being new, tokens older than the window
    become new again, gap days contribute nothing."""
    from kafka_streams_plumber_spark.operators.text import vocab_drift

    rows = [
        (1, "a b"),
        (2, "b c"),
        (3, "c d a"),
        (10, "a x"),
        (11, "b"),
    ]
    df = spark.createDataFrame(rows, "d long, text string")
    got = {
        r["day"]: r
        for r in vocab_drift(df, "text", "d", baseline_days=7).collect()
    }
    assert (got[1]["n_tokens"], got[1]["n_new"]) == (2, 2)
    assert got[1]["new_fraction"] == 1.0  # warmup day
    # day 2: b seen on day 1, c new
    assert (got[2]["n_tokens"], got[2]["n_new"]) == (2, 1)
    assert got[2]["new_fraction"] == 0.5
    # day 3: a (day 1) and c (day 2) seen, d new
    assert (got[3]["n_tokens"], got[3]["n_new"]) == (3, 1)
    assert got[3]["new_fraction"] == round(1 / 3, 6)
    # day 10: window is days 3-9 — a seen on day 3, x new
    assert (got[10]["n_tokens"], got[10]["n_new"]) == (2, 1)
    # day 11: window is days 4-10 — b last seen day 2, new AGAIN
    assert (got[11]["n_tokens"], got[11]["n_new"]) == (1, 1)


def test_tfidf_keywords_hand_computed(spark):
    """3-doc corpus, smoothed idf ln((1+N)/(1+df))+1: d1 ranks apple
    (tf 2) over banana; d2's exact tie breaks by term asc; min_df=2
    drops the hapax 'date' from d3's top list."""
    from pyspark.sql import functions as F  # noqa: F401

    from kafka_streams_plumber_spark.operators.text import tfidf_keywords

    docs = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "apple cherry cherry date"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rnk"]): (r["term"], r["tf"], r["score"])
        for r in tfidf_keywords(df, "doc_id", "text", top_k=2).collect()
    }
    assert got[(1, 1)] == ("apple", 2, 2.575364)
    assert got[(1, 2)] == ("banana", 1, 1.287682)
    # exact tie in d2: banana before cherry (term asc)
    assert got[(2, 1)][0] == "banana" and got[(2, 2)][0] == "cherry"
    assert got[(3, 1)] == ("cherry", 2, 2.575364)
    assert got[(3, 2)] == ("date", 1, 1.693147)

    nf = {
        (r["doc_id"], r["rnk"]): r["term"]
        for r in tfidf_keywords(
            df, "doc_id", "text", top_k=2, min_df=2
        ).collect()
    }
    assert nf[(3, 1)] == "cherry" and nf[(3, 2)] == "apple"


def test_readability_hand_computed(spark):
    """'the cat sat. the dog ran fast!': 7 words, 2 sentences, 7
    vowel clusters -> FK = -2.425, ease = 118.6825; multi-syllable
    words raise the grade; empty text gives NULL scores."""
    from kafka_streams_plumber_spark.operators.text import readability

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran fast!"),
            (2, "beautiful ocean"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in readability(df, "doc_id", "text").collect()}
    r1 = got[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (7, 2, 7)
    assert r1["fk_grade"] == -2.425
    assert r1["flesch_ease"] == 118.6825
    r2 = got[2]
    assert (r2["n_words"], r2["n_syllables"]) == (2, 5)
    assert r2["fk_grade"] == round(0.39 * 2 + 11.8 * 2.5 - 15.59, 6)
    assert got[3]["fk_grade"] is None and got[3]["n_words"] == 0


def test_lexical_diversity_hand_computed(spark):
    """Hand-counted spectrum: 'the cat sat on the mat the end' + 'a
    cat and a dog' -> N=13 V=9 V1=6 sum m^2=23, so K=591.715976,
    D=10/156, R=100*ln(13)/(1/3); all-hapax slice -> honore NULL;
    repeat-only slice has zero hapax."""
    import math

    from kafka_streams_plumber_spark.operators.text import (
        lexical_diversity,
    )

    docs = [
        ("s1", "the cat sat on the mat the end"),
        ("s1", "a cat and a dog"),
        ("s2", "x y z"),
        ("s3", "w w w w"),
    ]
    df = spark.createDataFrame(docs, "g string, text string")
    out = {r["g"]: r for r in lexical_diversity(df, "text", "g").collect()}
    s1 = out["s1"]
    assert (s1["n_tokens"], s1["n_types"], s1["n_hapax"]) == (13, 9, 6)
    assert s1["yule_k"] == round(1e4 * (23 - 13) / 169, 6)
    assert s1["simpson_d"] == round(10 / 156, 6)
    assert s1["honore_r"] == round(100 * math.log(13) / (1 - 6 / 9), 6)
    assert out["s2"]["honore_r"] is None  # every type is a hapax
    s3 = out["s3"]
    assert (s3["n_types"], s3["n_hapax"]) == (1, 0)
    assert s3["simpson_d"] == 1.0  # repeat-draw probability is certain


def test_lexical_diversity_case_folding_and_empties(spark):
    """Tokenization matches the engine convention: lowercase space
    split with empties dropped ('The  THE the' is one type, count
    3)."""
    from kafka_streams_plumber_spark.operators.text import (
        lexical_diversity,
    )

    df = spark.createDataFrame(
        [("g", "The  THE the")], "g string, text string"
    )
    r = lexical_diversity(df, "text", "g").collect()[0]
    assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (3, 1, 0)


def test_vocab_richness_hand_computed(spark):
    """'the cat sat on the mat the end' + 'a cat and a dog' spectrum
    (N=13 V=9 V1=6 V2=2 — doubletons are cat and a): chao1 =
    9 + 6*5/(2*3) = 14, unseen = 6/13; the all-hapax slice has
    coverage 0 and the V2=0 denominator stays defined."""
    from kafka_streams_plumber_spark.operators.text import vocab_richness

    docs = [
        ("s1", "the cat sat on the mat the end"),
        ("s1", "a cat and a dog"),
        ("s2", "x y z"),
    ]
    df = spark.createDataFrame(docs, "g string, text string")
    out = {r["g"]: r for r in vocab_richness(df, "text", "g").collect()}
    s1 = out["s1"]
    assert (s1["n_tokens"], s1["n_types"], s1["n_hapax"],
            s1["n_doubletons"]) == (13, 9, 6, 2)
    assert s1["chao1"] == round(9 + 6 * 5 / (2 * 3), 6)
    assert s1["unseen_mass"] == round(6 / 13, 6)
    assert s1["coverage"] == round(1 - 6 / 13, 6)
    s2 = out["s2"]
    assert (s2["n_hapax"], s2["n_doubletons"]) == (3, 0)
    assert s2["chao1"] == 3 + 3.0  # V + V1(V1-1)/2 with V2=0
    assert s2["coverage"] == 0.0


def test_with_text_stats_attaches_all_columns(spark):
    """The one-projection convenience wrapper carries every standard
    text-analysis column and agrees with the individual primitives."""
    from kafka_streams_plumber_spark.operators.text import (
        quality_score,
        token_count,
        with_text_stats,
    )

    df = spark.createDataFrame(
        [(1, "The quick brown fox jumps over the lazy dog.")],
        "doc_id long, text string",
    )
    r = with_text_stats(df).collect()[0]
    for c in ("n_tokens", "n_stopwords", "quality", "pred_lang", "fingerprint"):
        assert c in r.asDict()
    single = df.select(
        token_count("text").alias("nt"), quality_score("text").alias("q")
    ).collect()[0]
    assert r["n_tokens"] == single["nt"]
    assert r["quality"] == single["q"]
