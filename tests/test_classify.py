"""Naive Bayes classifier operators (operators/classify.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.classify import nb_score, nb_train


def _fit_and_score(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    model = nb_train(df, "text", "y")
    return model, {r["doc_id"]: r for r in nb_score(df, model, "text", "doc_id").collect()}


def test_nb_separates_disjoint_vocabularies(spark):
    rows = [
        (1, "spam spam offer money", 1),
        (2, "offer money spam", 1),
        (3, "meeting agenda notes", 0),
        (4, "notes agenda meeting meeting", 0),
    ]
    _, scored = _fit_and_score(spark, rows)
    assert scored[1]["pred"] and scored[2]["pred"]
    assert not scored[3]["pred"] and not scored[4]["pred"]
    assert scored[1]["score"] > 0 > scored[3]["score"]


def test_nb_model_has_prior_row_and_vocab_rows(spark):
    rows = [(1, "a b", 1), (2, "c d", 0)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    model = nb_train(df, "text", "y").collect()
    tokens = {r["token"] for r in model}
    assert tokens == {"a", "b", "c", "d", None}
    prior = [r["weight"] for r in model if r["token"] is None]
    assert prior == [0]  # balanced classes -> log(1) = 0


def test_nb_oov_tokens_score_zero_contribution(spark):
    rows = [(1, "x y", 1), (2, "z w", 0)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    model = nb_train(df, "text", "y")
    unseen = spark.createDataFrame([(9, "qq rr ss")], ["doc_id", "text"])
    out = nb_score(unseen, model, "text", "doc_id").collect()[0]
    assert out["n_tokens"] == 3 and out["score"] == 0.0


def test_nb_score_is_partitioning_invariant(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} common", i % 2) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    model = nb_train(df, "text", "y")
    a = nb_score(df, model, "text", "doc_id").collect()
    b = nb_score(df.repartition(13), model, "text", "doc_id").collect()
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)


# ---------------------------------------------------------------------
# Logistic regression (gradient descent)
# ---------------------------------------------------------------------

from kafka_streams_plumber_spark.operators.classify import lr_train  # noqa: E402


def _sep_data(spark, n=200):
    import numpy as np

    rng = np.random.default_rng(5)
    xs = rng.normal(size=(n, 3))
    y = (xs[:, 0] + 2 * xs[:, 1] - 0.5 > 0).astype(int)
    rows = [([float(v) for v in xs[i]], int(y[i])) for i in range(n)]
    return (
        spark.createDataFrame(rows, "embedding array<float>, y int"),
        xs,
        y,
    )


def test_lr_learns_separable_data(spark):
    import numpy as np

    df, xs, y = _sep_data(spark)
    w = lr_train(df, "embedding", "y", dim=3, iterations=30, lr=2.0)
    wv = np.array([r["weight"] for r in w.orderBy("pos").collect()])
    assert wv.shape == (4,)
    margin = xs @ wv[:3] + wv[3]
    acc = ((margin > 0).astype(int) == y).mean()
    assert acc > 0.95, acc


def test_lr_partition_invariant(spark):
    df, _, _ = _sep_data(spark, n=120)
    a = [
        (r["pos"], round(r["weight"], 9))
        for r in lr_train(df.repartition(8), "embedding", "y", dim=3, iterations=4)
        .orderBy("pos")
        .collect()
    ]
    b = [
        (r["pos"], round(r["weight"], 9))
        for r in lr_train(df.coalesce(1), "embedding", "y", dim=3, iterations=4)
        .orderBy("pos")
        .collect()
    ]
    assert a == b


def test_calibration_report_hand_computed(spark):
    """Perfectly calibrated buckets show gap 0; a biased bucket shows
    its exact gap; ECE = sum of weighted gaps."""
    from kafka_streams_plumber_spark.operators.classify import calibration_report

    rows = (
        # bucket 2 (p=0.25): 4 rows, 1 positive -> perfectly calibrated
        [(0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0)]
        # bucket 9 (p=0.95): 2 rows, 0 positives -> gap 0.95
        + [(0.95, 0), (0.95, 0)]
        # p=1.0 lands in the top bucket too (top-inclusive)
        + [(1.0, 1)]
    )
    df = spark.createDataFrame(rows, "p double, y int")
    out = {r["bucket"]: r for r in
           calibration_report(df, "p", "y", bins=10).collect()}
    assert set(out) == {2, 9}
    assert out[2]["avg_prob"] == 0.25 and out[2]["frac_pos"] == 0.25
    assert out[2]["gap"] == 0.0 and out[2]["weighted_gap"] == 0.0
    # bucket 9: avg_prob = (0.95*2 + 1.0)/3, frac_pos = 1/3
    exp_avg = round((950000 * 2 + 1000000) / 1e6 / 3, 6)
    assert out[9]["avg_prob"] == exp_avg
    assert out[9]["frac_pos"] == round(1 / 3, 6)
    assert out[9]["weighted_gap"] == round((exp_avg - 1 / 3) * 3 / 7, 6)


def test_calibration_report_bins_guard(spark):
    import pytest as _pt

    from kafka_streams_plumber_spark.operators.classify import calibration_report

    df = spark.createDataFrame([(0.5, 1)], "p double, y int")
    with _pt.raises(ValueError):
        calibration_report(df, "p", "y", bins=1)


def test_agreement_report_hand_computed(spark):
    from kafka_streams_plumber_spark.operators.classify import (
        agreement_report,
    )

    # classic kappa example: 2 raters, 2 classes
    # a=yes,b=yes: 20 | a=yes,b=no: 5 | a=no,b=yes: 10 | a=no,b=no: 15
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = agreement_report(df, "a", "b").collect()[0]
    # po = 35/50 = 0.7; pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4
    assert r["n"] == 50 and r["n_agree"] == 35
    assert r["po"] == 0.7 and r["pe"] == 0.5
    assert abs(r["kappa"] - 0.4) < 1e-9


def test_agreement_report_edges(spark):
    from kafka_streams_plumber_spark.operators.classify import (
        agreement_report,
    )

    # both raters constant and equal: pe = 1 -> kappa NULL
    df = spark.createDataFrame([("x", "x")] * 4, "a string, b string")
    r = agreement_report(df, "a", "b").collect()[0]
    assert r["po"] == 1.0 and r["pe"] == 1.0 and r["kappa"] is None

    # NULLs are marginal classes but never agreement
    df = spark.createDataFrame(
        [("x", "x"), (None, None), ("x", None)], "a string, b string"
    )
    r = agreement_report(df, "a", "b").collect()[0]
    assert r["n"] == 3 and r["n_agree"] == 1
    # marginals: a: x=2, NULL=1; b: x=1, NULL=2 -> pe=(2*1 + 1*2)/9
    assert r["pe"] == round(4 / 9, 6)


def test_agreement_report_perfect_disagreement(spark):
    from kafka_streams_plumber_spark.operators.classify import (
        agreement_report,
    )

    df = spark.createDataFrame(
        [("a", "b")] * 5 + [("b", "a")] * 5, "a string, b string"
    )
    r = agreement_report(df, "a", "b").collect()[0]
    # po = 0, pe = 0.5 -> kappa = -1 (systematic disagreement)
    assert r["po"] == 0.0 and abs(r["kappa"] + 1.0) < 1e-9


def test_auc_hand_computed_with_ties(spark):
    from kafka_streams_plumber_spark.operators.classify import auc

    # scores: neg at 0.1, pos+neg tied at 0.5, pos at 0.9
    rows = [(0.1, False), (0.5, True), (0.5, False), (0.9, True)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    r = auc(df, "score", "label").collect()[0]
    # pairs: (0.5+,0.1-)=1, (0.5+,0.5-)=0.5, (0.9+,0.1-)=1, (0.9+,0.5-)=1
    # AUC = 3.5/4
    assert (r["n_pos"], r["n_neg"], r["n_scores"]) == (2, 2, 3)
    assert abs(r["auc"] - 0.875) < 1e-9


def test_auc_perfect_random_and_inverted(spark):
    from kafka_streams_plumber_spark.operators.classify import auc

    perfect = spark.createDataFrame(
        [(float(i), i >= 5) for i in range(10)], "score double, label boolean"
    )
    assert auc(perfect, "score", "label").collect()[0]["auc"] == 1.0

    inverted = spark.createDataFrame(
        [(float(-i), i >= 5) for i in range(10)], "score double, label boolean"
    )
    assert auc(inverted, "score", "label").collect()[0]["auc"] == 0.0

    all_tied = spark.createDataFrame(
        [(1.0, True), (1.0, False)] * 3, "score double, label boolean"
    )
    assert abs(auc(all_tied, "score", "label").collect()[0]["auc"] - 0.5) < 1e-9


def test_auc_degenerate_single_class_is_null(spark):
    from kafka_streams_plumber_spark.operators.classify import auc

    df = spark.createDataFrame(
        [(0.3, True), (0.7, True)], "score double, label boolean"
    )
    r = auc(df, "score", "label").collect()[0]
    assert r["auc"] is None and r["n_neg"] == 0


def test_auc_round_scores_merges_ties(spark):
    from kafka_streams_plumber_spark.operators.classify import auc

    df = spark.createDataFrame(
        [(0.5000001, True), (0.5000002, False), (0.1, False)],
        "score double, label boolean",
    )
    sharp = auc(df, "score", "label").collect()[0]
    merged = auc(df, "score", "label", round_scores=3).collect()[0]
    assert sharp["auc"] == 0.5  # pos above one neg, below the other
    assert merged["n_scores"] == 2 and abs(merged["auc"] - 0.75) < 1e-9


def test_best_threshold_hand_computed(spark):
    from kafka_streams_plumber_spark.operators.classify import (
        best_threshold,
    )

    # scores: positives at 0.9, 0.8, 0.3; negatives at 0.7, 0.2, 0.1
    rows = [
        (0.9, True), (0.8, True), (0.3, True),
        (0.7, False), (0.2, False), (0.1, False),
    ]
    df = spark.createDataFrame(rows, "score double, label boolean")
    r = best_threshold(df, "score", "label").collect()[0]
    # t=0.8: tp=2 fp=0 fn=1 -> F1 = 4/5 = 0.8
    # t=0.3: tp=3 fp=1 fn=0 -> F1 = 6/7 ~ 0.857  (the best)
    assert r["threshold"] == 0.3
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (3, 1, 0, 2)
    assert r["precision"] == 0.75 and r["recall"] == 1.0
    assert abs(r["f1"] - round(6 / 7, 6)) < 1e-9


def test_best_threshold_tie_prefers_lower_threshold(spark):
    from kafka_streams_plumber_spark.operators.classify import (
        best_threshold,
    )

    # perfect separation: any t in (0.5, 1.0] is F1=1; the swept
    # thresholds are the distinct scores -> both 1.0 and (via tie) the
    # lowest tied one wins: at t=1.0 tp=2 fn=0? scores: pos 1.0,1.0;
    # neg 0.5 -> t=1.0 gives tp=2 fp=0 -> F1=1. t=0.5 gives fp=1.
    rows = [(1.0, True), (1.0, True), (0.5, False)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    r = best_threshold(df, "score", "label").collect()[0]
    assert r["threshold"] == 1.0 and r["f1"] == 1.0

    # two tied-F1 thresholds -> lower (higher recall) wins
    rows = [(0.9, True), (0.6, True), (0.6, False), (0.9, False)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    r = best_threshold(df, "score", "label").collect()[0]
    # t=0.9: tp=1 fp=1 fn=1 -> F1=0.5; t=0.6: tp=2 fp=2 fn=0 -> F1=2/3
    assert r["threshold"] == 0.6


def test_gains_table_hand_computed(spark):
    from kafka_streams_plumber_spark.operators.classify import gains_table

    # 20 rows, scores descending 20..1; positives are the top 5 scores
    rows = [(i, float(21 - i), i <= 5) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "id long, score double, label boolean")
    got = {
        r["bin"]: (r["n"], r["positives"], r["resp_rate"],
                   r["cum_capture"], r["cum_lift"])
        for r in gains_table(
            df, "score", "label", id_col="id", n_bins=5
        ).collect()
    }
    # 5 bins of 4: bin0 = top4 all positive, bin1 has the 5th positive
    assert got[0] == (4, 4, 1.0, 0.8, 4.0)
    assert got[1][1] == 1 and got[1][3] == 1.0  # all positives captured
    # base rate 0.25 -> cumulative lift at bin1 = (5/8)/0.25 = 2.5
    assert got[1][4] == 2.5
    assert got[4][3] == 1.0 and got[4][4] == 1.0  # full population
    assert sum(v[0] for v in got.values()) == 20


def test_gains_table_deterministic_under_score_ties(spark):
    from kafka_streams_plumber_spark.operators.classify import gains_table

    # all scores equal: the id tiebreak fixes bin membership exactly
    rows = [(i, 1.0, i % 2 == 0) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, score double, label boolean")
    a = gains_table(df, "score", "label", id_col="id", n_bins=2).collect()
    b = gains_table(df, "score", "label", id_col="id", n_bins=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # ids 0..4 in bin 0 -> 3 positives (0,2,4); ids 5..9 -> 2 (6,8)
    got = {r["bin"]: r["positives"] for r in a}
    assert got == {0: 3, 1: 2}


def test_best_threshold_no_positives_is_defined(spark):
    """All-negative input: every F1 is 0 and the sweep still returns a
    row (lowest threshold, i.e. highest recall posture) instead of an
    empty frame — the degenerate contract ADVICE r5 asked to pin."""
    from kafka_streams_plumber_spark.operators.classify import (
        best_threshold,
    )

    rows = [(0.9, False), (0.5, False), (0.1, False)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    out = best_threshold(df, "score", "label").collect()
    assert len(out) == 1
    r = out[0]
    assert r["threshold"] == 0.1 and r["f1"] == 0.0
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 3, 0, 0)
    assert r["recall"] is None  # 0/0 positives


def test_best_threshold_empty_input_is_empty(spark):
    from kafka_streams_plumber_spark.operators.classify import (
        best_threshold,
    )

    df = spark.createDataFrame([], "score double, label boolean")
    assert best_threshold(df, "score", "label").collect() == []


def test_krippendorff_alpha_hand_computed(spark):
    """Hand case: u1=[a,a,a], u2=[a,b], u3=[b,b,b,b], u4=[a,b,b],
    u5=[c] (excluded, single rating). n=12, marginals a=5 b=7,
    S = sum (m^2 - sum muc^2)/(m-1) = 0 + 2 + 0 + 2 = 4,
    alpha = 1 - 11*4/(144-74) = 13/35 ~ 0.371429."""
    from kafka_streams_plumber_spark.operators.classify import (
        krippendorff_alpha,
    )

    rows = (
        [("u1", f"r{i}", "a") for i in range(3)]
        + [("u2", "r0", "a"), ("u2", "r1", "b")]
        + [("u3", f"r{i}", "b") for i in range(4)]
        + [("u4", "r0", "a"), ("u4", "r1", "b"), ("u4", "r2", "b")]
        + [("u5", "r0", "c")]
    )
    df = spark.createDataFrame(rows, "unit string, rater string, label string")
    r = krippendorff_alpha(df, "unit", "rater", "label").collect()[0]
    assert r["n_units"] == 4 and r["n_ratings"] == 12
    assert r["n_categories"] == 2
    assert r["alpha"] == round(13 / 35, 6)


def test_krippendorff_alpha_edges(spark):
    """Perfect agreement -> 1.0; all-same-category -> NULL (zero
    expected disagreement); >16 ratings of one unit -> NULL alpha with
    counts intact (the documented lcm-device bound)."""
    from kafka_streams_plumber_spark.operators.classify import (
        krippendorff_alpha,
    )

    perfect = [("u1", "r1", "x"), ("u1", "r2", "x"), ("u2", "r1", "y"), ("u2", "r2", "y")]
    df = spark.createDataFrame(perfect, "unit string, rater string, label string")
    assert krippendorff_alpha(df, "unit", "rater", "label").collect()[0]["alpha"] == 1.0

    same = [("u1", "r1", "x"), ("u1", "r2", "x"), ("u2", "r1", "x")]
    df = spark.createDataFrame(same, "unit string, rater string, label string")
    r = krippendorff_alpha(df, "unit", "rater", "label").collect()[0]
    assert r["alpha"] is None  # n^2 == sum nc^2: no expected disagreement

    big = [("u1", f"r{i}", "x" if i % 2 else "y") for i in range(17)]
    df = spark.createDataFrame(big, "unit string, rater string, label string")
    r = krippendorff_alpha(df, "unit", "rater", "label").collect()[0]
    assert r["n_ratings"] == 17 and r["alpha"] is None


def _ref_krippendorff(ratings, level):
    """Pure-Python textbook coincidence form (independent of the Spark
    implementation): D_o from within-unit pairs with 1/(m_u-1)
    weights, D_e from the marginals, ordinal scores = cumulative
    marginal minus half own count."""
    from collections import defaultdict
    from itertools import combinations

    units = defaultdict(list)
    for u, v in ratings:
        units[u].append(v)
    units = {u: vs for u, vs in units.items() if len(vs) >= 2}
    allv = [v for vs in units.values() for v in vs]
    n = len(allv)
    cats = sorted(set(allv))
    nc = {c: allv.count(c) for c in cats}
    if level == "interval":
        delta = lambda a, b: (a - b) ** 2  # noqa: E731
    else:  # ordinal
        cum, t = {}, 0
        for c in cats:
            t += nc[c]
            cum[c] = t
        s = {c: cum[c] - nc[c] / 2.0 for c in cats}
        delta = lambda a, b: (s[a] - s[b]) ** 2  # noqa: E731
    d_o = 0.0
    for vs in units.values():
        m = len(vs)
        d_o += sum(delta(a, b) for a, b in combinations(vs, 2)) * 2 / (m - 1)
    d_o /= n
    d_e = sum(
        nc[a] * nc[b] * delta(a, b) for a in cats for b in cats
    ) / (n * (n - 1))
    return 1 - d_o / d_e


def test_krippendorff_interval_and_ordinal_vs_reference(spark):
    """Interval/ordinal alpha equals the independent pure-Python
    coincidence-matrix computation (missing data, ties, an excluded
    single-rating unit), and the levels order as the metric implies
    on this panel. Also: interval alpha is scale-invariant over the
    quantization grid, and perfect agreement gives 1.0 at both
    levels."""
    from kafka_streams_plumber_spark.operators.classify import (
        krippendorff_alpha,
    )

    panel = (
        [("u1", "a", 1.0), ("u1", "b", 1.0), ("u1", "c", 2.0)]
        + [("u2", "a", 2.0), ("u2", "b", 3.0)]
        + [("u3", "a", 3.0), ("u3", "b", 3.0), ("u3", "c", 3.0)]
        + [("u4", "a", 4.0), ("u4", "b", 5.0), ("u4", "c", 4.0)]
        + [("u5", "a", 1.0), ("u5", "c", 5.0)]
        + [("u6", "a", 2.0)]  # single rating: excluded
    )
    df = spark.createDataFrame(panel, "u string, r string, v double")
    pairs = [(u, v) for u, _r, v in panel]
    for level in ("interval", "ordinal"):
        got = krippendorff_alpha(df, "u", "r", "v", level=level).collect()[0]
        assert got["n_units"] == 5 and got["n_ratings"] == 13
        assert got["n_categories"] == 5
        assert got["alpha"] == round(_ref_krippendorff(pairs, level), 6)

    perfect = spark.createDataFrame(
        [("u1", "r1", 2.0), ("u1", "r2", 2.0), ("u2", "r1", 7.0), ("u2", "r2", 7.0)],
        "u string, r string, v double",
    )
    for level in ("interval", "ordinal"):
        assert (
            krippendorff_alpha(perfect, "u", "r", "v", level=level)
            .collect()[0]["alpha"]
            == 1.0
        )

    # constant ratings: zero expected disagreement -> NULL, both levels
    const = spark.createDataFrame(
        [("u1", "r1", 3.0), ("u1", "r2", 3.0)], "u string, r string, v double"
    )
    for level in ("interval", "ordinal"):
        assert (
            krippendorff_alpha(const, "u", "r", "v", level=level)
            .collect()[0]["alpha"]
            is None
        )

    # unknown level is an explicit error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        krippendorff_alpha(df, "u", "r", "v", level="ratio")


def test_fleiss_kappa_wikipedia_table(spark):
    """The classic 10-subject x 14-rater x 5-category Fleiss table:
    spark output equals an independent pure-Python computation of
    (P_bar - P_e)/(1 - P_e) and lands at the published ~0.210."""
    from kafka_streams_plumber_spark.operators.classify import fleiss_kappa

    counts = [
        [0, 0, 0, 0, 14],
        [0, 2, 6, 4, 2],
        [0, 0, 3, 5, 6],
        [0, 3, 9, 2, 0],
        [2, 2, 8, 1, 1],
        [7, 7, 0, 0, 0],
        [3, 2, 6, 3, 0],
        [2, 5, 3, 2, 2],
        [6, 5, 2, 1, 0],
        [0, 2, 2, 3, 7],
    ]
    rows = []
    for u, row in enumerate(counts):
        r = 0
        for cat, c in enumerate(row):
            for _ in range(c):
                rows.append((f"u{u}", f"r{r}", f"cat{cat}"))
                r += 1
    df = spark.createDataFrame(rows, "unit string, rater string, label string")
    got = fleiss_kappa(df, "unit", "rater", "label", n_raters=14).collect()[0]
    assert got["n_units"] == 10 and got["n_raters"] == 14
    assert got["n_categories"] == 5

    # independent reference: textbook P_bar / P_e
    n, big_n = 14, len(counts)
    p_bar = sum(
        (sum(c * c for c in row) - n) / (n * (n - 1)) for row in counts
    ) / big_n
    marg = [sum(row[j] for row in counts) / (big_n * n) for j in range(5)]
    p_e = sum(p * p for p in marg)
    assert got["kappa"] == round((p_bar - p_e) / (1 - p_e), 6)
    assert 0.20 < got["kappa"] < 0.22  # published value ~0.210

    # unit with the wrong rater count is excluded
    rows.append(("u_bad", "r0", "cat0"))
    df2 = spark.createDataFrame(rows, "unit string, rater string, label string")
    g2 = fleiss_kappa(df2, "unit", "rater", "label", n_raters=14).collect()[0]
    assert g2["n_units"] == 10 and g2["kappa"] == got["kappa"]


def test_fleiss_kappa_numeric_labels_collapse_numerically(spark):
    """Duplicate (unit, rater) rows collapse to their MIN on the
    NATIVE column type: for integer labels min(9, 10) = 9, not the
    lexicographic min("10", "9") = "10"."""
    from kafka_streams_plumber_spark.operators.classify import fleiss_kappa

    # rater r0 double-rates u0 with 10 and 9 -> must collapse to 9,
    # making u0 unanimous on 9 and u1 unanimous on 9: kappa = 1.0.
    rows = [
        ("u0", "r0", 10),
        ("u0", "r0", 9),
        ("u0", "r1", 9),
        ("u1", "r0", 9),
        ("u1", "r1", 9),
    ]
    df = spark.createDataFrame(rows, "unit string, rater string, label int")
    got = fleiss_kappa(df, "unit", "rater", "label", n_raters=2).collect()[0]
    assert got["n_categories"] == 1 and got["n_units"] == 2
    # unanimity on one category: P_bar = 1, P_e = 1 -> 0/0 = NULL in
    # the multiplied-through form; the point here is the collapse
    # left ONE category, not two.

    # a split panel where the lexicographic collapse would flip the
    # answer: with min(10,9)=9 u0 agrees (9,9); with "10" it wouldn't.
    rows2 = rows + [("u2", "r0", 9), ("u2", "r1", 10)]
    g2 = fleiss_kappa(
        spark.createDataFrame(rows2, "unit string, rater string, label int"),
        "unit",
        "rater",
        "label",
        n_raters=2,
    ).collect()[0]
    assert g2["n_categories"] == 2 and g2["n_units"] == 3


def test_cronbach_alpha_reference_and_edges(spark):
    """4 units x 3 items: spark equals the independent pure-Python
    k/(k-1)*(1 - sum var_i / var_total); an incomplete unit is
    listwise-dropped; constant totals give NULL."""
    from kafka_streams_plumber_spark.operators.classify import cronbach_alpha

    mat = {  # unit -> (i0, i1, i2)
        "u0": (2.0, 3.0, 2.5),
        "u1": (4.0, 4.5, 4.0),
        "u2": (1.0, 1.5, 2.0),
        "u3": (3.0, 3.5, 3.0),
    }
    rows = [
        (u, f"i{j}", v)
        for u, vs in mat.items()
        for j, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "unit string, item string, v double")
    got = cronbach_alpha(df, "unit", "item", "v").collect()[0]
    assert (got["n_units"], got["n_items"]) == (4, 3)

    # independent reference (population variances; the 1/N factor
    # cancels in the ratio, same as the sample form)
    cols = list(zip(*mat.values()))
    n = len(mat)

    def pvar(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / len(xs)

    totals = [sum(vs) for vs in mat.values()]
    ref = 3 / 2 * (1 - sum(pvar(c) for c in cols) / pvar(totals))
    assert got["alpha"] is not None
    assert abs(got["alpha"] - ref) < 1e-6

    # incomplete unit dropped, result unchanged
    df2 = spark.createDataFrame(
        rows + [("u4", "i0", 9.0)], "unit string, item string, v double"
    )
    g2 = cronbach_alpha(df2, "unit", "item", "v").collect()[0]
    assert g2["n_units"] == 4 and g2["alpha"] == got["alpha"]

    # constant unit totals -> zero total variance -> NULL
    const = spark.createDataFrame(
        [("a", "i0", 1.0), ("a", "i1", 2.0), ("b", "i0", 2.0), ("b", "i1", 1.0)],
        "unit string, item string, v double",
    )
    assert cronbach_alpha(const, "unit", "item", "v").collect()[0]["alpha"] is None


def test_cohen_kappa_hand_computed_unweighted(spark):
    """Classic 2x2: 20 yes/yes, 15 no/no, 10 yes/no, 5 no/yes ->
    p_o = 0.7, p_e = 0.5, kappa = 0.4; NULL labels drop the pair."""
    from kafka_streams_plumber_spark.operators.classify import cohen_kappa

    rows = (
        [("yes", "yes")] * 20
        + [("no", "no")] * 15
        + [("yes", "no")] * 10
        + [("no", "yes")] * 5
        + [(None, "yes"), ("no", None)]
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert (r["n_items"], r["n_categories"]) == (50, 2)
    assert r["disagree_obs"] == 0.3 and r["disagree_exp"] == 0.5
    assert r["kappa"] == 0.4


def test_cohen_kappa_weighted_hand_computed(spark):
    """Ordinal labels 1..3, pairs (1,1),(1,2),(2,3),(3,3),(2,2):
    quadratic D_o=2, D_e=32 -> kappa = 22/32 = 0.6875; linear
    D_e=22 -> kappa = 12/22. Numeric labels must index numerically."""
    from kafka_streams_plumber_spark.operators.classify import cohen_kappa

    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3), (3, 3), (2, 2)], "a int, b int"
    )
    q = cohen_kappa(df, "a", "b", weights="quadratic").collect()[0]
    assert (q["n_items"], q["n_categories"]) == (5, 3)
    assert q["disagree_obs"] == 0.4 and q["disagree_exp"] == 1.28
    assert q["kappa"] == 0.6875
    lin = cohen_kappa(df, "a", "b", weights="linear").collect()[0]
    assert lin["kappa"] == round(12 / 22, 6)


def test_cohen_kappa_degenerate_one_category(spark):
    """All labels one category: expected disagreement 0 -> NULL kappa
    (not NaN, not 1.0)."""
    from kafka_streams_plumber_spark.operators.classify import cohen_kappa

    df = spark.createDataFrame([("x", "x")] * 4, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r["kappa"] is None and r["disagree_obs"] == 0.0


def test_mcnemar_hand_computed(spark):
    """only_a=15, only_b=5: corrected chi2 = 81/20 = 4.05, uncorrected
    = 5.0; no discordant pairs -> NULL chi2."""
    from kafka_streams_plumber_spark.operators.classify import mcnemar

    rows = (
        [(True, True)] * 59
        + [(False, False)] * 21
        + [(True, False)] * 15
        + [(False, True)] * 5
        + [(None, True)]
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = mcnemar(df, "a", "b").collect()[0]
    assert (r["n_pairs"], r["both_correct"], r["both_wrong"]) == (100, 59, 21)
    assert (r["only_a"], r["only_b"]) == (15, 5)
    assert r["chi2"] == 4.05
    u = mcnemar(df, "a", "b", corrected=False).collect()[0]
    assert u["chi2"] == 5.0

    conc = spark.createDataFrame(
        [(True, True), (False, False)], "a boolean, b boolean"
    )
    assert mcnemar(conc, "a", "b").collect()[0]["chi2"] is None


def test_kendall_w_hand_computed(spark):
    """3 raters x 4 items, no ties: rank sums 4,6,8,12 -> S=35,
    W = 420/540 = 0.777778, chi2 = m(n-1)W = 7.0."""
    from kafka_streams_plumber_spark.operators.classify import kendall_w

    ranks = {
        "r1": [1.0, 2.0, 3.0, 4.0],
        "r2": [1.0, 3.0, 2.0, 4.0],
        "r3": [2.0, 1.0, 3.0, 4.0],
    }
    rows = [
        (f"i{j}", r, v)
        for r, vs in ranks.items()
        for j, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "item string, rater string, s double")
    r = kendall_w(df, "item", "rater", "s", n_raters=3).collect()[0]
    assert (r["n_items"], r["n_raters"]) == (4, 3)
    assert r["w"] == 0.777778
    assert r["chi2"] == 7.0


def test_kendall_w_ties_and_incomplete(spark):
    """2 raters x 3 items with a tie block in rater 2 (midranks
    1.5/1.5/3): W = 78/84 = 0.928571 via the doubled-rank device; an
    item missing one rating is excluded; per-rater constant scores
    with n_raters tying everything -> NULL W."""
    from kafka_streams_plumber_spark.operators.classify import kendall_w

    rows = [
        ("a", "r1", 1.0), ("b", "r1", 2.0), ("c", "r1", 3.0),
        ("a", "r2", 5.0), ("b", "r2", 5.0), ("c", "r2", 9.0),
        ("d", "r1", 7.0),  # incomplete: only rater 1
    ]
    df = spark.createDataFrame(rows, "item string, rater string, s double")
    r = kendall_w(df, "item", "rater", "s", n_raters=2).collect()[0]
    assert r["n_items"] == 3
    assert r["w"] == 0.928571

    allt = spark.createDataFrame(
        [(i, rt, 1.0) for i in "abc" for rt in ("r1", "r2")],
        "item string, rater string, s double",
    )
    assert (
        kendall_w(allt, "item", "rater", "s", n_raters=2).collect()[0]["w"]
        is None
    )


def test_cochran_q_hand_computed(spark):
    """4 items x 3 systems: C=(3,2,1), R=(1,2,0,3) -> Q = 2*(3*14-36)
    / (3*6-14) = 3.0; an incomplete item is excluded; an all-success
    panel has zero denominator -> NULL."""
    from kafka_streams_plumber_spark.operators.classify import cochran_q

    out = {
        "t1": [1, 1, 0, 1],
        "t2": [0, 1, 0, 1],
        "t3": [0, 0, 0, 1],
    }
    rows = [
        (f"i{j}", t, bool(v))
        for t, vs in out.items()
        for j, v in enumerate(vs)
    ] + [("i9", "t1", True)]  # incomplete: only one treatment
    df = spark.createDataFrame(rows, "item string, trt string, y boolean")
    r = cochran_q(df, "item", "trt", "y", n_treatments=3).collect()[0]
    assert (r["n_items"], r["k"], r["df"]) == (4, 3, 2)
    assert r["q"] == 3.0

    alls = spark.createDataFrame(
        [(i, t, True) for i in "ab" for t in ("t1", "t2")],
        "item string, trt string, y boolean",
    )
    assert (
        cochran_q(alls, "item", "trt", "y", n_treatments=2)
        .collect()[0]["q"]
        is None
    )


def test_icc_shrout_fleiss_reference_panel(spark):
    """The Shrout-Fleiss (1979) 6-target x 4-judge table, checked
    against an independent pure-Python two-way ANOVA: ICC(2,1) ~
    0.2898, ICC(3,1) ~ 0.7148; an incomplete item is excluded."""
    from kafka_streams_plumber_spark.operators.classify import icc

    judges = {
        "j1": [9.0, 6.0, 8.0, 7.0, 10.0, 6.0],
        "j2": [2.0, 1.0, 4.0, 1.0, 5.0, 2.0],
        "j3": [5.0, 3.0, 6.0, 2.0, 6.0, 4.0],
        "j4": [8.0, 2.0, 8.0, 6.0, 9.0, 7.0],
    }
    n, k = 6, 4
    vals = [[judges[j][i] for j in sorted(judges)] for i in range(n)]
    t = sum(sum(row) for row in vals)
    q = sum(x * x for row in vals for x in row)
    r2 = sum(sum(row) ** 2 for row in vals)
    c2 = sum(
        sum(vals[i][j] for i in range(n)) ** 2 for j in range(k)
    )
    b = n * r2 - t * t
    c = k * c2 - t * t
    e = (n * k * q - t * t) - b - c
    num = n * (k - 1) * b - n * e
    icc2 = num / (n * (k - 1) * b + n * (k - 1) * e + k * (n - 1) * c - k * e)
    icc3 = num / (n * (k - 1) * b + n * (k - 1) * e)
    assert abs(icc2 - 0.2898) < 0.001 and abs(icc3 - 0.7148) < 0.001

    rows = [
        (f"i{i}", j, judges[j][i])
        for j in judges
        for i in range(n)
    ] + [("i99", "j1", 5.0)]
    df = spark.createDataFrame(rows, "item string, rater string, v double")
    r = icc(df, "item", "rater", "v", n_raters=4).collect()[0]
    assert (r["n_items"], r["n_raters"]) == (6, 4)
    assert r["icc2_1"] == round(icc2, 6)
    assert r["icc3_1"] == round(icc3, 6)


def test_icc_degenerate_constant_panel(spark):
    """A constant panel has zero everything -> NULL ICCs (not NaN)."""
    from kafka_streams_plumber_spark.operators.classify import icc

    rows = [(i, rt, 3.0) for i in "abc" for rt in ("r1", "r2")]
    df = spark.createDataFrame(rows, "item string, rater string, v double")
    r = icc(df, "item", "rater", "v", n_raters=2).collect()[0]
    assert r["icc2_1"] is None and r["icc3_1"] is None


def test_classification_report_hand_computed(spark):
    """3-class confusion: a predicted-only class gets NULL recall with
    support 0, a never-predicted class gets NULL precision, f1 =
    2tp/(support+predicted) avoids compounding rounded p/r."""
    from kafka_streams_plumber_spark.operators.classify import (
        classification_report,
    )

    pairs = (
        [("cat", "cat")] * 4
        + [("cat", "dog")] * 2
        + [("dog", "dog")] * 3
        + [("dog", "cat")] * 1
        + [("bird", "cat")] * 2  # bird never predicted
        + [(None, "cat"), ("cat", None)]
    )
    df = spark.createDataFrame(pairs, "label string, pred string")
    got = {
        r["label"]: r
        for r in classification_report(df, "label", "pred").collect()
    }
    assert set(got) == {"cat", "dog", "bird"}
    c = got["cat"]
    assert (c["support"], c["predicted"], c["tp"]) == (6, 7, 4)
    assert c["precision"] == round(4 / 7, 6)
    assert c["recall"] == round(4 / 6, 6)
    assert c["f1"] == round(8 / 13, 6)
    b = got["bird"]
    assert (b["support"], b["predicted"], b["tp"]) == (2, 0, 0)
    assert b["precision"] is None and b["recall"] == 0.0 and b["f1"] == 0.0

    onlypred = spark.createDataFrame(
        [("x", "y")], "label string, pred string"
    )
    g2 = {
        r["label"]: r
        for r in classification_report(onlypred, "label", "pred").collect()
    }
    assert g2["y"]["support"] == 0 and g2["y"]["recall"] is None


def test_brier_decomposition_hand_computed(spark):
    """Calibrated panel: brier 0.16 = 0 - 0.09 + 0.25 exactly;
    miscalibrated panel: 0.25 = 0.066667 - 0.026667 + 0.21. The
    Murphy identity holds exactly on the distinct-forecast grain."""
    from kafka_streams_plumber_spark.operators.classify import (
        brier_decomposition,
    )

    cal = [(0.2, i == 0) for i in range(5)] + [
        (0.8, i != 0) for i in range(5)
    ]
    df = spark.createDataFrame(cal, "p double, y boolean")
    r = brier_decomposition(df, "p", "y").collect()[0]
    assert (r["n"], r["base_rate"]) == (10, 0.5)
    assert r["brier"] == 0.16
    assert r["reliability"] == 0.0
    assert r["resolution"] == 0.09
    assert r["uncertainty"] == 0.25

    mis = [(0.9, i < 2) for i in range(4)] + [
        (0.1, i == 0) for i in range(6)
    ]
    df2 = spark.createDataFrame(mis, "p double, y boolean")
    m = brier_decomposition(df2, "p", "y").collect()[0]
    assert m["brier"] == 0.25
    assert m["reliability"] == 0.066667
    assert m["resolution"] == 0.026667
    assert m["uncertainty"] == 0.21
    assert (
        round(m["reliability"] - m["resolution"] + m["uncertainty"], 6)
        == m["brier"]
    )


def test_isotonic_calibration_matches_pav_stack(spark):
    """The minimax identity equals the sequential pool-adjacent-
    violators stack: the classic [1,0,0,1] panel pools to
    [1/3,1/3,1/3,1], and a deterministic pseudo-random weighted panel
    matches the weighted PAV reference at every distinct score; the
    output is monotone nondecreasing."""
    from kafka_streams_plumber_spark.operators.classify import (
        isotonic_calibration,
    )

    def pav(points):
        # points: list of (weight, mean) in score order
        stack = []
        for w, v in points:
            stack.append([w, v])
            while len(stack) > 1 and stack[-2][1] >= stack[-1][1] - 1e-15:
                w2, v2 = stack.pop()
                w1, v1 = stack.pop()
                stack.append(
                    [w1 + w2, (w1 * v1 + w2 * v2) / (w1 + w2)]
                )
        out = []
        for w, v in stack:
            out += [v] * 1  # one entry per block; expand by weight later
        # expand blocks back to per-point fits
        fits = []
        i = 0
        for w, v in stack:
            fits.append((w, v))
        return stack

    simple = [(0.1, True), (0.2, False), (0.3, False), (0.4, True)]
    df = spark.createDataFrame(simple, "s double, y boolean")
    got = {
        r["score"]: r["calibrated"]
        for r in isotonic_calibration(df, "s", "y").collect()
    }
    third = round(1.0 / 3.0, 6)
    assert got == {0.1: third, 0.2: third, 0.3: third, 0.4: 1.0}

    # weighted pseudo-random panel
    rows, s = [], 3
    for i in range(120):
        s = (s * 1103515245 + 12345) % (2**31)
        sc = (s % 20) / 20.0
        s = (s * 1103515245 + 12345) % (2**31)
        rows.append((sc, (s % 100) < 100 * sc * 0.7 + 10))
    df2 = spark.createDataFrame(rows, "s double, y boolean")
    got2 = sorted(
        (r["score"], r["n"], r["calibrated"])
        for r in isotonic_calibration(df2, "s", "y").collect()
    )
    # reference: weighted PAV over per-score means in score order
    import collections

    agg = collections.defaultdict(lambda: [0, 0])
    for sc, y in rows:
        agg[round(sc, 3)][0] += 1
        agg[round(sc, 3)][1] += 1 if y else 0
    pts = [(n, p / n) for sc, (n, p) in sorted(agg.items())]
    blocks = pav(pts)
    fits = []
    for w, v in blocks:
        fits += [v] * 1
    # expand block fits to per-score fits
    per_score = []
    bi, used = 0, 0
    for sc, (n, p) in sorted(agg.items()):
        while used >= blocks[bi][0] - 1e-9:
            bi += 1
            used = 0
        per_score.append((sc, n, blocks[bi][1]))
        used += n
    for (sc, n, cal), (rsc, rn, rcal) in zip(got2, per_score):
        assert sc == rsc and n == rn
        assert abs(cal - rcal) < 1e-6, (sc, cal, rcal)
    cals = [c for _, _, c in got2]
    assert all(a <= b + 1e-9 for a, b in zip(cals, cals[1:]))


def test_average_precision_hand_computed(spark):
    """Perfect ranking -> AP = 1; the classic sklearn example
    y=[0,0,1,1], scores=[0.1,0.4,0.35,0.8] -> AP = 0.833333;
    no positives -> NULL."""
    from kafka_streams_plumber_spark.operators.classify import (
        average_precision,
    )

    perfect = spark.createDataFrame(
        [(0.9, True), (0.8, True), (0.3, False), (0.1, False)],
        "s double, y boolean",
    )
    assert average_precision(perfect, "s", "y").collect()[0]["ap"] == 1.0

    sk = spark.createDataFrame(
        [(0.1, False), (0.4, False), (0.35, True), (0.8, True)],
        "s double, y boolean",
    )
    r = average_precision(sk, "s", "y").collect()[0]
    assert (r["n"], r["n_pos"]) == (4, 2)
    assert r["ap"] == 0.833333

    neg = spark.createDataFrame(
        [(0.5, False), (0.2, False)], "s double, y boolean"
    )
    assert average_precision(neg, "s", "y").collect()[0]["ap"] is None


def test_average_precision_tied_scores_threshold_grain(spark):
    """Ties collapse to one threshold: scores all equal -> one
    threshold, AP = precision = pos/n (the step integral with a
    single step)."""
    from kafka_streams_plumber_spark.operators.classify import (
        average_precision,
    )

    df = spark.createDataFrame(
        [(0.5, True), (0.5, False), (0.5, False), (0.5, True)],
        "s double, y boolean",
    )
    assert average_precision(df, "s", "y").collect()[0]["ap"] == 0.5


def test_mcc_multiclass_hand_computed(spark):
    """Binary case matches the textbook MCC closed form; a constant
    predictor scores NULL (zero predicted variance) while accuracy
    still reads 0.75 — the imbalance failure MCC exists to catch."""
    import math

    from kafka_streams_plumber_spark.operators.classify import (
        mcc_multiclass,
    )

    # tp=4 fn=1 fp=2 tn=3
    rows = (
        [("p", "p")] * 4 + [("p", "n")] * 1
        + [("n", "p")] * 2 + [("n", "n")] * 3
    )
    df = spark.createDataFrame(rows, "l string, p string")
    r = mcc_multiclass(df, "l", "p").collect()[0]
    tp, fn, fp, tn = 4, 1, 2, 3
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert (r["n"], r["k_classes"]) == (10, 2)
    assert abs(r["mcc"] - mcc) < 1e-6

    const = spark.createDataFrame(
        [("a", "a")] * 3 + [("b", "a")], "l string, p string"
    )
    rc = mcc_multiclass(const, "l", "p").collect()[0]
    assert rc["accuracy"] == 0.75 and rc["mcc"] is None


def test_mcc_multiclass_perfect_and_permuted(spark):
    """Perfect 3-class prediction -> 1.0; a derangement of balanced
    classes -> -0.5 (the R_K floor for k=3)."""
    from kafka_streams_plumber_spark.operators.classify import (
        mcc_multiclass,
    )

    perfect = spark.createDataFrame(
        [(c, c) for c in "abc" for _ in range(4)], "l string, p string"
    )
    assert mcc_multiclass(perfect, "l", "p").collect()[0]["mcc"] == 1.0

    rot = {"a": "b", "b": "c", "c": "a"}
    wrong = spark.createDataFrame(
        [(c, rot[c]) for c in "abc" for _ in range(4)],
        "l string, p string",
    )
    assert mcc_multiclass(wrong, "l", "p").collect()[0]["mcc"] == -0.5


def test_krippendorff_interval_decimal_sum_fail_loud_past_envelope(spark):
    """r10 long-sum audit: the per-unit scored sum now accumulates on
    decimal. A unit sum past 2^63 (16 raters at ~6e11 -> 9.6e18)
    necessarily also blows the n * sum(s^2) < 10^38 decimal envelope,
    so alpha goes NULL (fail-loud) — where the OLD long sum wrapped it
    to -8.8e18 whose downstream squares still FIT, i.e. silently wrong
    alpha. At the largest magnitudes the envelope admits (~3e17
    scaled, far past double-int precision) the decimal path is exact
    against the independent pure-Python coincidence computation."""
    from kafka_streams_plumber_spark.operators.classify import (
        krippendorff_alpha,
    )

    def run(u1, u2):
        rows = [("u1", f"r{i}", v) for i, v in enumerate(u1)] + [
            ("u2", f"r{i}", v) for i, v in enumerate(u2)
        ]
        df = spark.createDataFrame(rows, "u string, r string, v double")
        return (
            krippendorff_alpha(df, "u", "r", "v", level="interval")
            .collect()[0],
            [(u, v) for u, _r, v in rows],
        )

    w1 = [5.5e11] * 8 + [6.5e11] * 8
    assert sum(round(v * 10**6) for v in w1) > 2**63 - 1
    got, _ = run(w1, [0.0] * 8 + [1.0e10] * 8)
    assert got["n_units"] == 2 and got["n_ratings"] == 32
    assert got["alpha"] is None  # fail-loud, never wrapped garbage

    s1 = [4.5e8, 5.5e8] * 8
    assert 2**52 < sum(round(v * 10**6) for v in s1) < 2**63 - 1
    got2, pairs = run(s1, [0.0, 1.0e7] * 8)
    ref = _ref_krippendorff(pairs, "interval")
    assert got2["alpha"] is not None
    assert abs(got2["alpha"] - ref) < 1e-5  # ~0.979133; unit sums at
    # 8e15 sit past double-int precision, inside the L*de envelope


def test_cronbach_alpha_decimal_sum_fail_loud_past_envelope(spark):
    """r10 long-sum audit: the per-unit total score _y now accumulates
    on decimal. A unit total PAST 2^63 (16 items at ~6e11 -> 9.6e18)
    necessarily also blows the N * sum(_y^2) < 10^38 decimal envelope,
    so the kernel goes NULL (fail-loud) — where the OLD long sum
    wrapped _y to -8.8e18 whose square still FIT the envelope, i.e.
    a silently wrong alpha. Below the wrap threshold the decimal path
    is exact out to the true envelope bound (second fixture)."""
    from kafka_streams_plumber_spark.operators.classify import cronbach_alpha

    def run(mat):
        rows = [
            (u, f"i{j}", v)
            for u, vs in mat.items()
            for j, v in enumerate(vs)
        ]
        df = spark.createDataFrame(
            rows, "unit string, item string, v double"
        )
        return cronbach_alpha(df, "unit", "item", "v").collect()[0]

    def ref_alpha(mat):
        def pvar(xs):
            m = sum(xs) / len(xs)
            return sum((x - m) ** 2 for x in xs) / len(xs)

        cols = list(zip(*mat.values()))
        totals = [sum(vs) for vs in mat.values()]
        return 16 / 15 * (1 - sum(pvar(c) for c in cols) / pvar(totals))

    wrap = {"u1": [5.5e11, 6.5e11] * 8, "u2": [0.0, 1.0e10] * 8}
    assert sum(round(v * 10**6) for v in wrap["u1"]) > 2**63 - 1
    got = run(wrap)
    assert (got["n_units"], got["n_items"]) == (2, 16)
    assert got["alpha"] is None  # fail-loud, never wrapped garbage

    sub = {"u1": [0.9e11, 1.1e11] * 8, "u2": [0.0, 1.0e10] * 8}
    y1 = sum(round(v * 10**6) for v in sub["u1"])
    assert 2**60 < y1 < 2**63 - 1  # far past double-int precision,
    # under the wrap threshold, inside the k*vy decimal envelope
    got2 = run(sub)
    assert got2["alpha"] is not None
    assert abs(got2["alpha"] - ref_alpha(sub)) < 1e-5  # ~0.999815


def test_icc_decimal_sum_fail_loud_past_envelope(spark):
    """r10 long-sum audit: the per-unit row sum _ri and per-rater
    column sum _c now accumulate on decimal. A row sum PAST 2^63 (16
    raters at ~6e11 -> 9.6e18) necessarily also blows the
    n*k*sum(s^2) < 10^38 decimal envelope, so the kernel goes NULL
    (fail-loud) — where the OLD long sum wrapped _ri to -8.8e18 whose
    square still FIT, i.e. silently wrong ICCs. Below the wrap
    threshold the decimal path is exact out to the true envelope
    bound, checked against the independent two-way-ANOVA identity on
    exact scaled integers."""
    from kafka_streams_plumber_spark.operators.classify import icc

    def run(vals):
        rows = [
            (f"u{i}", f"r{j}", vals[i][j])
            for i in range(2)
            for j in range(16)
        ]
        df = spark.createDataFrame(
            rows, "item string, rater string, v double"
        )
        return icc(df, "item", "rater", "v", n_raters=16).collect()[0]

    wrap = [[5.5e11, 6.5e11] * 8, [0.0, 1.0e10] * 8]
    assert sum(round(v * 10**6) for v in wrap[0]) > 2**63 - 1
    got = run(wrap)
    assert (got["n_items"], got["n_raters"]) == (2, 16)
    assert got["icc2_1"] is None and got["icc3_1"] is None  # fail-loud

    vals = [[0.7e11, 0.8e11] * 8, [float(j) * 1e9 for j in range(16)]]
    sv = [[round(v * 10**6) for v in row] for row in vals]
    assert 2**60 < sum(sv[0]) < 2**63 - 1
    got2 = run(vals)

    nI, k = 2, 16
    t = sum(sum(r) for r in sv)
    q = sum(x * x for r in sv for x in r)
    r2 = sum(sum(r) ** 2 for r in sv)
    c2 = sum(sum(sv[i][j] for i in range(nI)) ** 2 for j in range(k))
    b = nI * r2 - t * t
    c = k * c2 - t * t
    e = (nI * k * q - t * t) - b - c
    num = nI * (k - 1) * b - nI * e
    icc2 = num / (
        nI * (k - 1) * b + nI * (k - 1) * e + k * (nI - 1) * c - k * e
    )
    icc3 = num / (nI * (k - 1) * b + nI * (k - 1) * e)
    assert got2["icc2_1"] is not None and got2["icc3_1"] is not None
    assert abs(got2["icc2_1"] - icc2) < 1e-5  # ~0.989282
    assert abs(got2["icc3_1"] - icc3) < 1e-5  # ~0.99043


def test_reliability_kernels_fail_loud_on_sign_mixed_overflow(spark):
    """Code-review r10: a sign-MIXED past-envelope unit NULLs a summed
    decimal term (its square-sum overflows while its value sums
    cancel), and F.sum would silently SKIP it while the row counts
    still include it — cronbach_alpha demonstrably returned the
    impossible alpha = 2.0. The paired-count guards must NULL all
    three reliability kernels on such inputs instead."""
    from kafka_streams_plumber_spark.operators.classify import (
        cronbach_alpha,
        icc,
        krippendorff_alpha,
    )

    # cronbach: units at +/-6e12 (each row inside the per-row
    # contract) whose totals +/-1.2e19 fail the dec19 cast, with
    # normal units alongside
    rows = (
        [("u1", "i0", 6.0e12), ("u1", "i1", 6.0e12)]
        + [("u2", "i0", -6.0e12), ("u2", "i1", -6.0e12)]
        + [("u3", "i0", 1.0), ("u3", "i1", 2.0)]
        + [("u4", "i0", 2.0), ("u4", "i1", 1.0)]
    )
    df = spark.createDataFrame(rows, "unit string, item string, v double")
    got = cronbach_alpha(df, "unit", "item", "v").collect()[0]
    assert got["n_units"] == 4
    assert got["alpha"] is None  # was 2.0 before the paired-count guard

    # icc: one unit alternating +/-6e12 — its _ri cancels to ~0 while
    # its _qi square-sum passes 10^38 and NULLs
    rows2 = [
        ("u1", f"r{j}", v)
        for j, v in enumerate([6.0e12, -6.0e12] * 8)
    ] + [("u2", f"r{j}", float(j)) for j in range(16)]
    df2 = spark.createDataFrame(rows2, "item string, rater string, v double")
    r2 = icc(df2, "item", "rater", "v", n_raters=16).collect()[0]
    assert r2["icc2_1"] is None and r2["icc3_1"] is None

    # krippendorff interval: same sign-mixed unit shape
    rows3 = [
        ("u1", f"r{i}", v) for i, v in enumerate([6.0e12, -6.0e12] * 8)
    ] + [("u2", f"r{i}", float(i)) for i in range(4)]
    df3 = spark.createDataFrame(rows3, "u string, r string, v double")
    r3 = krippendorff_alpha(df3, "u", "r", "v", level="interval").collect()[0]
    assert r3["alpha"] is None


def test_cronbach_alpha_sum_overflow_nulls_not_zero(spark):
    """ADVICE r11: the paired-count guards catch a NULLed summed TERM
    but not a NULL SUM — with ansi off, a decimal(38,0) F.sum overflow
    returns NULL and the surrounding coalesce silently read it as 0.
    Two units with |_y| ~ 7.5e18: each qy_term ~5.6e37 is non-NULL (so
    the counts match) but their sum > 1e38 overflows; alpha must be
    NULL, not a confidently wrong number."""
    from kafka_streams_plumber_spark.operators.classify import cronbach_alpha

    rows = [
        (u, f"i{j}", 3.75e12)
        for u in ("u1", "u2")
        for j in range(2)
    ]
    df = spark.createDataFrame(rows, "unit string, item string, v double")
    got = cronbach_alpha(df, "unit", "item", "v").collect()[0]
    y = 2 * round(3.75e12 * 10**6)
    assert y < 2**63 - 1  # each unit total still fits a long...
    assert 2 * y * y > 10**38 - 1  # ...but the sum of squares overflows
    assert (got["n_units"], got["n_items"]) == (2, 2)
    assert got["alpha"] is None  # fail-loud, never coalesced-to-0 garbage


def test_icc_sum_overflow_nulls_not_zero(spark):
    """ADVICE r11: same NULL-SUM hole in icc's _R2/_C2 — per-term
    squares ~5.6e37 are non-NULL but their sum overflows decimal(38,0);
    the ICC outputs must be NULL."""
    from kafka_streams_plumber_spark.operators.classify import icc

    rows = [
        (f"u{i}", f"r{j}", 3.75e12)
        for i in range(2)
        for j in range(2)
    ]
    df = spark.createDataFrame(rows, "item string, rater string, v double")
    got = icc(df, "item", "rater", "v", n_raters=2).collect()[0]
    ri = 2 * round(3.75e12 * 10**6)
    assert 2 * ri * ri > 10**38 - 1
    assert (got["n_items"], got["n_raters"]) == (2, 2)
    assert got["icc2_1"] is None and got["icc3_1"] is None
