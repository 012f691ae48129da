"""snapshot_diff: classification, null-safety of the row digest,
digest-before-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.diff import row_digest, snapshot_diff


def _classes(df):
    return {r["key"]: r["change"] for r in df.collect()}


def test_added_removed_changed_unchanged(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, s string, v long"
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 99), (4, "d", 40)], "id long, s string, v long"
    )
    got = _classes(snapshot_diff(new, old, "id"))
    # key 2 unchanged -> absent
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_null_vs_empty_string_differ(spark):
    old = spark.createDataFrame([(1, None)], "id long, s string")
    new = spark.createDataFrame([(1, "")], "id long, s string")
    assert _classes(snapshot_diff(new, old, "id")) == {1: "changed"}


def test_compare_cols_subset_ignores_other_columns(spark):
    old = spark.createDataFrame([(1, "x", 5)], "id long, s string, v long")
    new = spark.createDataFrame([(1, "y", 5)], "id long, s string, v long")
    assert _classes(snapshot_diff(new, old, "id", compare_cols=["v"])) == {}


def test_digest_not_field_order_ambiguous(spark):
    # ("ab", "c") must not collide with ("a", "bc")
    df = spark.createDataFrame(
        [("ab", "c"), ("a", "bc")], "x string, y string"
    )
    digests = [
        r["d"] for r in df.select(row_digest(df, ["x", "y"]).alias("d")).collect()
    ]
    assert digests[0] != digests[1]


def test_join_carries_digest_not_wide_row(spark):
    wide = spark.range(10).select(
        F.col("id"), *[(F.col("id") + i).cast("string").alias(f"c{i}") for i in range(8)]
    )
    out = snapshot_diff(wide, wide, "id")
    assert out.columns == ["key", "change"]
    opt = (
        out._jdf.queryExecution().optimizedPlan().toString()
    )
    join_idx = opt.find("Join FullOuter")
    assert join_idx >= 0
    # below the join each side is already reduced to (key, digest): the
    # wide columns feed md5 inside a Project, never cross the join as
    # standalone attributes
    join_cond_line = opt[join_idx : opt.index("\n", join_idx)]
    assert "c3" not in join_cond_line


def test_profile_columns_single_pass_stats(spark):
    from kafka_streams_plumber_spark.operators.diff import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], ["id", "v"]
    )
    p = {r["column"]: r for r in profile_columns(df).collect()}
    assert p["id"]["n_rows"] == 3 and p["id"]["n_nulls"] == 0
    assert p["v"]["n_nulls"] == 1
    assert p["id"]["min_str"] == "1" and p["id"]["max_str"] == "3"


def test_audit_schema_drift_reports_each_issue_kind(spark):
    from kafka_streams_plumber_spark.operators.diff import audit_schema_drift

    old = spark.createDataFrame([(1, "x", 2.0)], ["id", "a", "b"])
    new = spark.createDataFrame([(1, 5, "y")], ["id", "a", "c"])
    issues = {
        (r["column"], r["issue"]) for r in audit_schema_drift(old, new).collect()
    }
    assert ("b", "removed") in issues
    assert ("c", "added") in issues
    assert ("a", "type_changed") in issues


def test_audit_schema_drift_null_rate_jump_threshold(spark):
    from pyspark.sql import functions as F

    from kafka_streams_plumber_spark.operators.diff import audit_schema_drift

    old = spark.range(100).select("id", F.lit("v").alias("a"))
    new = spark.range(100).select(
        "id", F.when(F.col("id") < 30, None).otherwise(F.lit("v")).alias("a")
    )
    got = audit_schema_drift(old, new, null_rate_jump=0.10).collect()
    assert [(r["column"], r["issue"]) for r in got] == [("a", "null_rate_jump")]
    assert audit_schema_drift(old, new, null_rate_jump=0.50).count() == 0


def test_psi_zero_for_identical_distributions(spark):
    from kafka_streams_plumber_spark.operators.diff import population_stability

    df = spark.range(1000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    r = population_stability(df, df, "v", bins=10, lo=0.0, hi=100.0).collect()[0]
    assert r["psi"] == 0.0


def test_psi_grows_with_shift(spark):
    from pyspark.sql import functions as F

    from kafka_streams_plumber_spark.operators.diff import population_stability

    old = spark.range(2000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    mild = old.select((F.col("v") + 5).alias("v"))
    wild = old.select((F.col("v") * 3).alias("v"))
    p_mild = population_stability(old, mild, "v", bins=10, lo=0.0, hi=100.0).collect()[0]["psi"]
    p_wild = population_stability(old, wild, "v", bins=10, lo=0.0, hi=100.0).collect()[0]["psi"]
    assert 0 < p_mild < p_wild
    assert p_wild > 0.25  # "investigate" territory


def test_categorical_psi_detects_new_category(spark):
    from pyspark.sql import functions as F

    from kafka_streams_plumber_spark.operators.diff import categorical_stability

    old = spark.range(1000).select((F.col("id") % 4).cast("string").alias("c"))
    same = categorical_stability(old, old, "c").collect()[0]
    assert same["psi"] == 0.0 and same["n_categories"] == 4
    new = spark.range(1000).select(
        F.when(F.col("id") % 10 == 0, "NEW")
        .otherwise((F.col("id") % 4).cast("string"))
        .alias("c")
    )
    drift = categorical_stability(old, new, "c").collect()[0]
    assert drift["psi"] > 0.25 and drift["n_categories"] == 5


def test_psi_drift_hand_computed(spark):
    """3 days of one feed with a shifting histogram: day 1 has no
    baseline (omitted), days 2-3 match an independent pure-Python
    PSI over the same trailing-window pooled counts."""
    import math

    from kafka_streams_plumber_spark.operators.diff import psi_drift

    # bins=2, lo=0, hi=2 (width 1): v<1 -> bin0, else bin1
    rows = [
        ("a", 1, 0.5),
        ("a", 1, 0.5),
        ("a", 2, 0.5),
        ("a", 2, 1.5),
        ("a", 3, 1.5),
        ("a", 3, 1.5),
    ]
    df = spark.createDataFrame(rows, "g string, d long, v double")
    got = {
        r["day"]: r
        for r in psi_drift(
            df, ["g"], "d", "v", bins=2, lo=0.0, hi=2.0, baseline_days=7
        ).collect()
    }
    assert set(got) == {2, 3}  # day 1 has no baseline

    def ref_psi(cur, base, smooth=1e-6):
        ct, bt = sum(cur), sum(base)
        s = 0.0
        for c, b in zip(cur, base):
            pn, po = c / ct + smooth, b / bt + smooth
            s += round((pn - po) * math.log(pn / po) * 1e9) / 1e9
        return round(s, 6)

    # day 2 current [1,1] vs day-1 baseline [2,0]
    assert got[2]["n_cur"] == 2 and got[2]["n_base"] == 2
    assert got[2]["psi"] == ref_psi([1, 1], [2, 0])
    assert bool(got[2]["drifted"]) is (ref_psi([1, 1], [2, 0]) > 0.25)
    # day 3 current [0,2] vs pooled days-1..2 baseline [3,1]
    assert got[3]["n_cur"] == 2 and got[3]["n_base"] == 4
    assert got[3]["psi"] == ref_psi([0, 2], [3, 1])


def test_psi_drift_calendar_gaps_and_window_bound(spark):
    """The baseline is a RANGE frame over day VALUES: a gap day
    contributes nothing, and a day whose entire trailing window is
    empty is omitted (nothing to compare against)."""
    from kafka_streams_plumber_spark.operators.diff import psi_drift

    # days 1, 2, then a jump to 10: with baseline_days=3 the day-10
    # window covers days 7-9 (all empty) -> day 10 omitted; day 2
    # compares against day 1 only.
    rows = [("a", 1, 0.5), ("a", 2, 0.5), ("a", 10, 0.5)]
    df = spark.createDataFrame(rows, "g string, d long, v double")
    got = psi_drift(
        df, ["g"], "d", "v", bins=2, lo=0.0, hi=2.0, baseline_days=3
    ).collect()
    assert [r["day"] for r in got] == [2]
    assert got[0]["psi"] == 0.0 and not got[0]["drifted"]

    # day 5 with baseline_days=3 sees days 2-4: day 1 ages OUT of the
    # window, day 2 (the only in-window day) is the whole baseline.
    rows2 = [
        ("a", 1, 1.5),
        ("a", 2, 0.5),
        ("a", 5, 0.5),
    ]
    got2 = {
        r["day"]: r
        for r in psi_drift(
            spark.createDataFrame(rows2, "g string, d long, v double"),
            ["g"],
            "d",
            "v",
            bins=2,
            lo=0.0,
            hi=2.0,
            baseline_days=3,
        ).collect()
    }
    # day 5's baseline is day 2's [1, 0] histogram (day 1 excluded):
    # identical to day 5's own -> psi 0
    assert got2[5]["n_base"] == 1 and got2[5]["psi"] == 0.0


def test_psi_drift_groups_are_independent(spark):
    """Feeds never see each other's rows: a drifting feed flags,
    a stable one doesn't, on the same days."""
    from kafka_streams_plumber_spark.operators.diff import psi_drift

    rows = (
        [("stable", d, 0.5) for d in (1, 2, 3) for _ in range(4)]
        + [("drift", 1, 0.5)] * 4
        + [("drift", 2, 0.5)] * 4
        + [("drift", 3, 1.5)] * 4
    )
    df = spark.createDataFrame(rows, "g string, d long, v double")
    got = {
        (r["g"], r["day"]): r
        for r in psi_drift(
            df, ["g"], "d", "v", bins=2, lo=0.0, hi=2.0, baseline_days=7
        ).collect()
    }
    assert got[("stable", 3)]["psi"] == 0.0
    assert not got[("stable", 3)]["drifted"]
    assert got[("drift", 3)]["psi"] > 0.25
    assert got[("drift", 3)]["drifted"]


def test_hist_drift_hand_computed(spark):
    """Same 3-day shifting panel as the psi_drift test: the sup-CDF
    distance matches hand arithmetic on the exact cross-multiplied
    integers; day 1 (no baseline) is omitted."""
    from kafka_streams_plumber_spark.operators.diff import hist_drift

    rows = [
        ("a", 1, 0.5),
        ("a", 1, 0.5),
        ("a", 2, 0.5),
        ("a", 2, 1.5),
        ("a", 3, 1.5),
        ("a", 3, 1.5),
    ]
    df = spark.createDataFrame(rows, "g string, d long, v double")
    got = {
        r["day"]: r
        for r in hist_drift(
            df, ["g"], "d", "v", bins=2, lo=0.0, hi=2.0, baseline_days=7
        ).collect()
    }
    assert set(got) == {2, 3}
    # day 2: cur [1,1] cum [1,2]; base [2,0] cum [2,2]; N=2, B=2
    # sup |1*2-2*2|, |2*2-2*2| = 2 -> 2/(2*2) = 0.5
    assert got[2]["ks"] == 0.5 and got[2]["n_base"] == 2
    assert got[2]["drifted"]
    # day 3: cur [0,2] cum [0,2]; base [3,1] cum [3,4]; N=2, B=4
    # sup |0*4-3*2|, |2*4-4*2| = 6 -> 6/(2*4) = 0.75
    assert got[3]["ks"] == 0.75 and got[3]["n_base"] == 4

    # identical distributions -> ks 0, not drifted
    flat = [("a", d, v) for d in (1, 2, 3) for v in (0.5, 1.5)]
    g2 = {
        r["day"]: r
        for r in hist_drift(
            spark.createDataFrame(flat, "g string, d long, v double"),
            ["g"],
            "d",
            "v",
            bins=2,
            lo=0.0,
            hi=2.0,
            baseline_days=7,
        ).collect()
    }
    assert g2[2]["ks"] == 0.0 and g2[3]["ks"] == 0.0
    assert not g2[3]["drifted"]


def test_dup_drift_hand_computed(spark):
    """Replayed content flags against the trailing window; within-day
    duplicates are NOT counted; content older than the window is
    novel again."""
    from kafka_streams_plumber_spark.operators.diff import dup_drift

    rows = [
        (1, "x"),
        (1, "y"),
        (2, "x"),
        (2, "z"),
        (3, "z"),
        (3, "z"),
        (5, "w"),
        (5, "w"),
        (11, "x"),
    ]
    df = spark.createDataFrame(rows, "d long, text string")
    got = {
        r["day"]: r
        for r in dup_drift(
            df, ["text"], "d", baseline_days=7, threshold=0.2
        ).collect()
    }
    assert (got[1]["n_rows"], got[1]["n_dup"]) == (2, 0)
    # day 2: x replayed from day 1
    assert (got[2]["n_rows"], got[2]["n_dup"]) == (2, 1)
    assert got[2]["dup_rate"] == 0.5 and got[2]["drifted"]
    # day 3: both z rows count (z seen on day 2)
    assert (got[3]["n_rows"], got[3]["n_dup"]) == (2, 2)
    # day 5: within-day-only duplicate pair is NOT cross-day dup
    assert (got[5]["n_rows"], got[5]["n_dup"]) == (2, 0)
    # day 11: x last seen day 2 — outside the 7-day window (4..10)
    assert (got[11]["n_rows"], got[11]["n_dup"]) == (1, 0)
    assert not got[11]["drifted"]


def test_quantile_drift_hand_computed(spark):
    """Daily exact medians vs the trailing-window mean of daily
    medians: interpolation is exact, the first day is omitted, and a
    day whose whole window is empty is omitted too."""
    from kafka_streams_plumber_spark.operators.diff import quantile_drift

    rows = (
        [("a", 1, 1.0), ("a", 1, 3.0)]        # median 2.0
        + [("a", 2, 3.0), ("a", 2, 5.0)]      # median 4.0
        + [("a", 3, 5.0), ("a", 3, 7.0), ("a", 3, 9.0)]  # median 7.0
        + [("a", 15, 1.0)]                    # window 8-14 empty
    )
    df = spark.createDataFrame(rows, "g string, d long, v double")
    got = {
        r["day"]: r
        for r in quantile_drift(
            df, ["g"], "d", "v", p=0.5, baseline_days=7, threshold=3.0
        ).collect()
    }
    assert set(got) == {2, 3}  # day 1: no baseline; day 15: empty window
    assert got[2]["quantile"] == 4.0 and got[2]["baseline_mean"] == 2.0
    assert got[2]["delta"] == 2.0 and not got[2]["drifted"]
    assert got[3]["quantile"] == 7.0 and got[3]["baseline_mean"] == 3.0
    assert got[3]["delta"] == 4.0 and got[3]["n_base_days"] == 2
    assert got[3]["drifted"]

    # even-count day interpolates exactly
    ev = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 1, 2.0), ("a", 2, 1.0), ("a", 2, 2.0)],
        "g string, d long, v double",
    )
    g2 = quantile_drift(
        ev, ["g"], "d", "v", p=0.5, baseline_days=7, threshold=1.0
    ).collect()
    assert len(g2) == 1 and g2[0]["quantile"] == 1.5
    assert g2[0]["delta"] == 0.0
