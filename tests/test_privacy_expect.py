"""DP release (operators/privacy.py) and data-quality suite
(operators/expect.py); sf0.01 oracle equivalence is covered by the
q_dp_stats / q_expectations contracts."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.expect import (
    accepted_values_rate,
    distinct_ratio,
    in_range_rate,
    mean_of,
    not_null_rate,
    run_checks,
)
from kafka_streams_plumber_spark.operators.privacy import dp_release


def _lap(key: str, seed: int, tag: str, b: float) -> float:
    u = (
        int(hashlib.md5(f"{key}|{seed}|{tag}".encode()).hexdigest()[:8], 16)
        + 0.5
    ) / 2**32
    c = u - 0.5
    return -b * math.copysign(1.0, c) * math.log(1.0 - 2.0 * abs(c))


def test_dp_release_count_matches_closed_form(spark):
    df = spark.createDataFrame(
        [("a",)] * 7 + [("b",)] * 3, "g string"
    )
    got = {
        r["g"]: r["n_dp"]
        for r in dp_release(df, group_cols=["g"], epsilon=2.0, seed=9).collect()
    }
    assert got["a"] == round(7 + _lap("a", 9, "n", 1 / 2.0), 6)
    assert got["b"] == round(3 + _lap("b", 9, "n", 1 / 2.0), 6)
    # deterministic: the same release twice is identical
    again = {
        r["g"]: r["n_dp"]
        for r in dp_release(df, group_cols=["g"], epsilon=2.0, seed=9).collect()
    }
    assert got == again
    # a different seed is a different release
    other = {
        r["g"]: r["n_dp"]
        for r in dp_release(df, group_cols=["g"], epsilon=2.0, seed=10).collect()
    }
    assert other != got


def test_dp_release_sum_clips_contributions(spark):
    # one row contributes 1000 but the declared bound is 10: the clipped
    # sum is 10 + 5, and the noise scale uses bound/eps_each (half the
    # budget goes to the count)
    df = spark.createDataFrame([("a", 1000.0), ("a", 5.0)], "g string, v double")
    [row] = dp_release(
        df, group_cols=["g"], epsilon=1.0, seed=3, sum_col="v", sum_bound=10.0
    ).collect()
    want = round(15.0 + _lap("a", 3, "s", 10.0 / 0.5), 6)
    assert row["sum_dp"] == want


def test_dp_release_requires_bound_with_sum(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="sum_bound"):
        dp_release(df, group_cols=["g"], sum_col="v")


def test_run_checks_metrics_and_verdicts(spark):
    df = spark.createDataFrame(
        [
            (1, 1, 10.0, "A"),
            (1, 2, 20.0, "N"),
            (2, 1, None, "R"),
            (2, 2, 99.0, "X"),
        ],
        "k long, ln long, v double, flag string",
    )
    out = {
        r["check"]: r
        for r in run_checks(
            df,
            [
                {"name": "v_not_null", "metric": not_null_rate("v"), "lo": 1.0},
                {"name": "v_range", "metric": in_range_rate("v", 0, 50), "lo": 0.9},
                {"name": "key", "metric": distinct_ratio("k", "ln"), "lo": 1.0},
                {"name": "v_mean", "metric": mean_of("v"), "lo": 40.0, "hi": 45.0},
                {
                    "name": "flag",
                    "metric": accepted_values_rate("flag", ["A", "N", "R"]),
                    "lo": 1.0,
                },
            ],
        ).collect()
    }
    assert out["v_not_null"]["metric"] == 0.75 and not out["v_not_null"]["ok"]
    # 2 of 3 non-null values in [0, 50]
    assert out["v_range"]["metric"] == round(2 / 3, 6) and not out["v_range"]["ok"]
    assert out["key"]["metric"] == 1.0 and out["key"]["ok"]
    assert out["v_mean"]["metric"] == 43.0 and out["v_mean"]["ok"]
    assert out["flag"]["metric"] == 0.75 and not out["flag"]["ok"]


def test_run_checks_empty_frame_fails_not_passes(spark):
    df = spark.createDataFrame([], "v double")
    [row] = run_checks(
        df, [{"name": "r", "metric": in_range_rate("v", 0, 1), "lo": 0.0}]
    ).collect()
    assert row["metric"] is None and not row["ok"]


def test_run_checks_validates_rules(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="duplicate"):
        run_checks(
            df,
            [
                {"name": "x", "metric": not_null_rate("v"), "lo": 0},
                {"name": "x", "metric": not_null_rate("v"), "lo": 0},
            ],
        )
    with pytest.raises(ValueError, match="no lo/hi"):
        run_checks(df, [{"name": "x", "metric": not_null_rate("v")}])


def test_run_checks_is_one_scan_no_python(spark):
    from kafka_streams_plumber_spark.plans.inspect import (
        plan_string,
        python_eval_count,
    )

    df = spark.range(100).select(F.col("id").cast("double").alias("v"))
    out = run_checks(
        df,
        [
            {"name": "a", "metric": not_null_rate("v"), "lo": 1.0},
            {"name": "b", "metric": in_range_rate("v", 0, 50), "lo": 0.0},
            {"name": "c", "metric": mean_of("v"), "lo": 0.0},
        ],
    )
    assert python_eval_count(out) == 0
    # all rules ride ONE aggregate (a partial/final pair), reading the
    # source exactly once — never one job per rule
    p = plan_string(out)
    assert p.count("HashAggregate") == 2
    assert p.count("Range") == 1


def test_profile_exact_stats(spark):
    from kafka_streams_plumber_spark.operators.expect import profile

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (2, None, 30.0)],
        "k long, s string, v double",
    )
    out = {r["column"]: r for r in profile(df).collect()}
    assert out["k"]["null_rate"] == 0.0 and out["k"]["n_distinct"] == 2
    assert (out["k"]["min"], out["k"]["max"]) == ("1", "2")
    assert out["k"]["mean"] == round(5 / 3, 6)
    assert out["s"]["null_rate"] == round(1 / 3, 6)
    assert out["s"]["mean"] is None  # non-numeric
    assert out["v"]["mean"] == 20.0 and out["v"]["n_distinct"] == 2
    assert out["v"]["dtype"] == "double"


def test_profile_single_scan(spark):
    from kafka_streams_plumber_spark.operators.expect import profile
    from kafka_streams_plumber_spark.plans.inspect import (
        plan_string,
        python_eval_count,
    )

    df = spark.range(50).select(
        F.col("id"), (F.col("id") % 5).alias("g")
    )
    out = profile(df)
    assert python_eval_count(out) == 0
    assert plan_string(out).count("Range") == 1


def test_forget_subjects_purges_and_audits(spark):
    from kafka_streams_plumber_spark.operators.privacy import (
        forget_subjects,
    )

    users = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "uid long, name string"
    )
    events = spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (2, 12.0), (None, 13.0)],
        "uid long, v double",
    )
    subjects = spark.createDataFrame([(1,), (1,), (99,)], "uid long")

    purged, audit = forget_subjects(
        {"users": users, "events": events},
        subjects,
        {"users": "uid", "events": "uid"},
    )
    assert {r["uid"] for r in purged["users"].collect()} == {2, 3}
    left = purged["events"].collect()
    # NULL keys survive (match no deletion request)
    assert sorted(((r["uid"], r["v"]) for r in left), key=repr) == sorted(
        [(2, 12.0), (None, 13.0)], key=repr
    )
    got = {
        r["table"]: (r["rows_before"], r["rows_purged"], r["rows_after"])
        for r in audit.collect()
    }
    assert got == {"users": (3, 1, 2), "events": (4, 2, 2)}


def test_forget_subjects_unknown_subject_is_noop(spark):
    from kafka_streams_plumber_spark.operators.privacy import (
        forget_subjects,
    )

    df = spark.createDataFrame([(5, 1.0)], "uid long, v double")
    subjects = spark.createDataFrame([(42,)], "uid long")
    purged, audit = forget_subjects({"t": df}, subjects, {"t": "uid"})
    assert purged["t"].count() == 1
    r = audit.collect()[0]
    assert (r["rows_before"], r["rows_purged"], r["rows_after"]) == (1, 0, 1)


def test_matches_rate_counts_full_regex_matches(spark):
    """matches_rate = fraction of NON-NULL values matching the regex
    (the one expectation metric the suite didn't exercise directly)."""
    from kafka_streams_plumber_spark.operators.expect import (
        matches_rate,
        run_checks,
    )

    df = spark.createDataFrame(
        [("a1",), ("b2",), ("zz",), (None,)], "s string"
    )
    out = run_checks(
        df,
        [{"name": "fmt", "metric": matches_rate("s", "[a-z][0-9]"), "lo": 0.5}],
    ).collect()[0]
    # 2 of 3 non-null values match -> 0.666..; NULLs excluded from both sides
    assert out["ok"] is True
    assert abs(out["metric"] - 2 / 3) < 1e-6
