"""asof_join / range_join semantics: latest-prior match, equal-ts
visibility, strict mode, left rows with no match, single-shuffle plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.joins import asof_join, range_join
from kafka_streams_plumber_spark.plans.inspect import shuffle_count


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),
            (1, _ts("2024-01-01T12:00:00"), "b"),
            (2, _ts("2024-01-01T09:00:00"), "c"),  # before any right row
            (3, _ts("2024-01-01T10:00:00"), "d"),  # key with no right rows
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 10.0),
            (1, _ts("2024-01-01T11:00:00"), 20.0),
            (2, _ts("2024-01-01T09:00:00"), 30.0),  # equal-ts case
        ],
        "k int, ts timestamp, px double",
    )
    return left, right


def test_asof_latest_prior_and_nulls(spark):
    left, right = _frames(spark)
    out = {
        r["tag"]: (r["r_px"], r["r_ts"])
        for r in asof_join(left, right, on="k", ts="ts").collect()
    }
    assert out["a"] == (10.0, _ts("2024-01-01T09:30:00"))
    assert out["b"] == (20.0, _ts("2024-01-01T11:00:00"))
    # non-strict: right row at the same instant is visible
    assert out["c"] == (30.0, _ts("2024-01-01T09:00:00"))
    assert out["d"] == (None, None)
    assert len(out) == 4


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    out = {
        r["tag"]: r["r_px"]
        for r in asof_join(left, right, on="k", ts="ts", strict=True).collect()
    }
    assert out["c"] is None  # equal-ts right row no longer visible
    assert out["a"] == 10.0


def test_asof_single_shuffle(spark):
    left, right = _frames(spark)
    assert shuffle_count(asof_join(left, right, on="k", ts="ts")) == 1


def test_asof_different_right_ts_name(spark):
    left, right = _frames(spark)
    r2 = right.withColumnRenamed("ts", "rts")
    out = {
        r["tag"]: r["r_px"]
        for r in asof_join(left, r2, on="k", ts="ts", right_ts="rts").collect()
    }
    assert out["a"] == 10.0


def test_range_join_interval_membership(spark):
    left = spark.createDataFrame(
        [(1, 5, "x"), (1, 15, "y"), (2, 5, "z")], "k int, t int, tag string"
    )
    right = spark.createDataFrame(
        [(1, 0, 10, "lo"), (1, 10, 20, "hi")], "k int, s int, e int, name string"
    )
    got = {
        (r["tag"], r["name"])
        for r in range_join(
            left, right, on="k", left_ts="t", right_start="s", right_end="e"
        ).collect()
    }
    assert got == {("x", "lo"), ("y", "hi")}


def _bucket_frames(spark, n_left=200, n_right=40):
    left = spark.createDataFrame(
        [(i % 3, i * 7 % 1000, f"l{i}") for i in range(n_left)],
        "k int, t int, tag string",
    )
    # overlapping intervals of varied width, some spanning many buckets
    right = spark.createDataFrame(
        [
            (i % 3, (i * 23) % 900, (i * 23) % 900 + 10 + (i % 5) * 40, f"r{i}")
            for i in range(n_right)
        ],
        "k int, s int, e int, name string",
    )
    return left, right


def test_range_join_bucketed_matches_unbucketed(spark):
    """The bucketed path must produce exactly the unbucketed result set
    (no dropped pairs at bucket boundaries, no duplicated pairs from the
    interval explode) for width choices below/at/above interval length."""
    left, right = _bucket_frames(spark)
    kw = dict(on="k", left_ts="t", right_start="s", right_end="e")
    expect = {(r["tag"], r["name"]) for r in range_join(left, right, **kw).collect()}
    assert expect  # non-trivial fixture
    for width in (7, 50, 500):
        got = {
            (r["tag"], r["name"])
            for r in range_join(left, right, bucket=width, **kw).collect()
        }
        assert got == expect, f"width={width}"


def test_range_join_bucketed_callable_and_keyless(spark):
    left, right = _bucket_frames(spark)
    kw = dict(on=None, left_ts="t", right_start="s", right_end="e")
    expect = {(r["tag"], r["name"]) for r in range_join(left, right, **kw).collect()}
    got = {
        (r["tag"], r["name"])
        for r in range_join(
            left, right, bucket=lambda c: F.floor(c / 64), **kw
        ).collect()
    }
    assert got == expect


def test_range_join_bucketed_plans_equi_join(spark):
    """With bucket given the join must be equi-keyed (sort-merge or
    shuffled-hash or broadcast-hash) — never a BroadcastNestedLoopJoin /
    CartesianProduct, which is the scale-killer the bucketing exists to
    avoid."""
    from kafka_streams_plumber_spark.plans.inspect import plan_string

    left, right = _bucket_frames(spark)
    df = range_join(
        left, right, on=None, left_ts="t", right_start="s", right_end="e",
        bucket=50,
    )
    plan = plan_string(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_forward_direction(spark):
    import datetime as dt

    from kafka_streams_plumber_spark.operators.joins import asof_join

    T = dt.datetime(2024, 1, 1)

    def ts(m):
        return T + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, ts(10), "p1"), (1, ts(40), "p2"), (2, ts(10), "p3")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts(5), "early"), (1, ts(10), "same"), (1, ts(30), "mid")],
        "k int, rts timestamp, v string",
    )
    fwd = {
        r["tag"]: r["r_v"]
        for r in asof_join(
            left, right, on="k", ts="ts", right_ts="rts", direction="forward"
        ).collect()
    }
    # p1 at t10: earliest following-or-equal is 'same'; p2 at t40: none
    assert fwd == {"p1": "same", "p2": None, "p3": None}
    strict_fwd = {
        r["tag"]: r["r_v"]
        for r in asof_join(
            left, right, on="k", ts="ts", right_ts="rts",
            direction="forward", strict=True,
        ).collect()
    }
    # strict: equal timestamps invisible -> p1 matches 'mid' (t30)
    assert strict_fwd == {"p1": "mid", "p2": None, "p3": None}


def test_asof_direction_validation(spark):
    import pytest as _pytest

    from kafka_streams_plumber_spark.operators.joins import asof_join

    df = spark.createDataFrame([(1, 1)], "k int, ts int")
    with _pytest.raises(ValueError, match="direction"):
        asof_join(df, df, on="k", ts="ts", direction="nearest")
