"""Multi-touch attribution (operators/attribution.py): hand-computable
micro-fixtures; sf0.01 oracle equivalence is covered by the
q_attrib_last / q_attrib_linear contracts."""

from __future__ import annotations

import datetime as dt

from kafka_streams_plumber_spark.operators.attribution import (
    attribute_conversions,
)


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )


_BASE = [
    # user 1: view -> click -> buy(10): last=click, first=view
    (1, 1, "view", _ts(1, 9), 0.0),
    (2, 1, "click", _ts(1, 10), 0.0),
    (3, 1, "buy", _ts(1, 11), 10.0),
    # user 2: no touches -> organic buy(5)
    (4, 2, "buy", _ts(1, 12), 5.0),
    # user 3: touch AFTER the buy never credits
    (5, 3, "buy", _ts(1, 8), 2.0),
    (6, 3, "view", _ts(1, 9), 0.0),
]


def _got(out):
    return {
        r["channel"]: (r["conversions"], r["attributed_value"])
        for r in out.collect()
    }


def test_last_touch_credits_latest(spark):
    got = _got(
        attribute_conversions(
            _events(spark, _BASE),
            conversion_type="buy",
            touch_types=["view", "click"],
            model="last_touch",
        )
    )
    assert got == {"click": (1, 10.0), None: (2, 7.0)}


def test_first_touch_credits_earliest(spark):
    got = _got(
        attribute_conversions(
            _events(spark, _BASE),
            conversion_type="buy",
            touch_types=["view", "click"],
            model="first_touch",
        )
    )
    assert got == {"view": (1, 10.0), None: (2, 7.0)}


def test_linear_splits_evenly(spark):
    got = _got(
        attribute_conversions(
            _events(spark, _BASE),
            conversion_type="buy",
            touch_types=["view", "click"],
            model="linear",
            conv_id_col="event_id",
        )
    )
    assert got == {"view": (1, 5.0), "click": (1, 5.0), None: (2, 7.0)}


def test_lookback_window_excludes_stale_touches(spark):
    rows = [
        (1, 1, "view", _ts(1, 0), 0.0),     # 11 h before the buy
        (2, 1, "click", _ts(1, 10), 0.0),   # 1 h before the buy
        (3, 1, "buy", _ts(1, 11), 8.0),
    ]
    got = _got(
        attribute_conversions(
            _events(spark, rows),
            conversion_type="buy",
            touch_types=["view", "click"],
            model="first_touch",
            lookback_ms=2 * 3600 * 1000,
        )
    )
    # the 11h-old view is out of window -> first IN-WINDOW touch wins
    assert got == {"click": (1, 8.0)}


def test_same_timestamp_tie_breaks_on_type_order(spark):
    rows = [
        (1, 1, "view", _ts(1, 10), 0.0),
        (2, 1, "click", _ts(1, 10), 0.0),
        (3, 1, "buy", _ts(1, 11), 4.0),
    ]
    base = dict(
        conversion_type="buy", touch_types=["view", "click"]
    )
    last = _got(
        attribute_conversions(_events(spark, rows), model="last_touch", **base)
    )
    first = _got(
        attribute_conversions(_events(spark, rows), model="first_touch", **base)
    )
    # equal timestamps: last-touch prefers the LATER list entry,
    # first-touch the EARLIER — both deterministic
    assert last == {"click": (1, 4.0)}
    assert first == {"view": (1, 4.0)}


def test_touch_at_conversion_instant_counts(spark):
    rows = [
        (1, 1, "click", _ts(1, 11), 0.0),
        (2, 1, "buy", _ts(1, 11), 3.0),
    ]
    got = _got(
        attribute_conversions(
            _events(spark, rows),
            conversion_type="buy",
            touch_types=["click"],
            model="last_touch",
        )
    )
    assert got == {"click": (1, 3.0)}


def test_linear_integer_split_reconciles_to_cent_scale(spark):
    # 10.00 over 3 touches: floor(10_000_000/3) = 3_333_333 micro-units
    # each -> per-channel values sum to 9.999999 (documented floor split)
    rows = [
        (1, 1, "view", _ts(1, 8), 0.0),
        (2, 1, "view", _ts(1, 9), 0.0),
        (3, 1, "click", _ts(1, 10), 0.0),
        (4, 1, "buy", _ts(1, 11), 10.0),
    ]
    got = _got(
        attribute_conversions(
            _events(spark, rows),
            conversion_type="buy",
            touch_types=["view", "click"],
            model="linear",
            conv_id_col="event_id",
        )
    )
    assert got["view"] == (1, 6.666666)
    assert got["click"] == (1, 3.333333)
