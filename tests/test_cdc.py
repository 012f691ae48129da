"""CDC fold + SCD2 versioning (operators/cdc.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.cdc import (
    apply_changes,
    latest_changes,
    scd2_history,
)


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, bal double",
    )


def _log(spark):
    # key 1: update then delete (delete wins); key 2: two updates
    # (v=5 wins); key 4: pure insert; key 3 untouched
    return spark.createDataFrame(
        [
            (1, 1, "U", "a2", 11.0),
            (1, 2, "D", None, None),
            (2, 4, "U", "b2", 21.0),
            (2, 5, "U", "b3", 22.0),
            (4, 1, "U", "d", 40.0),
        ],
        "id long, v long, op string, name string, bal double",
    )


def test_latest_changes_picks_max_version(spark):
    out = {
        r["id"]: (r["op"], r["name"])
        for r in latest_changes(_log(spark), "id", "v").collect()
    }
    assert out[1] == ("D", None)
    assert out[2] == ("U", "b3")
    assert out[4] == ("U", "d")


def test_apply_changes_upsert_delete_insert_passthrough(spark):
    out = {
        r["id"]: (r["name"], r["bal"])
        for r in apply_changes(_snap(spark), _log(spark), "id", "v").collect()
    }
    assert 1 not in out  # latest op is delete
    assert out[2] == ("b3", 22.0)  # latest update wins
    assert out[3] == ("c", 30.0)  # untouched passthrough
    assert out[4] == ("d", 40.0)  # insert of a new key
    assert len(out) == 3


def test_apply_changes_schema_is_snapshot_schema(spark):
    out = apply_changes(_snap(spark), _log(spark), "id", "v")
    assert out.columns == ["id", "name", "bal"]


def test_apply_changes_partition_invariant(spark):
    a = apply_changes(
        _snap(spark).repartition(7), _log(spark).repartition(5), "id", "v"
    )
    b = apply_changes(_snap(spark), _log(spark), "id", "v")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_scd2_intervals_chain(spark):
    log = _log(spark)
    h = scd2_history(log, "id", "v").orderBy("id", "v").collect()
    k2 = [r for r in h if r["id"] == 2]
    assert [(r["valid_from"], r["valid_to"], r["is_current"]) for r in k2] == [
        (4, 5, False),
        (5, None, True),
    ]
    # every key has exactly one current record
    cur = (
        scd2_history(log, "id", "v")
        .groupBy("id")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in cur)


def test_scd2_asof_reconstruction(spark):
    """Snapshot-as-of V = filter on the intervals, no refold."""
    h = scd2_history(_log(spark), "id", "v")
    asof4 = h.filter(
        (F.col("valid_from") <= 4)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > 4))
    )
    got = {r["id"]: r["name"] for r in asof4.collect()}
    assert got == {1: None, 2: "b2", 4: "d"}  # key1's delete marker at v=2
