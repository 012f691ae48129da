"""Scale-plan helpers: salted joins preserve join semantics and spread
hot keys; bucketed tables join with zero exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_plumber_spark.plans.inspect import shuffle_count
from kafka_streams_plumber_spark.plans.scale import (
    bucketed_table,
    salted_join,
    write_bucketed,
)


def test_salted_join_matches_plain_join(spark):
    left = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("lv")
    )
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(7)], "k long, rv string"
    )
    plain = {(r["k"], r["lv"], r["rv"]) for r in left.join(right, "k").collect()}
    salted = {
        (r["k"], r["lv"], r["rv"])
        for r in salted_join(left, right, "k", salt=8).collect()
    }
    assert salted == plain
    assert len(salted) == 1000


def test_salted_join_spreads_hot_key(spark):
    """The salt column must actually distribute one hot key over many
    distinct (key, salt) groups."""
    left = spark.range(0, 5000).select(F.lit(1).alias("k"), F.col("id").alias("lv"))
    right = spark.createDataFrame([(1, "hot")], "k long, rv string")
    l = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])), F.lit(16)).cast("int"),
    )
    n_groups = l.select("k", "_salt").distinct().count()
    assert n_groups == 16
    out = salted_join(left, right, "k", salt=16)
    assert out.count() == 5000


def test_left_join_preserves_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], "k long, lv string")
    right = spark.createDataFrame([(1, "r")], "k long, rv string")
    rows = {r["k"]: r["rv"] for r in salted_join(left, right, "k", salt=4, how="left").collect()}
    assert rows == {1: "r", 99: None}


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed by the join key on the same bucket count must
    plan a SortMergeJoin with zero Exchange operators."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.range(0, 10000).select(
            F.col("id").alias("o_id"), (F.col("id") % 100).alias("cust")
        )
        lines = spark.range(0, 30000).select(
            (F.col("id") % 10000).alias("o_id"), F.col("id").alias("qty")
        )
        write_bucketed(
            orders, "t_orders_b", bucket_by="o_id", buckets=8,
            path=str(tmp_path / "orders_b"),
        )
        write_bucketed(
            lines, "t_lines_b", bucket_by="o_id", buckets=8,
            path=str(tmp_path / "lines_b"),
        )
        j = bucketed_table(spark, "t_orders_b").join(
            bucketed_table(spark, "t_lines_b"), "o_id"
        )
        assert shuffle_count(j) == 0
        assert j.count() == 30000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lines_b")


def test_partitioned_write_prunes_at_plan_time(spark, tmp_path):
    from kafka_streams_plumber_spark.plans.inspect import plan_string
    from kafka_streams_plumber_spark.plans.scale import write_partitioned

    df = spark.createDataFrame(
        [(i, ["click", "view", "purchase"][i % 3]) for i in range(300)],
        "id long, kind string",
    )
    path = str(tmp_path / "part_events")
    write_partitioned(df, path, partition_by="kind")
    scan = spark.read.parquet(path).filter(F.col("kind") == "click")
    p = plan_string(scan)
    assert "PartitionFilters" in p and "kind" in p.split("PartitionFilters")[1][:200]
    assert scan.count() == 100


def test_partitioned_write_sorted_and_capped(spark, tmp_path):
    import glob

    from kafka_streams_plumber_spark.plans.scale import write_partitioned

    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2], i * 7 % 100) for i in range(400)],
        "id long, kind string, score int",
    )
    path = str(tmp_path / "sorted_events")
    write_partitioned(
        df, path, partition_by="kind", sort_by="score", max_records_per_file=50
    )
    # file cap honored: 200 rows per partition value / 50 -> >= 4 files each
    for kind in ("a", "b"):
        files = glob.glob(f"{path}/kind={kind}/*.parquet")
        assert len(files) >= 4
    back = spark.read.parquet(path)
    assert back.count() == 400
    # rows clustered by score within files: each file's rows are sorted
    one = glob.glob(f"{path}/kind=a/*.parquet")[0]
    scores = [r["score"] for r in spark.read.parquet(one).collect()]
    assert scores == sorted(scores)


def test_register_views_sql_surface(spark):
    from kafka_streams_plumber_spark.plans.session import register_views

    names = register_views(spark, "/root/testdata/sf0.001")
    assert "lineitem" in names and "documents" in names
    out = spark.sql(
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "WHERE o_totalprice > 1000 GROUP BY o_orderpriority"
    )
    assert out.count() > 0
    # ts normalization applied: event-time arithmetic works through SQL
    row = spark.sql(
        "SELECT max(unix_millis(ts)) AS m FROM events"
    ).collect()[0]
    assert row["m"] > 0


def test_compact_files_reduces_file_count_preserves_rows(spark, tmp_path):
    import glob

    from kafka_streams_plumber_spark.plans.scale import compact_files

    path = str(tmp_path / "t")
    # simulate a micro-batch sink: many tiny files
    for i in range(8):
        spark.range(i * 100, (i + 1) * 100).write.mode(
            "append"
        ).parquet(path)
    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 8
    n = compact_files(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    after = glob.glob(f"{path}/*.parquet")
    assert len(after) == 1
    back = spark.read.parquet(path)
    assert back.count() == 800
    assert sorted(r["id"] for r in back.collect()) == list(range(800))


def test_compact_files_sorted_clusters_rows(spark, tmp_path):
    from kafka_streams_plumber_spark.plans.scale import compact_files

    path = str(tmp_path / "s")
    spark.range(1000).selectExpr("id", "id % 97 AS k").write.parquet(path)
    compact_files(spark, path, target_file_bytes=1 << 30, sort_by="k")
    back = spark.read.parquet(path)
    assert back.count() == 1000


def test_zorder_key_hand_interleave(spark):
    from kafka_streams_plumber_spark.plans.scale import zorder_key

    # x=0b11, y=0b01, bits=2: positions (i*2+d) ->
    # x bit0 -> 0, y bit0 -> 1, x bit1 -> 2, y bit1 -> 3 = 0b0111 = 7
    df = spark.createDataFrame([(3, 1), (0, 0), (3, 3)], "x long, y long")
    got = [
        r["z"]
        for r in df.select(
            zorder_key(F.col("x"), F.col("y"), bits=2).alias("z")
        ).collect()
    ]
    assert got == [7, 0, 15]


def test_zorder_key_monotone_in_shared_prefix(spark):
    from kafka_streams_plumber_spark.plans.scale import zorder_key

    # same high bits in both dims -> same high bits in the key: points
    # in the same (x, y) quadrant sort contiguously ahead of other
    # quadrants (the locality property row-group pruning relies on)
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y"), bits=3).alias("z")
    ).collect()
    quad = {
        (r["x"] >= 4, r["y"] >= 4): [] for r in got
    }
    for r in got:
        quad[(r["x"] >= 4, r["y"] >= 4)].append(r["z"])
    ranges = {k: (min(v), max(v)) for k, v in quad.items()}
    # quadrants occupy disjoint key ranges
    spans = sorted(ranges.values())
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))


def test_zorder_key_rejects_long_overflow(spark):
    from kafka_streams_plumber_spark.plans.scale import zorder_key

    with pytest.raises(ValueError, match="overflows"):
        zorder_key(F.col("a"), F.col("b"), F.col("c"), F.col("d"), bits=16)


def test_cluster_by_zorder_plan_is_range_exchange_plus_sort(spark):
    from kafka_streams_plumber_spark.plans.inspect import plan_string
    from kafka_streams_plumber_spark.plans.scale import cluster_by_zorder

    df = spark.range(1000).select(
        (F.col("id") % 32).alias("x"), (F.col("id") % 17).alias("y"), "id"
    )
    out = cluster_by_zorder(df, [F.col("x"), F.col("y")], bits=5, partitions=4)
    p = plan_string(out)
    assert "Exchange rangepartitioning" in p
    assert "Sort" in p
    # layout op, not a reshuffle-per-join: exactly one exchange
    assert p.count("Exchange") == 1


def test_idempotent_write_replay_and_rewrite(spark, tmp_path):
    """Replays with the same token are no-ops; a new token rewrites;
    a torn previous attempt's staging debris is cleaned up."""
    import os

    from kafka_streams_plumber_spark.plans.scale import idempotent_write

    out = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1,), (2,)], "v long")
    assert idempotent_write(df1, out, job_token="run-1") is True
    assert spark.read.parquet(out).count() == 2
    # replay: skipped, data untouched
    df2 = spark.createDataFrame([(9,)], "v long")
    assert idempotent_write(df2, out, job_token="run-1") is False
    assert spark.read.parquet(out).count() == 2
    # simulate a crashed attempt leaving staging debris
    os.makedirs(out + "__inflight/junk", exist_ok=True)
    # new token: rewrite succeeds and cleans debris
    assert idempotent_write(df2, out, job_token="run-2") is True
    assert spark.read.parquet(out).count() == 1
    assert not os.path.exists(out + "__inflight")
    assert not os.path.exists(out + "__old")
    with open(os.path.join(out, "_JOB_TOKEN")) as f:
        assert f.read() == "run-2"
