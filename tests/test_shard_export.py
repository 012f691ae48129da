"""Streaming shard export: accumulation, replay idempotency, manifest."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_shard_export_accumulates_and_replays(spark, tmp_path):
    from kafka_streams_plumber_spark.operators.sampling import split_bucket
    from kafka_streams_plumber_spark.streaming.export import (
        read_manifest,
        shard_export_batch_fn,
    )

    out = str(tmp_path / "shards")
    fn = shard_export_batch_fn(out, "doc_id", n_shards=3, token_col="n_tok")

    b0 = spark.createDataFrame(
        [(i, 10 + i) for i in range(20)], "doc_id long, n_tok long"
    )
    b1 = spark.createDataFrame(
        [(i, 5) for i in range(20, 30)], "doc_id long, n_tok long"
    )
    fn(b0, 0)
    fn(b1, 1)

    data = spark.read.parquet(f"{out}/data")
    assert data.count() == 30
    # shard assignment is the stable id hash
    expected = {
        r["doc_id"]: r["b"]
        for r in b0.union(b1)
        .select("doc_id", split_bucket("doc_id", buckets=3).cast("int").alias("b"))
        .collect()
    }
    got = {r["doc_id"]: r["shard"] for r in data.collect()}
    assert got == expected

    m = {r["shard"]: r for r in read_manifest(spark, out).collect()}
    assert sum(r["n_rows"] for r in m.values()) == 30
    assert sum(r["n_tokens"] for r in m.values()) == sum(
        10 + i for i in range(20)
    ) + 10 * 5
    assert all(r["n_batches"] >= 1 for r in m.values())

    # replay of batch 1 (restart after crash): no double-append
    # (re-read: the replay legitimately replaced batch 1's files)
    fn(b1, 1)
    data2 = spark.read.parquet(f"{out}/data")
    assert data2.count() == 30
    m2 = {r["shard"]: (r["n_rows"], r["n_tokens"])
          for r in read_manifest(spark, out).collect()}
    assert m2 == {k: (v["n_rows"], v["n_tokens"]) for k, v in m.items()}

    # batch_id rides in the data: resume-from-batch is a pushdown filter
    assert data2.filter("batch_id = 1").count() == 10


def test_shard_export_end_to_end_stream(spark, tmp_path):
    import glob
    import time

    import pyarrow.parquet as pq

    from kafka_streams_plumber_spark.streaming.export import (
        read_committed,
        read_manifest,
        shard_stream,
    )

    out = str(tmp_path / "s_out")
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "50")
        .load()
        .select(
            F.col("value").alias("doc_id"),
            (F.col("value") % 7 + 1).alias("n_tok"),
        )
    )
    q = shard_stream(
        src, out, "doc_id", n_shards=2, token_col="n_tok",
        checkpoint=str(tmp_path / "ckpt"),
    )

    def committed_rows() -> int:
        # poll the MANIFEST (the commit record), via pyarrow, not
        # Spark: driver-side Spark reads race the foreachBatch thread
        # on the shared gateway, and polling data/ alone can see a
        # batch whose manifest hasn't landed yet (the r5 flake)
        total = 0
        for f in glob.glob(f"{out}/_manifest/batch_id=*/*.parquet"):
            try:
                t = pq.read_table(f, columns=["n_rows"])
            except Exception:
                continue  # mid-write; next poll
            total += sum(x or 0 for x in t.column("n_rows").to_pylist())
        return total

    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if committed_rows() >= 10:
                break
            time.sleep(1)
    finally:
        # stop() may land mid-foreachBatch, leaving data/batch_id=N
        # visible without its manifest row — exactly why the asserts
        # below go through read_committed
        q.stop()
    data = read_committed(spark, out)
    n = data.count()
    assert n >= 10
    m = read_manifest(spark, out)
    assert m.agg(F.sum("n_rows")).collect()[0][0] == n
    # the raw glob may legitimately see MORE rows (an uncommitted
    # trailing batch) but never fewer
    assert spark.read.parquet(f"{out}/data").count() >= n
