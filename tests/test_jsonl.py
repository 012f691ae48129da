"""JSONL corpus I/O (sources/jsonl.py)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.sources.jsonl import (
    CORRUPT_COL,
    infer_jsonl_schema,
    read_jsonl,
    split_corrupt,
    write_jsonl,
)

DDL = "doc_id LONG, text STRING, lang STRING"


def _write_lines(path, lines):
    path.write_text("\n".join(lines) + "\n")


def test_read_jsonl_with_schema_and_corrupt_capture(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    _write_lines(
        p,
        [
            json.dumps({"doc_id": 1, "text": "hello", "lang": "en"}),
            "{not valid json",
            json.dumps({"doc_id": 2, "text": "welt", "lang": "de"}),
        ],
    )
    df = read_jsonl(spark, str(p), DDL)
    good, bad = split_corrupt(df)
    assert good.count() == 2
    assert bad.count() == 1
    assert bad.collect()[0][CORRUPT_COL].startswith("{not valid")
    assert {r["doc_id"] for r in good.collect()} == {1, 2}


def test_read_jsonl_drop_corrupt(spark, tmp_path):
    p = tmp_path / "c.jsonl"
    _write_lines(p, [json.dumps({"doc_id": 1, "text": "a", "lang": "en"}), "x{"])
    df = read_jsonl(spark, str(p), DDL, keep_corrupt=False)
    assert CORRUPT_COL not in df.columns


def test_jsonl_roundtrip_sharded(spark, tmp_path):
    src = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
    )
    out = tmp_path / "out"
    write_jsonl(src, str(out), shards=4, shard_by="doc_id")
    back = read_jsonl(spark, str(out), DDL)
    good, bad = split_corrupt(back)
    assert bad.count() == 0
    assert good.count() == 100
    assert sorted(r["doc_id"] for r in good.collect()) == list(range(100))
    # deterministic shard membership across reruns
    out2 = tmp_path / "out2"
    write_jsonl(src.repartition(7), str(out2), shards=4, shard_by="doc_id")
    import glob

    def shard_sets(d):
        sets = []
        for f in sorted(glob.glob(f"{d}/part-*")):
            with open(f) as fh:
                sets.append(frozenset(json.loads(l)["doc_id"] for l in fh if l.strip()))
        return frozenset(s for s in sets if s)

    assert shard_sets(out) == shard_sets(out2)


def test_infer_jsonl_schema_bounded(spark, tmp_path):
    p = tmp_path / "s.jsonl"
    _write_lines(p, [json.dumps({"a": 1, "b": "x"})] * 5)
    sch = infer_jsonl_schema(spark, str(p), sample_lines=3)
    assert {f.name for f in sch.fields} == {"a", "b"}


def test_drop_corrupt_drops_rows_not_just_column(spark, tmp_path):
    p = tmp_path / "d.jsonl"
    _write_lines(p, [json.dumps({"doc_id": 1, "text": "a", "lang": "en"}), "x{"])
    df = read_jsonl(spark, str(p), DDL, keep_corrupt=False)
    assert df.count() == 1  # the malformed line must not become a null row


def test_read_jsonl_does_not_mutate_caller_schema(spark, tmp_path):
    from pyspark.sql import types as T

    p = tmp_path / "m.jsonl"
    _write_lines(p, [json.dumps({"doc_id": 1, "text": "a", "lang": "en"})])
    schema = T.StructType.fromDDL(DDL)
    read_jsonl(spark, str(p), schema)
    read_jsonl(spark, str(p), schema)
    assert [f.name for f in schema.fields] == ["doc_id", "text", "lang"]
