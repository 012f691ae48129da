"""CSV corpus I/O: schema-mandatory reads, dead-letter split, shards."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.sources.csvl import read_csv, write_csv
from kafka_streams_plumber_spark.sources.jsonl import split_corrupt

SCHEMA = "doc_id bigint, text string, score double"


def test_csv_roundtrip_and_shard_stability(spark, tmp_path):
    rows = [(i, f"doc {i}", i / 4.0) for i in range(40)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = str(tmp_path / "c")
    write_csv(df, out, shards=4, shard_by="doc_id")
    back = read_csv(spark, out, SCHEMA)
    good, bad = split_corrupt(back)
    assert bad.count() == 0
    assert sorted(map(tuple, good.collect())) == sorted(rows)
    # shard membership is a pure id hash: rewriting yields byte-stable
    # membership per shard index
    import glob

    def membership(p):
        m = {}
        for i, f in enumerate(sorted(glob.glob(f"{p}/part-*"))):
            with open(f) as fh:
                ids = sorted(
                    int(line.split(",")[0])
                    for line in fh.read().splitlines()[1:]
                )
            m[i] = ids
        return m

    out2 = str(tmp_path / "c2")
    write_csv(df, out2, shards=4, shard_by="doc_id")
    assert membership(out) == membership(out2)


def test_csv_corrupt_lines_are_dead_lettered(spark, tmp_path):
    raw = str(tmp_path / "raw")
    import os

    os.makedirs(raw)
    with open(f"{raw}/part.csv", "w") as f:
        f.write("doc_id,text,score\n")
        f.write("1,hello,0.5\n")
        f.write("not-a-number,world,0.25\n")   # uncastable id
        f.write("2,ok,0.75,EXTRA,COLS\n")      # wrong arity
        f.write("3,fine,1.0\n")
    df = read_csv(spark, raw, SCHEMA)
    good, bad = split_corrupt(df)
    assert {r["doc_id"] for r in good.collect()} == {1, 3}
    assert bad.count() == 2
    # and the raw lines are preserved for the dead-letter sink
    texts = {r[0] for r in bad.collect()}
    assert any("not-a-number" in t for t in texts)
    assert any("EXTRA" in t for t in texts)


def test_csv_tsv_and_dropmalformed(spark, tmp_path):
    raw = str(tmp_path / "t")
    import os

    os.makedirs(raw)
    with open(f"{raw}/x.tsv", "w") as f:
        f.write("doc_id\ttext\tscore\n1\ta b\t0.5\nbad\tline\n")
    df = read_csv(
        spark, raw, SCHEMA, delimiter="\t", keep_corrupt=False
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["text"] == "a b"
