"""Avro Object Container File ingestion (sources/avro_ocf.py):
round-trips through our own stdlib encoder, codec handling, the
reader/writer resolution gate, and corrupt-file dead-lettering."""

from __future__ import annotations

import json

import pytest

from kafka_streams_plumber_spark.sources.avro_ocf import (
    parse_ocf_bytes,
    read_avro_ocf,
    write_ocf_bytes,
)

SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "text", "type": "string"},
        {"name": "score", "type": "double"},
    ],
}

RECORDS = [
    {"id": i, "text": f"doc {i}", "score": i / 4.0} for i in range(25)
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip(codec):
    raw = write_ocf_bytes(RECORDS, SCHEMA, codec=codec, block_size=7)
    writer_json, recs = parse_ocf_bytes(raw)
    assert writer_json["name"] == "Doc"
    assert list(recs) == RECORDS


def test_ocf_rejects_corruption():
    raw = write_ocf_bytes(RECORDS, SCHEMA)
    with pytest.raises(ValueError, match="magic"):
        parse_ocf_bytes(b"NOPE" + raw[4:])
    # flip a sync marker byte inside the first block trailer
    bad = bytearray(raw)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        list(parse_ocf_bytes(bytes(bad))[1])


def test_read_avro_ocf_end_to_end(spark, tmp_path):
    d = tmp_path / "dump"
    d.mkdir()
    (d / "a.avro").write_bytes(write_ocf_bytes(RECORDS[:10], SCHEMA))
    (d / "b.avro").write_bytes(
        write_ocf_bytes(RECORDS[10:], SCHEMA, codec="deflate")
    )
    out = read_avro_ocf(spark, str(d), json.dumps(SCHEMA))
    rows = out.collect()
    assert len(rows) == 25
    assert all(not r["_corrupt"] for r in rows)
    got = sorted((r["id"], r["text"], r["score"]) for r in rows)
    assert got == [(r["id"], r["text"], r["score"]) for r in RECORDS]
    assert {r["_path"].rsplit("/", 1)[-1] for r in rows} == {
        "a.avro",
        "b.avro",
    }


def test_read_avro_ocf_schema_evolution(spark, tmp_path):
    # writer lacks `lang` (reader default fills it) and has an extra
    # field `junk` (dropped by the by-name projection)
    writer = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "junk", "type": "string"},
        ],
    }
    reader = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "lang", "type": "string", "default": "und"},
        ],
    }
    d = tmp_path / "evo"
    d.mkdir()
    recs = [{"id": 1, "junk": "x"}, {"id": 2, "junk": "y"}]
    (d / "w.avro").write_bytes(write_ocf_bytes(recs, writer))
    rows = read_avro_ocf(spark, str(d), reader).collect()
    assert sorted((r["id"], r["lang"]) for r in rows) == [
        (1, "und"),
        (2, "und"),
    ]


def test_read_avro_ocf_incompatible_writer_dead_letters(spark, tmp_path):
    writer = {
        "type": "record",
        "name": "Doc",
        "fields": [{"name": "id", "type": "long"}],
    }
    reader = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "must", "type": "string"},  # no default -> unreadable
        ],
    }
    d = tmp_path / "bad"
    d.mkdir()
    (d / "w.avro").write_bytes(write_ocf_bytes([{"id": 1}], writer))
    rows = read_avro_ocf(spark, str(d), reader).collect()
    assert len(rows) == 1 and rows[0]["_corrupt"]

    with pytest.raises(Exception):
        read_avro_ocf(spark, str(d), reader, strict=True).collect()


def test_read_avro_ocf_corrupt_file_dead_letters(spark, tmp_path):
    d = tmp_path / "mix"
    d.mkdir()
    (d / "good.avro").write_bytes(write_ocf_bytes(RECORDS[:3], SCHEMA))
    (d / "trash.avro").write_bytes(b"not an avro file at all")
    rows = read_avro_ocf(spark, str(d), SCHEMA).collect()
    good = [r for r in rows if not r["_corrupt"]]
    bad = [r for r in rows if r["_corrupt"]]
    assert len(good) == 3 and len(bad) == 1
    assert bad[0]["_path"].endswith("trash.avro")


def test_read_avro_ocf_midfile_corruption_discards_prefix(spark, tmp_path):
    """A file that decodes N rows and THEN hits corruption must surface
    as exactly ONE marker row — the already-decoded prefix is discarded
    so reprocessing the repaired file can never double-count."""
    d = tmp_path / "mid"
    d.mkdir()
    raw = write_ocf_bytes(RECORDS[:6], SCHEMA, block_size=2)  # 3 blocks
    (d / "good.avro").write_bytes(raw)
    # chop mid-way through the last block: header + first block decode
    # fine, the tail raises during iteration
    (d / "partial.avro").write_bytes(raw[:-10])
    rows = read_avro_ocf(spark, str(d), SCHEMA).collect()
    good = [r for r in rows if not r["_corrupt"]]
    bad = [r for r in rows if r["_corrupt"]]
    assert len(good) == 6  # only the intact file's rows
    assert all(r["_path"].endswith("good.avro") for r in good)
    assert len(bad) == 1 and bad[0]["_path"].endswith("partial.avro")
    assert bad[0]["id"] is None and bad[0]["text"] is None
