"""WARC ingestion (sources/warc.py): framing, gzip members, HTTP split."""

from __future__ import annotations

import gzip

from kafka_streams_plumber_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
)


def _record(
    warc_type: str,
    uri: str,
    payload: bytes,
    rid: str = "<urn:uuid:1>",
) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200, ct: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ct}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _archive() -> bytes:
    return (
        _record("warcinfo", "-", b"software: test")
        + _record("request", "http://a.com/", b"GET / HTTP/1.1\r\n\r\n")
        + _record(
            "response",
            "http://a.com/",
            _http(b"<html>A</html>"),
            rid="<urn:uuid:2>",
        )
        + _record(
            "response",
            "http://b.com/x",
            _http(b"\x00\x01binary\r\n\r\nstuff", ct="image/png"),
            rid="<urn:uuid:3>",
        )
    )


def test_parse_warc_bytes_frames_by_content_length():
    recs = list(parse_warc_bytes(_archive()))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response", "response",
    ]
    a, b = recs[2], recs[3]
    assert a["target_uri"] == "http://a.com/" and a["http_status"] == 200
    assert a["body"] == b"<html>A</html>"
    # binary body containing CRLFCRLF is preserved intact (no scanning)
    assert b["body"] == b"\x00\x01binary\r\n\r\nstuff"
    assert b["http_content_type"] == "image/png"


def test_parse_warc_gzip_members():
    # the common layout: one gzip member per record
    gz = b"".join(
        gzip.compress(part)
        for part in [
            _record("warcinfo", "-", b"x"),
            _record("response", "http://c.com/", _http(b"C"), rid="<u:4>"),
        ]
    )
    recs = list(parse_warc_bytes(gz))
    assert len(recs) == 2 and recs[1]["body"] == b"C"


def test_read_warc_distributes_and_filters(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_archive())
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(_archive()))
    df = read_warc(spark, str(tmp_path / "*"))
    rows = df.collect()
    # default filter: responses only, from both files
    assert len(rows) == 4
    assert {r["warc_type"] for r in rows} == {"response"}
    assert {r["target_uri"] for r in rows} == {"http://a.com/", "http://b.com/x"}
    assert all(r["http_status"] == 200 for r in rows)
    everything = read_warc(spark, str(tmp_path / "*"), types=())
    assert everything.count() == 8


def test_parse_warc_missing_content_length_resyncs():
    """A record without Content-Length can't be framed — the parser
    must skip to the next record marker, not drop the archive rest."""
    bad = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\n"
        b"WARC-Record-ID: <u:bad>\r\n\r\nunframed junk..."
    )
    raw = bad + b"\r\n" + _record("response", "http://ok.com/", _http(b"OK"))
    recs = list(parse_warc_bytes(raw))
    assert [r["target_uri"] for r in recs] == ["http://ok.com/"]
    assert recs[0]["body"] == b"OK"


def test_parse_warc_truncated_archive_keeps_prefix():
    good = _record("response", "http://a.com/", _http(b"A"))
    truncated = good + b"WARC/1.0\r\nWARC-Type: resp"  # cut mid-header
    recs = list(parse_warc_bytes(truncated))
    assert len(recs) == 1 and recs[0]["body"] == b"A"


def test_parse_warc_truncated_gzip_member_keeps_decoded_prefix():
    good = gzip.compress(_record("response", "http://a.com/", _http(b"A")))
    bad = gzip.compress(_record("response", "http://b.com/", _http(b"B")))
    # cut deep into the second member's deflate stream: whatever zlib
    # recovered is parsed, the rest is dropped WITHOUT raising
    recs = list(parse_warc_bytes(good + bad[: len(bad) // 2]))
    assert recs and recs[0]["target_uri"] == "http://a.com/"
    assert recs[0]["body"] == b"A"
