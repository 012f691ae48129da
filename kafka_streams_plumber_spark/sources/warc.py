"""WARC (Web ARChive, ISO 28500) ingestion — the raw format crawl
corpora arrive in (Common Crawl et al.).

Processing unit is the FILE: WARC archives are sequences of
gzip members (one per record) or plain concatenated records, neither
of which is block-splittable, so the industry shape is one task per
archive — exactly what ``spark.read.format("binaryFile")`` +
``mapInPandas`` gives: the JVM distributes files to tasks, Python
parses records inside each task with Content-Length framing (no regex
over payloads, no full-file decode into strings). Parallelism = number
of archives, which is how crawl dumps are organized (thousands of
~1 GB segments).

The parser is self-contained (~60 lines; no warcio dependency):
- gzip archives: decompressed as concatenated members
  (``zlib`` handles member boundaries transparently);
- records framed by ``Content-Length`` per the spec — bodies are never
  scanned for terminators;
- for ``response`` records the HTTP headers are split off at the first
  CRLFCRLF so downstream gets the raw body bytes (feed them to
  web.html_to_text after charset decode).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("body", T.BinaryType()),
    ]
)


def parse_warc_bytes(raw: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record from raw (possibly gzipped)
    archive bytes. Pure function — unit-testable without Spark."""
    import zlib

    if raw[:2] == b"\x1f\x8b":
        out = []
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        buf = raw
        try:
            while buf:
                out.append(d.decompress(buf))
                buf = d.unused_data
                if buf:
                    d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        except zlib.error:
            # truncated/corrupt member (routine in real crawl dumps):
            # parse the members that did decompress rather than failing
            # the task — Spark would retry the same bytes 4x and abort
            # the whole multi-archive job
            pass
        raw = b"".join(out)

    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        if pos >= n or not raw[pos : pos + 5] == b"WARC/":
            break
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break  # truncated mid-header: keep what parsed so far
        headers: dict[str, str] = {}
        for line in raw[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        cl = headers.get("content-length", "")
        if not cl.isdigit():
            # spec violation: without a length the record cannot be
            # framed — resynchronize at the next record marker instead
            # of silently dropping the REST of the archive
            nxt = raw.find(b"\r\nWARC/", hdr_end)
            pos = nxt + 2 if nxt >= 0 else n
            continue
        length = int(cl)
        payload = raw[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length

        status: int | None = None
        http_ct: str | None = None
        body = payload
        if headers.get("warc-type") == "response" and payload[:5] == b"HTTP/":
            split = payload.find(b"\r\n\r\n")
            if split >= 0:
                http_head, body = payload[:split], payload[split + 4 :]
                lines = http_head.split(b"\r\n")
                parts = lines[0].split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for line in lines[1:]:
                    k, _, v = line.partition(b":")
                    if k.strip().lower() == b"content-type":
                        http_ct = v.strip().decode("ascii", "replace")
        yield {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": status,
            "http_content_type": http_ct,
            "body": body,
        }


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Read WARC archive(s) into one row per record (WARC_SCHEMA).
    ``types`` filters record types task-side (metadata/request records
    are usually noise); pass ``types=()`` for everything."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content)):
                    if types and rec["warc_type"] not in types:
                        continue
                    rec["path"] = p
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(run, schema=WARC_SCHEMA)
