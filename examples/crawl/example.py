"""End-to-end crawl curation: WARC archives -> clean, deduped corpus.

The raw-web half of the pipeline (examples/curation handles the model-
facing half), each step a scale-designed operator from this repo:

  1. WARC ingestion       (sources/warc.py: one task per archive,
                           Content-Length framing, HTTP split)
  2. HTML -> text         (web.html_to_text: codegen regexp passes)
  3. URL canonicalization (web.canonicalize_url + registrable_domain)
  4. blocklist            (web.filter_blocklist: broadcast anti-join)
  5. exact URL dedup      (first-seen canonical URL wins)
  6. near-dup removal     (dedup.minhash_dedup over extracted text)
  7. per-domain ledger    (one hash aggregate)

Run: python examples/crawl/example.py [warc_glob] [out_dir]
(with no args, synthesizes a small WARC archive to demonstrate).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
)

import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.dedup import minhash_dedup
from kafka_streams_plumber_spark.operators.web import (
    canonicalize_url,
    filter_blocklist,
    html_to_text,
    registrable_domain,
    url_host,
)
from kafka_streams_plumber_spark.plans.session import get_spark
from kafka_streams_plumber_spark.sources.warc import read_warc


def _demo_warc(tmpdir: str) -> str:
    """Synthesize a small archive (3 pages, one blocked domain, one
    near-duplicate pair) so the example runs self-contained."""
    import os

    def record(uri: str, body: str) -> bytes:
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        ).encode() + body.encode()
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{abs(hash(uri))}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        return head + http + b"\r\n\r\n"

    page = "<html><body><h1>Title</h1><p>{} content paragraph.</p></body></html>"
    raw = b"".join(
        [
            record("HTTPS://WWW.Example.COM:443/a/?utm_source=x", page.format("Alpha unique")),
            record("https://example.com/a/", page.format("Alpha unique")),  # same canon URL
            record(
                "https://other.org/b",
                page.format(
                    "Beta page with a long shared paragraph of wording "
                    "that stays identical across the two variants"
                ),
            ),
            record(
                "https://other.org/c",
                page.format(
                    "Beta page with a long shared paragraph of wording "
                    "that stays identical across the two variants indeed"
                ),
            ),
            record("https://ads.blocked.net/z", page.format("Spam")),
        ]
    )
    path = os.path.join(tmpdir, "demo.warc")
    with open(path, "wb") as f:
        f.write(raw)
    return path


def crawl_curate(spark, warc_glob: str, out_dir: str) -> dict[str, int]:
    recs = read_warc(spark, warc_glob)  # responses only, by default
    pages = recs.select(
        F.col("target_uri").alias("url"),
        html_to_text(F.decode("body", "utf-8")).alias("text"),
    )

    # canonical URL + host keys, computed once
    pages = pages.select(
        canonicalize_url(F.col("url")).alias("canon_url"),
        url_host(F.col("url")).alias("host"),
        "text",
    )

    # blocklist (inline here; production: a table of domains)
    bl = pages.sparkSession.createDataFrame([("blocked.net",)], ["domain"])
    pages = filter_blocklist(pages, bl)

    # exact dedup on the canonical URL: first-seen wins deterministically
    w = Window.partitionBy("canon_url").orderBy("text")
    pages = (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # near-dup removal over extracted text, keyed by a stable id
    pages = pages.withColumn("doc_id", F.xxhash64("canon_url"))
    kept = minhash_dedup(pages, "text", "doc_id", threshold=0.5, shingle_k=2)

    ledger = (
        kept.groupBy(registrable_domain(F.col("host")).alias("domain"))
        .agg(F.count("*").alias("n_docs"))
    )
    kept.select("doc_id", "canon_url", "host", "text").write.mode(
        "overwrite"
    ).parquet(out_dir)
    return {
        "responses": recs.count(),
        "after_blocklist_and_urldedup": pages.count(),
        "kept": kept.count(),
        "domains": ledger.count(),
    }


def main() -> None:
    import tempfile

    spark = get_spark("crawl-example", master="local[4]", shuffle_partitions=4)
    if len(sys.argv) > 2:
        glob_, out = sys.argv[1], sys.argv[2]
    else:
        tmp = tempfile.mkdtemp()
        glob_, out = _demo_warc(tmp), tmp + "/out"
    counts = crawl_curate(spark, glob_, out)
    for k, v in counts.items():
        print(f"{k}: {v}")
    spark.stop()


if __name__ == "__main__":
    main()
