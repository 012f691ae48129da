"""URL canonicalization / domain operators (operators/web.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.web import (
    canonicalize_url,
    registrable_domain,
    url_host,
)


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [
        r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]


def test_canonicalize_strips_fragment_port_tracking_and_sorts(spark):
    out = _canon(
        spark,
        ["HTTPS://WWW.Example.COM:443/A/B/?utm_source=x&b=2&a=1#frag"],
    )
    assert out == ["https://example.com/A/B?a=1&b=2"]


def test_canonicalize_keeps_nondefault_port_and_path_case(spark):
    out = _canon(spark, ["http://Example.com:8080/CaseSensitive"])
    assert out == ["http://example.com:8080/CaseSensitive"]


def test_canonicalize_root_and_empty_path(spark):
    assert _canon(spark, ["https://example.com", "https://example.com/"]) == [
        "https://example.com/",
        "https://example.com/",
    ]


def test_canonicalize_drops_query_when_only_tracking(spark):
    out = _canon(spark, ["https://e.com/p?utm_campaign=a&gclid=1&fbclid=2"])
    assert out == ["https://e.com/p"]


def test_canonicalize_is_idempotent(spark):
    url = "HTTPS://WWW.Example.COM:443/A/?b=2&a=1&utm_source=x#f"
    once = _canon(spark, [url])
    assert _canon(spark, once) == once


def test_url_host_and_registrable_domain(spark):
    df = spark.createDataFrame(
        [
            ("https://www.news.bbc.co.uk/x",),
            ("https://a.b.example.com/",),
            ("http://localhost:8080/",),
        ],
        ["url"],
    )
    rows = df.select(
        url_host(F.col("url")).alias("h"),
        registrable_domain(url_host(F.col("url"))).alias("d"),
    ).collect()
    assert [(r["h"], r["d"]) for r in rows] == [
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("a.b.example.com", "example.com"),
        ("localhost", "localhost"),
    ]


def test_canonicalize_preserves_embedded_urls_in_query(spark):
    """Crawl URLs routinely embed another URL (redirects, share links):
    the split must stop at the FIRST '://', not the second."""
    out = _canon(
        spark, ["https://example.com/redir?u=http://target.com/page"]
    )
    assert out == ["https://example.com/redir?u=http://target.com/page"]


def test_filter_blocklist_blocks_subdomains(spark):
    from kafka_streams_plumber_spark.operators.web import filter_blocklist

    hosts = spark.createDataFrame(
        [
            (1, "ads.bad.com"),
            (2, "bad.com"),
            (3, "good.com"),
            (4, "bad.com.evil.org"),  # different registrable domain
        ],
        ["doc_id", "host"],
    )
    bl = spark.createDataFrame([("bad.com",)], ["domain"])
    kept = {r["doc_id"] for r in filter_blocklist(hosts, bl).collect()}
    assert kept == {3, 4}
    # audit mode flags instead of dropping
    flagged = {
        r["doc_id"]: r["ok"]
        for r in filter_blocklist(hosts, bl, keep_col="ok").collect()
    }
    assert flagged == {1: False, 2: False, 3: True, 4: True}


def test_html_to_text_strips_boilerplate_decodes_entities(spark):
    from kafka_streams_plumber_spark.operators.web import html_to_text

    html = (
        '<html><head><script>var x = "<p>ignore</p>";</script>'
        "<style>p{color:red}</style></head><body><h1>Title</h1>"
        "<p>First &amp; second &lt;tag&gt;.</p><!-- hidden -->"
        "<div>A<br>B</div><ul><li>one</li><li>two</li></ul></body></html>"
    )
    df = spark.createDataFrame([(1, html)], ["id", "h"])
    out = df.select(html_to_text(F.col("h")).alias("t")).collect()[0]["t"]
    assert out == "Title\nFirst & second <tag>.\nA\nB\none\ntwo"
    assert "script" not in out and "color" not in out and "hidden" not in out


def test_html_to_text_double_escape_decodes_one_level(spark):
    from kafka_streams_plumber_spark.operators.web import html_to_text

    df = spark.createDataFrame([(1, "<p>&amp;lt;</p>")], ["id", "h"])
    out = df.select(html_to_text(F.col("h")).alias("t")).collect()[0]["t"]
    assert out == "&lt;"  # one decode level, not "<"
