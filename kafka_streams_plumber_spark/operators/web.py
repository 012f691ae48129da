"""Web/URL curation operators for crawl-derived training corpora.

Crawl pipelines key nearly everything on the URL: exact-dup removal
needs a canonical form (scheme/host case, default ports, tracking
params, fragments all vary for the same resource), per-domain quotas
and quality rollups need the registrable domain, and blocklists match
on the host. All of it is pure string expressions — whole-stage
codegen at scan speed, no Python, no shuffle until the caller
aggregates.

Canonicalization steps (the common subset of the Safe Browsing /
crawler conventions that is deterministic without network access):

1. strip the fragment (``#...``);
2. lowercase the scheme and host; strip a leading ``www.``;
3. drop default ports (``:80`` for http, ``:443`` for https);
4. drop tracking query params (``utm_*``, ``gclid``, ``fbclid``,
   ``ref``, ``mc_cid``, ``mc_eid``), sort the survivors byte-wise for
   a stable form, drop the ``?`` entirely when none survive;
5. strip one trailing ``/`` from a non-root path.

``registrable_domain`` is the public-suffix heuristic (last two
labels, or three when the second-level label is a known multi-part
suffix like ``co.uk``) — good enough for quota keys without shipping
the PSL; swap in a real PSL lookup table (broadcast join) if exact
eTLD+1 matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query-param name prefixes that never identify the resource
TRACKING_PARAM_REGEX = r"^(utm_[a-z]+|gclid|fbclid|ref|mc_cid|mc_eid)="

#: second-level labels that form a multi-part public suffix with a ccTLD
_MULTIPART_SLD = ("co", "com", "net", "org", "ac", "gov", "edu")


def url_scheme(url: Column) -> Column:
    """Lowercased scheme (text before ``://``)."""
    return F.lower(F.split_part(url, F.lit("://"), F.lit(1)))


def url_host(url: Column) -> Column:
    """Lowercased host: after ``://``, before the first ``/`` or ``?``,
    port stripped, leading ``www.`` stripped."""
    rest = F.split_part(url, F.lit("://"), F.lit(2))
    hostport = F.split_part(F.split_part(rest, F.lit("/"), F.lit(1)), F.lit("?"), F.lit(1))
    host = F.lower(F.split_part(hostport, F.lit(":"), F.lit(1)))
    return F.regexp_replace(host, r"^www\.", "")


def registrable_domain(host: Column) -> Column:
    """eTLD+1 heuristic from a lowercased host (see module docstring)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    sld = F.element_at(labels, -2)
    take3 = (n >= 3) & sld.isin(*_MULTIPART_SLD)
    return F.when(n <= 2, host).otherwise(
        F.when(
            take3,
            F.concat_ws(
                ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
            ),
        ).otherwise(F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)))
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical URL string (steps in the module docstring). Pure
    expression tree — O(1) passes over the string inside codegen."""
    nofrag = F.split_part(url, F.lit("#"), F.lit(1))
    scheme = url_scheme(nofrag)
    # everything after the FIRST '://' — split_part(…, 2) would stop at
    # the SECOND occurrence, truncating URLs that embed another URL in
    # the query (redirects/outbound links, ubiquitous in crawl data)
    sep = F.instr(nofrag, "://")
    rest = F.when(
        sep > 0, F.substring(nofrag, sep + 3, F.length(nofrag))
    ).otherwise(F.lit(""))

    hostport = F.split_part(F.split_part(rest, F.lit("/"), F.lit(1)), F.lit("?"), F.lit(1))
    host = F.lower(F.split_part(hostport, F.lit(":"), F.lit(1)))
    host = F.regexp_replace(host, r"^www\.", "")
    port = F.split_part(hostport, F.lit(":"), F.lit(2))  # "" when absent
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    hostout = F.when((port == "") | default_port, host).otherwise(
        F.concat_ws(":", host, port)
    )

    # path+query: the suffix of `rest` from the first "/" (absent -> "")
    pathq = F.when(
        F.instr(rest, "/") > 0,
        F.substring(rest, F.instr(rest, "/"), F.length(rest)),
    ).otherwise(F.lit(""))
    path = F.split_part(pathq, F.lit("?"), F.lit(1))
    qs = F.when(F.instr(pathq, "?") > 0, F.split_part(pathq, F.lit("?"), F.lit(2))).otherwise(
        F.lit("")
    )

    # tracking-param removal + byte-wise sort for a stable param order
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_REGEX),
    )
    qout = F.array_join(F.array_sort(params), "&")

    # strip the whole trailing-slash run (idempotence: '/a///' and
    # '/a/' must both canonicalize to '/a'); empty -> root
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)

    return F.concat(
        scheme,
        F.lit("://"),
        hostout,
        path,
        F.when(qout == "", F.lit("")).otherwise(F.concat(F.lit("?"), qout)),
    )


def filter_blocklist(
    df: DataFrame,
    blocklist: DataFrame,
    *,
    host_col: str = "host",
    block_col: str = "domain",
    keep_col: str | None = None,
) -> DataFrame:
    """Drop (or flag) rows whose host falls under a blocked
    registrable domain: entries are eTLD+1 domains, and every
    subdomain of an entry is blocked with it (``ads.x.com`` and
    ``x.com`` both match entry ``x.com``) — the standard crawl
    blocklist semantics.

    The match key is each host's :func:`registrable_domain`, so one
    broadcast anti-join (blocklists are thousands-to-millions of rows —
    always the small side) decides every row: no regex scans, no
    per-pattern passes. With ``keep_col`` set the result keeps all rows
    and adds a boolean instead of filtering (audit mode).
    """
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(block_col)).alias("_blocked")).distinct()
    )
    keyed = df.withColumn(
        "_rd", registrable_domain(F.lower(F.col(host_col)))
    )
    if keep_col is None:
        out = keyed.join(bl, keyed["_rd"] == bl["_blocked"], "left_anti")
        return out.drop("_rd")
    out = (
        keyed.join(bl, keyed["_rd"] == bl["_blocked"], "left")
        .withColumn(keep_col, F.col("_blocked").isNull())
        .drop("_rd", "_blocked")
    )
    return out


#: (entity, replacement) — the handful that dominate web text; a full
#: HTML5 entity table belongs in a broadcast map join if ever needed.
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: "&amp;lt;" must become "&lt;" not "<"
)


def html_to_text(html: Column) -> Column:
    """Plain text from HTML markup — the boilerplate-stripping step of
    crawl pipelines, as ONE chain of regexp passes (whole-stage
    codegen; ~6 linear scans of the string, no parser, no Python):

    1. drop comments and <script>/<style> subtrees (their text is not
       content);
    2. turn block-level closers (</p>, </div>, </li>, <br>, headings,
       table rows) into newlines so paragraph structure survives;
    3. strip every remaining tag;
    4. decode the dominant entities (&amp; last, so double-escaped
       entities decode one level, not two);
    5. collapse runs of spaces/tabs, cap blank runs at one empty line,
       trim.

    A regex pass is NOT a full HTML5 parser (malformed markup degrades
    to extra whitespace, never to an error); for DOM-accurate
    extraction plug a real parser into mapInPandas — this is the
    scale-fast default with no Python in the loop.
    """
    t = html
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?is)<script\b.*?</script\s*>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b.*?</style\s*>", " ")
    t = F.regexp_replace(
        t, r"(?i)<(?:br\s*/?|/p|/div|/li|/h[1-6]|/tr)\s*>", "\n"
    )
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"[ \t]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    # trim() strips spaces only — and the class is explicit because
    # Java \s matches \x0B while the oracle's RE2 does not
    return F.regexp_replace(t, r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$", "")
