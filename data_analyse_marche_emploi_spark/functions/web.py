"""Web-corpus scalar functions: HTML boilerplate stripping and URL
canonicalization — the first two transforms of any crawl-to-training
pipeline, kept as pure Column expression chains (JVM regexp engine,
whole-stage codegen; no Python in the hot path).

Reference parity: the reference pipeline ingests an already-clean API
feed (ingestion-elasticsearch.py:132-167) — these extend the engine to
raw-crawl inputs the way SURVEY.md §2.C's mutate chain cleans offer
text.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["html_strip", "url_normalize"]


def html_strip(col: Column) -> Column:
    """Plain text out of an HTML fragment: drop <script>/<style>
    subtrees (their TEXT is not content), strip every remaining tag,
    decode the common entities, collapse whitespace. Deliberately a
    regex pipeline, not a parser: at corpus scale the 99 % case is
    boilerplate removal ahead of quality gates, and a full HTML5
    parser belongs in a mapInPandas stage only when fidelity demands
    it (same decode-tier split as the media codecs)."""
    c = F.regexp_replace(col, r"(?is)<(script|style)\b[^>]*>.*?</\1>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in [
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # LAST: &amp;lt; must become &lt;, not <
    ]:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def url_normalize(col: Column) -> Column:
    """Canonical URL for crawl dedup: lowercase scheme+host, drop the
    default port (:80 http / :443 https), drop the fragment, drop
    tracking params (utm_*, fbclid, gclid), SORT the surviving query
    params (param order is presentation, not identity), and strip one
    trailing slash from a non-root path. Every step is a Column
    expression; the query-param sort is split → filter → array_sort →
    join, all JVM-side.

    The classic crawl trap this kills: the same page fetched as
    ``HTTP://Host.com:80/a/?utm_source=x&b=1&a=2`` and
    ``http://host.com/a?a=2&b=1`` must dedup together."""
    c = col
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.regexp_replace(host, r":80$", "")
    host = F.regexp_replace(host, r":443$", "")
    rest = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.regexp_replace(path, r"(.)/$", r"$1")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.rlike(r"^(utm_[^=]*|fbclid|gclid)(=|$)"),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
    )
