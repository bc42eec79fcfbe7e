"""URL normalization for crawl-scale corpus pipelines.

Web-crawl dedup starts at the URL: the same page arrives as
``HTTP://Example.com/a/?utm_source=x#frag`` and
``http://example.com/a``, and URL-level canonicalization removes the
bulk of trivial duplicates *before* any content hashing (CCNet and
RefinedWeb both canonicalize URLs ahead of MinHash).  Everything here
is JVM expressions (``parse_url`` + regex + array builtins) — one
codegen'd projection per row, zero Python, zero shuffles, so it
composes with scan-time filters at any corpus size.

Canonicalization contract (deliberately conservative — never merges
URLs that could be different resources):
  * scheme and host lowercased, leading ``www.`` dropped;
  * fragment dropped (never sent to the server);
  * tracking params dropped (utm_*, fbclid, gclid, msclkid, ref);
  * surviving query params SORTED (param order is almost never
    semantic; sorting merges permutations);
  * trailing slash dropped from non-root paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that identify campaigns/clicks, not resources
TRACKING_PARAM_REGEX = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="

#: multi-label public suffixes the 2-label fallback would get wrong.
#: The real list is Mozilla's PSL (thousands of entries — ship it as a
#: broadcast lookup in production); these cover the common ccTLD SLDs.
MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.tr", "com.ar", "com.sg",
)


def _part(url: Column, part: str) -> Column:
    return F.parse_url(url, F.lit(part))


def url_host(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` removed; null for
    unparseable input (PERMISSIVE — bad rows filter, never crash)."""
    host = F.lower(_part(url, "HOST"))
    return F.regexp_replace(host, r"^www\.", "")


def url_registered_domain(url: Column) -> Column:
    """The registrable domain (eTLD+1): ``news.bbc.co.uk`` →
    ``bbc.co.uk``, ``a.b.example.com`` → ``example.com``.  Heuristic
    public-suffix handling via :data:`MULTI_LABEL_SUFFIXES`; per-domain
    corpus stats (crawl budgets, per-site caps, Gopher's per-domain
    dedup) group on this, not on the raw host."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.array_join(F.slice(parts, -2, 2), ".")
    last3 = F.array_join(F.slice(parts, -3, 3), ".")
    is_multi = last2.isin(*MULTI_LABEL_SUFFIXES)
    return (
        F.when(host.isNull() | (n <= 2), host)
        .when(is_multi & (n >= 3), last3)
        .otherwise(last2)
    )


def url_query_params(url: Column, drop_tracking: bool = True) -> Column:
    """Query parameters as a SORTED array of ``k=v`` strings, tracking
    params optionally removed.  Empty array when there is no query."""
    q = _part(url, "QUERY")
    arr = F.when(
        q.isNull() | (q == ""), F.array().cast("array<string>")
    ).otherwise(F.split(q, "&"))
    if drop_tracking:
        arr = F.filter(
            arr, lambda kv: ~kv.rlike(TRACKING_PARAM_REGEX)
        )
    return F.array_sort(arr)


def canonicalize_url(url: Column) -> Column:
    """Canonical form per the module contract; null stays null."""
    scheme = F.lower(_part(url, "PROTOCOL"))
    host = url_host(url)
    path = F.coalesce(_part(url, "PATH"), F.lit(""))
    # trailing slash is noise on non-root paths only
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        path.substr(F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    params = url_query_params(url)
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        scheme.isNull() | host.isNull(), F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, path, query))
