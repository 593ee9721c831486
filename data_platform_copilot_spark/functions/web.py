"""URL canonicalization column expressions for web-corpus curation.

Crawled corpora dedup and group by URL before any content pass, and
raw URLs are noisy: scheme/host case, default ports, fragments,
tracking query parameters, parameter order, trailing slashes and
`www.` prefixes all vary across recrawls of the same page. Everything
here is a pure Column expression over JVM-side built-ins
(``try_parse_url``, regexp, array ops) — no Python UDFs — so URL-keyed
dedup of a 100 TB crawl stays inside whole-stage codegen with zero
shuffle until the final key groupBy.

(North-star extension: the reference has no web/URL surface; the
operators mirror what CCNet/C4-style pipelines do before text-level
dedup.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking parameters stripped during normalization: the standard
# analytics/click-id families every curation pipeline drops (they
# never change page content, only attribution). The generic `ref` is
# deliberately NOT stripped — on code hosts and docs sites
# `?ref=branch` selects distinct content, so stripping it would
# collapse distinct pages into one dedup key (only the unambiguous
# referrer-attribution spellings ref_src/ref_url are dropped).
TRACKING_PARAM_REGEX = (
    r"^(utm_[a-z]+|gclid|gclsrc|dclid|fbclid|msclkid|mc_eid|mc_cid|"
    r"igshid|yclid|twclid|ref_src|ref_url|spm|_ga|_gl)=")

# Country-code second-level registries where the registrable domain
# is three labels (example.co.uk), not two. A deterministic common
# subset — the full public-suffix list is a data file a production
# deployment would broadcast-join instead (documented trade).
_SECOND_LEVEL_TLDS = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "net.uk",
    "com.au", "net.au", "org.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gov.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.nz", "net.nz", "org.nz",
    "co.za", "com.mx", "com.ar", "com.tr", "com.sg", "co.kr",
)


def url_host(c: Column | str) -> Column:
    """Lowercased host with any ``www.`` prefix and userinfo removed."""
    col = F.col(c) if isinstance(c, str) else c
    host = F.lower(F.try_parse_url(F.trim(col), F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


def registered_domain(c: Column | str) -> Column:
    """Registrable domain of the URL's host: the last two labels, or
    the last three when the two-label suffix is a known second-level
    registry (``example.co.uk``). NULL for unparseable URLs."""
    host = url_host(c)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    two = F.concat_ws(".", F.slice(parts, F.greatest(n - 1, F.lit(1)), 2))
    three = F.concat_ws(".", F.slice(parts, F.greatest(n - 2, F.lit(1)), 3))
    is_2l = two.isin(*_SECOND_LEVEL_TLDS)
    return F.when(host.isNull() | (n < 2), host).otherwise(
        F.when(is_2l & (n >= 3), three).otherwise(two))


def _clean_query(c: Column) -> Column:
    """Sorted query string with tracking params and empties dropped;
    NULL when nothing survives."""
    q = F.try_parse_url(F.trim(c), F.lit("QUERY"))
    kept = F.array_sort(F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_REGEX)))
    joined = F.array_join(kept, "&")
    return F.when(q.isNull() | (F.size(kept) == 0), F.lit(None)
                  ).otherwise(joined)


def url_normalize(c: Column | str) -> Column:
    """Canonical URL: lowercase scheme + host, ``www.`` and userinfo
    stripped, default ports removed (``:80`` http / ``:443`` https),
    fragment dropped, tracking params dropped and the surviving query
    params sorted, trailing slash removed from non-root paths, empty
    path -> ``/``. NULL for rows ``try_parse_url`` cannot parse a host
    out of. Recrawl variants of one page collapse to one key."""
    col = F.col(c) if isinstance(c, str) else c
    col = F.trim(col)
    scheme = F.lower(F.try_parse_url(col, F.lit("PROTOCOL")))
    host = url_host(col)
    # try_parse_url's HOST excludes the port; recover it from AUTHORITY
    auth = F.lower(F.try_parse_url(col, F.lit("AUTHORITY")))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    keep_port = ((port != "")
                 & ~((scheme == "http") & (port == "80"))
                 & ~((scheme == "https") & (port == "443")))
    path = F.try_parse_url(col, F.lit("PATH"))
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    path = F.when(path != "/",
                  F.regexp_replace(path, r"/+$", "")).otherwise(path)
    query = _clean_query(col)
    out = F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query.isNotNull(),
               F.concat(F.lit("?"), query)).otherwise(F.lit("")))
    return F.when(scheme.isNull() | host.isNull() | (host == ""),
                  F.lit(None)).otherwise(out)
