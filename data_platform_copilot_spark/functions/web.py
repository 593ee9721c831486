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

import os
from pathlib import Path

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

# Public Suffix List snapshot shipped with the package (subset of
# publicsuffix.org covering every rule form + the high-traffic
# registries; regenerate/extend with tools/fetch_psl.py or point
# SPARK_GRAFT_PSL_FILE at a full public_suffix_list.dat download).
_PSL_SNAPSHOT = Path(__file__).parent / "data" / "public_suffix_snapshot.dat"
_PSL_ENV = "SPARK_GRAFT_PSL_FILE"
_psl_cache: dict[str, tuple | None] = {}


def parse_psl(text: str) -> tuple[
        frozenset[str], frozenset[str], frozenset[str]]:
    """Parse Public Suffix List text (the official format:
    ``//`` comments, blank lines, plain rules, ``*.`` wildcard rules,
    ``!`` exception rules; ICANN and private sections both included,
    as the official algorithm defaults to). Returns
    ``(exact, wildcard_tails, exceptions)`` — wildcard rules are
    stored as their tail (``*.kawasaki.jp`` -> ``kawasaki.jp``).

    IDN labels are matched as written (the PSL publishes both U-label
    and punycode forms in the full file; the snapshot subset is
    ASCII-only). Hosts should be lowercased before matching —
    ``url_host`` already does this."""
    exact, wild, exc = set(), set(), set()
    for line in text.splitlines():
        rule = line.strip()
        if not rule or rule.startswith("//"):
            continue
        # the official file ends rules at the first whitespace
        rule = rule.split()[0].lower()
        if rule.startswith("!"):
            exc.add(rule[1:])
        elif rule.startswith("*."):
            wild.add(rule[2:])
        else:
            exact.add(rule)
    return frozenset(exact), frozenset(wild), frozenset(exc)


def load_psl(path: str | Path) -> tuple[
        frozenset[str], frozenset[str], frozenset[str]]:
    """``parse_psl`` over a filesystem file (a downloaded
    public_suffix_list.dat)."""
    return parse_psl(Path(path).read_text(encoding="utf-8"))


def _psl_rules() -> tuple | None:
    """Cached rule sets: $SPARK_GRAFT_PSL_FILE if set, else the
    packaged snapshot via importlib.resources — which resolves inside
    a --py-files zip too, where a Path(__file__)-relative read raises
    NotADirectoryError and would silently flip registered_domain to
    the weaker heuristic (r10 review). None (heuristic fallback) when
    nothing is readable."""
    key = os.environ.get(_PSL_ENV) or "<packaged>"
    if key not in _psl_cache:
        try:
            if key == "<packaged>":
                from importlib import resources
                text = (resources.files("data_platform_copilot_spark"
                                        ".functions")
                        .joinpath("data/public_suffix_snapshot.dat")
                        .read_text(encoding="utf-8"))
                _psl_cache[key] = parse_psl(text)
            else:
                _psl_cache[key] = load_psl(key)
        except (OSError, ModuleNotFoundError):
            _psl_cache[key] = None
    return _psl_cache[key]


# Country-code second-level registries where the registrable domain
# is three labels (example.co.uk), not two. The deterministic
# fallback used only when no PSL file is readable.
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


def _raw_host(c: Column | str) -> Column:
    """Lowercased host as parsed (userinfo removed, ``www.`` kept)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.lower(F.try_parse_url(F.trim(col), F.lit("HOST")))


def url_host(c: Column | str) -> Column:
    """Lowercased host with any ``www.`` prefix and userinfo removed."""
    return F.regexp_replace(_raw_host(c), r"^www\.", "")


def _in_set(col: Column, values: frozenset[str]) -> Column:
    """Literal membership probe. Catalyst rewrites In over >10
    literals to InSet (hash-set probe, whole-stage codegen), so even
    the full ~10k-rule PSL costs O(1) per candidate with no join, no
    broadcast exchange, and no Python stage."""
    if not values:
        return F.lit(False)
    return col.isin(*sorted(values))


def host_label_candidates(host: Column) -> Column:
    """The n dot-joined suffix candidates of an n-label host,
    shortest first (``a.b.c`` -> ``[c, b.c, a.b.c]``) — the probe
    array of the PSL algorithm. Layer this as its own projection
    column when the host is a projected attribute: the rule probes
    reference the candidate array from INSIDE lambda bodies, and an
    interpreted higher-order function re-evaluates non-lambda body
    subexpressions per element — an inline candidate array (and the
    host parse below it) would be rebuilt/re-parsed for every probe
    (r14 measured on url_canonicalization)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    ks = F.sequence(F.lit(1), n)
    return F.transform(
        ks, lambda k: F.array_join(F.slice(parts, n - k + 1, k), "."))


def psl_domain_from_candidates(host: Column, cands: Column,
                               rules: tuple) -> Column:
    """PSL resolution over a prebuilt ``host_label_candidates`` array
    (pass both as attributes; see there). Same contract as
    ``_psl_registered_domain``."""
    exact, wild, exc = rules
    n = F.size(cands)
    ks = F.sequence(F.lit(1), n)
    exc_k = F.array_max(F.transform(
        ks, lambda k: F.when(_in_set(F.element_at(cands, k), exc), k)
        .otherwise(F.lit(0))))
    exact_k = F.array_max(F.transform(
        ks, lambda k: F.when(_in_set(F.element_at(cands, k), exact), k)
        .otherwise(F.lit(0))))
    wild_k = F.array_max(F.transform(
        ks, lambda k: F.when(
            (k > 1) & _in_set(F.element_at(cands, k - 1), wild), k)
        .otherwise(F.lit(0))))
    ps_len = F.when(exc_k > 0, exc_k - 1).otherwise(
        F.greatest(exact_k, wild_k, F.lit(1)))
    return F.when(host.isNull() | (host == ""), F.lit(None)).otherwise(
        F.when(n > ps_len, F.try_element_at(cands, ps_len + 1))
        .otherwise(F.lit(None)))


def _psl_registered_domain(host: Column, rules: tuple) -> Column:
    """Public Suffix List algorithm (publicsuffix.org/list/) as a pure
    Column expression. For a host of n labels, build the n dot-joined
    suffix candidates (shortest first), probe each against the rule
    sets, and take the registrable domain one label above the winning
    public suffix:

    - exception rule match at k labels -> public suffix is k-1 labels,
      registrable domain is the matching candidate itself;
    - else the longest match wins among exact rules (suffix length k)
      and wildcard rules (tail match at k-1 -> suffix length k), with
      the implicit ``*`` rule (suffix length 1) as the floor;
    - a host that IS a public suffix (n == suffix length) has no
      registrable domain -> NULL, per the official algorithm (this is
      the one divergence from the pre-PSL heuristic, which returned
      single-label hosts unchanged).

    Everything is array/InSet codegen — ~n^2 tiny string joins per row
    for n = label count (<=5 in practice), zero shuffle. When the
    caller controls the DataFrame, layer the host and the candidate
    array as projection columns and call
    ``psl_domain_from_candidates`` directly (see
    ``host_label_candidates`` for why)."""
    return psl_domain_from_candidates(
        host, host_label_candidates(host), rules)


def registered_domain(c: Column | str, *, use_psl: bool = True) -> Column:
    """Registrable domain of the URL's host per the Public Suffix List
    algorithm, backed by the packaged PSL snapshot (override with
    $SPARK_GRAFT_PSL_FILE pointing at a full public_suffix_list.dat).
    Handles multi-label registries (``example.co.uk``,
    ``example.com.br``), wildcard rules (``*.kawasaki.jp``, ``*.bd``),
    exception rules (``!city.kawasaki.jp``), and private-section
    boundaries (``user.github.io``). NULL for unparseable URLs and for
    hosts that are themselves public suffixes. Falls back to the
    two/three-label heuristic when no PSL file is readable (or with
    ``use_psl=False``)."""
    rules = _psl_rules() if use_psl else None
    if rules is not None:
        # match on the TRUE host (www. kept): registration boundaries
        # are defined on the real name — e.g. the PSL exception rule
        # !www.ck makes www.ck itself registrable; stripping www first
        # would mis-resolve it, and for every ordinary host the extra
        # www label changes nothing (ps_len stays the same).
        return _psl_registered_domain(_raw_host(c), rules)
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
    return _clean_query_from_raw(
        F.try_parse_url(F.trim(c), F.lit("QUERY")))


def _clean_query_from_raw(q: Column) -> Column:
    """``_clean_query`` over an already-extracted raw QUERY column."""
    kept = F.array_sort(F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_REGEX)))
    joined = F.array_join(kept, "&")
    return F.when(q.isNull() | (F.size(kept) == 0), F.lit(None)
                  ).otherwise(joined)


def url_normalize_fields(c: Column | str) -> dict[str, Column]:
    """The five ``try_parse_url`` extractions ``url_normalize``
    assembles from, as independent expressions — project these as
    intermediate columns and feed the attributes to
    ``url_normalize_from_fields`` when the caller controls the
    DataFrame. Inline, the assembled tree references each extraction
    several times and contains a lambda (the tracking-param filter),
    which exempts the WHOLE tree from codegen subexpression
    elimination — every reference re-parses the URL (r14 measured:
    url_canonicalization, the heaviest registry entry, was
    re-parse-bound)."""
    col = F.col(c) if isinstance(c, str) else c
    col = F.trim(col)
    return {
        "scheme": F.lower(F.try_parse_url(col, F.lit("PROTOCOL"))),
        "host": url_host(col),
        # try_parse_url's HOST excludes the port; recover it from
        # AUTHORITY
        "auth": F.lower(F.try_parse_url(col, F.lit("AUTHORITY"))),
        "raw_path": F.try_parse_url(col, F.lit("PATH")),
        "raw_query": F.try_parse_url(col, F.lit("QUERY")),
    }


def url_normalize_from_fields(scheme: Column, host: Column,
                              auth: Column, raw_path: Column,
                              raw_query: Column) -> Column:
    """Assemble the canonical URL from pre-extracted fields (see
    ``url_normalize_fields``); expression-identical to
    ``url_normalize``'s output for the same URL."""
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    keep_port = ((port != "")
                 & ~((scheme == "http") & (port == "80"))
                 & ~((scheme == "https") & (port == "443")))
    path = F.when(raw_path.isNull() | (raw_path == ""),
                  F.lit("/")).otherwise(raw_path)
    path = F.when(path != "/",
                  F.regexp_replace(path, r"/+$", "")).otherwise(path)
    query = _clean_query_from_raw(raw_query)
    out = F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query.isNotNull(),
               F.concat(F.lit("?"), query)).otherwise(F.lit("")))
    return F.when(scheme.isNull() | host.isNull() | (host == ""),
                  F.lit(None)).otherwise(out)


def url_normalize(c: Column | str) -> Column:
    """Canonical URL: lowercase scheme + host, ``www.`` and userinfo
    stripped, default ports removed (``:80`` http / ``:443`` https),
    fragment dropped, tracking params dropped and the surviving query
    params sorted, trailing slash removed from non-root paths, empty
    path -> ``/``. NULL for rows ``try_parse_url`` cannot parse a host
    out of. Recrawl variants of one page collapse to one key."""
    f = url_normalize_fields(c)
    return url_normalize_from_fields(
        f["scheme"], f["host"], f["auth"], f["raw_path"], f["raw_query"])
