"""URL canonicalization — the web-corpus URL-dedup prerequisite.

Every large crawl pipeline (CCNet, RefinedWeb §"URL filtering/dedup")
collapses cosmetic URL variants before any content work: the same page
arrives as ``https://WWW.x.com/a/``, ``https://x.com/a?utm_source=rss``
and ``https://x.com/a#frag``, and exact-URL dedup without canonical form
triple-counts it.  The reference service takes URLs as given
(``/root/reference/routes/route.py`` passes ``source_url`` straight
through), so this is part of the training-data family the engine adds.

All pure JVM Column expressions (regexp + array built-ins — no UDF, no
shuffle): canonicalization is a row-local map and stays inside
whole-stage codegen; the dedup that follows it is an ordinary
hash-groupBy on the canonical string.

Rules (each independently pinned by tests/test_url.py):

1. scheme and host lowercase; a leading ``www.`` is stripped
2. default ports dropped (``:80`` http, ``:443`` https)
3. path: trailing ``/`` stripped (root path becomes empty)
4. query: tracking params dropped (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``), survivors SORTED bytewise and rejoined — param order never
   distinguishes two URLs
5. fragment dropped

The equivalent SQL lives in the harness oracles (url_canon_dedup), so
DuckDB re-derives every canonical form independently.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking-parameter pattern, anchored at the param name
TRACKING_RE = "^(utm_[a-z]+|fbclid|gclid|ref)="

_URL_RE = r"^([a-zA-Z]+)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def canonical_url(url: Column | str) -> Column:
    """Canonical form of ``url`` per the module rules, as one JVM-side
    expression.  Malformed values (no ``scheme://host``) pass through
    unchanged — a quarantine-style identity, never an error."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    host0 = F.lower(F.regexp_extract(u, _URL_RE, 2))
    host1 = F.regexp_replace(host0, "^www\\.", "")
    host = F.when(
        ((scheme == "http") & host1.endswith(":80"))
        | ((scheme == "https") & host1.endswith(":443")),
        F.regexp_replace(host1, ":[0-9]+$", ""),
    ).otherwise(host1)
    path = F.regexp_replace(F.regexp_extract(u, _URL_RE, 3), "/$", "")
    q = F.regexp_extract(u, _URL_RE, 4)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(q, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_RE),
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(canon)


def canonical_url_sql(expr: str) -> str:
    """The DuckDB twin of :func:`canonical_url` over SQL expression
    ``expr`` — written against DuckDB's list/regexp built-ins so the
    oracle derives every canonical form independently of Spark."""
    url_re = r"^([a-zA-Z]+)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"
    scheme = f"lower(regexp_extract({expr}, '{url_re}', 1))"
    host0 = f"regexp_replace(lower(regexp_extract({expr}, '{url_re}', 2)), '^www\\.', '')"
    host = (
        f"CASE WHEN ({scheme} = 'http' AND {host0} LIKE '%:80')"
        f"       OR ({scheme} = 'https' AND {host0} LIKE '%:443')"
        f"     THEN regexp_replace({host0}, ':[0-9]+$', '')"
        f"     ELSE {host0} END"
    )
    path = f"regexp_replace(regexp_extract({expr}, '{url_re}', 3), '/$', '')"
    kept = (
        f"array_to_string(list_sort(list_filter("
        f"string_split(regexp_extract({expr}, '{url_re}', 4), '&'),"
        f" p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_RE}'))), '&')"
    )
    return (
        f"CASE WHEN {scheme} = '' THEN {expr} ELSE "
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {kept} <> '' THEN '?' || {kept} ELSE '' END END"
    )


#: host component of a CANONICAL url (scheme-stripped, port-stripped);
#: '' for malformed passthrough rows — same value both engines
_DOMAIN_RE = r"^[a-z]+://([^/:?#]*)"


def url_domain(canon: Column | str) -> Column:
    """Registrable host of a canonical URL ('' when the row was malformed
    passthrough) — the grouping key for domain blocklists and per-domain
    caps."""
    c = F.col(canon) if isinstance(canon, str) else canon
    return F.regexp_extract(c, _DOMAIN_RE, 1)


def url_domain_sql(expr: str) -> str:
    """DuckDB twin of :func:`url_domain` (regexp_extract returns '' on
    no-match in both engines)."""
    return f"regexp_extract({expr}, '{_DOMAIN_RE}', 1)"
