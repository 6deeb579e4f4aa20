"""URL canonicalization (functions/url.py) — rule-by-rule pins.

Each rule from the module docstring gets an explicit case, checked through
the real Spark expression (not a reimplementation), plus a Spark-vs-DuckDB
differential over a generated variant battery so the SQL twin used by the
harness oracle can never drift from the Column form.
"""

from __future__ import annotations

import duckdb
import pytest

from ai_textbook_processor_spark.functions.url import (
    canonical_url,
    canonical_url_sql,
)

CASES = [
    # 1. scheme/host lowercase, www stripped
    ("HTTPS://WWW.Example.COM/A/b", "https://example.com/A/b"),
    # 2. default ports dropped (scheme-matched only)
    ("http://x.com:80/a", "http://x.com/a"),
    ("https://x.com:443/a", "https://x.com/a"),
    ("http://x.com:8080/a", "http://x.com:8080/a"),
    ("https://x.com:80/a", "https://x.com:80/a"),  # 80 is not https default
    # 3. trailing slash stripped; root path becomes empty
    ("https://x.com/a/", "https://x.com/a"),
    ("https://x.com/", "https://x.com"),
    # 4. tracking params dropped, survivors sorted
    ("https://x.com/a?utm_source=rss&b=2&a=1", "https://x.com/a?a=1&b=2"),
    ("https://x.com/a?fbclid=Z&gclid=Y&ref=top", "https://x.com/a"),
    ("https://x.com/a?b=2&a=1", "https://x.com/a?a=1&b=2"),
    # utm must be a param NAME prefix, not a value or substring
    ("https://x.com/a?a=utm_source", "https://x.com/a?a=utm_source"),
    ("https://x.com/a?myutm_x=1", "https://x.com/a?myutm_x=1"),
    # 5. fragment dropped
    ("https://x.com/a#sec-2", "https://x.com/a"),
    ("https://x.com/a?b=1#sec", "https://x.com/a?b=1"),
    # combined
    (
        "HTTP://WWW.News.ORG:80/p/q/?utm_campaign=x&z=9&a=1#top",
        "http://news.org/p/q?a=1&z=9",
    ),
    # malformed: no scheme://host — identity passthrough
    ("article 42", "article 42"),
    ("/relative/path", "/relative/path"),
    ("", ""),
]


@pytest.fixture(scope="module")
def canon_fn(spark):
    def run(urls):
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        rows = df.select(canonical_url("url").alias("c")).collect()
        return [r["c"] for r in rows]

    return run


def test_rules_pinned(canon_fn):
    got = canon_fn([u for u, _ in CASES])
    for (u, want), g in zip(CASES, got):
        assert g == want, f"{u!r}: {g!r} != {want!r}"


def test_idempotent(canon_fn):
    """canon(canon(u)) == canon(u) — canonical forms are fixed points."""
    once = canon_fn([u for u, _ in CASES])
    twice = canon_fn(once)
    assert twice == once


def test_sql_twin_matches_spark(canon_fn):
    """The DuckDB SQL twin derives the same canonical form for every
    pinned case and for a generated battery of cosmetic variants."""
    urls = [u for u, _ in CASES]
    for host in ("WWW.Site.COM", "site.com", "a.b.org:443"):
        for path in ("/x", "/x/", "/", ""):
            for q in ("", "?utm_source=a", "?b=2&a=1&utm_x=1", "?only=1"):
                for frag in ("", "#f"):
                    urls.append(f"https://{host}{path}{q}{frag}")
    spark_out = canon_fn(urls)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
    sql_out = [
        r[0]
        for r in con.execute(
            f"SELECT {canonical_url_sql('url')} FROM t"
        ).fetchall()
    ]
    assert spark_out == sql_out


def test_url_domain(canon_fn, spark):
    from pyspark.sql import functions as F
    from ai_textbook_processor_spark.functions.url import (
        canonical_url,
        url_domain,
        url_domain_sql,
    )

    cases = [
        ("https://WWW.Site.COM/a", "site.com"),
        ("http://x.org:8080/a", "x.org"),   # non-default port stripped from domain
        ("https://a.b.c.net/p?q=1#f", "a.b.c.net"),
        ("not a url", ""),                   # malformed passthrough -> ''
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["d"]
        for r in df.select(url_domain(canonical_url("url")).alias("d")).collect()
    ]
    assert got == [w for _, w in cases]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u, _ in cases])
    from ai_textbook_processor_spark.functions.url import canonical_url_sql

    sql_out = [
        r[0]
        for r in con.execute(
            f"SELECT {url_domain_sql(canonical_url_sql('url'))} FROM t"
        ).fetchall()
    ]
    assert sql_out == got
