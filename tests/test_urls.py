"""URL canonicalization functions (functions/urls.py): golden-table
parity, component extraction, idempotence of the normal form."""

from __future__ import annotations

from connected_components_3d_spark.functions.urls import (
    registrable_domain,
    url_host,
    url_normalize,
    url_path,
    url_port,
    url_query_norm,
    url_scheme,
)

CASES = [
    # (url, normalized, host, domain)
    (
        "HTTPS://WWW.Example.COM:443/Path/Index.html?b=2&utm_source=x&a=1#f",
        "https://example.com/Path/Index.html?a=1&b=2",
        "www.example.com",  # url_host keeps www; normalize strips it
        "example.com",
    ),
    (
        "http://user:pw@Example.co.uk:8080/a//b/?",
        "http://example.co.uk:8080/a//b/",
        "example.co.uk",
        "example.co.uk",
    ),
    (
        "https://sub.shop.example.co.uk/x",
        "https://sub.shop.example.co.uk/x",
        "sub.shop.example.co.uk",
        "example.co.uk",
    ),
    ("http://example.com", "http://example.com/", "example.com", "example.com"),
    ("http://example.com:80/x", "http://example.com/x", "example.com", "example.com"),
    (
        "https://example.com:80/x",
        "https://example.com:80/x",
        "example.com",
        "example.com",
    ),
    (
        "https://a.com/p?utm_source=1&gclid=2",
        "https://a.com/p",
        "a.com",
        "a.com",
    ),
    (
        "https://deep.a.b.example.com/q?z=9&ref=tw&y=8",
        "https://deep.a.b.example.com/q?y=8&z=9",
        "deep.a.b.example.com",
        "example.com",
    ),
    (
        "https://a.com/p?x=1?y=2",
        "https://a.com/p?x=1?y=2",
        "a.com",
        "a.com",
    ),
    ("localhost", "://localhost/", "localhost", "localhost"),
    ("", "", "", ""),
]


def _run(spark, urls, expr):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["r"] for r in df.select(expr("url").alias("r")).collect()]


def test_golden_table(spark):
    urls = [c[0] for c in CASES]
    assert _run(spark, urls, url_normalize) == [c[1] for c in CASES]
    assert _run(spark, urls, url_host) == [c[2] for c in CASES]
    assert _run(spark, urls, registrable_domain) == [c[3] for c in CASES]


def test_components(spark):
    urls = ["HTTP://u@H.COM:81/a/b?q=1&p=2#z"]
    assert _run(spark, urls, url_scheme) == ["http"]
    assert _run(spark, urls, url_host) == ["h.com"]
    assert _run(spark, urls, url_port) == ["81"]
    assert _run(spark, urls, url_path) == ["/a/b"]
    assert _run(spark, urls, url_query_norm) == ["p=2&q=1"]


def test_idempotent(spark):
    urls = [c[0] for c in CASES if c[0]]
    once = _run(spark, urls, url_normalize)
    df = spark.createDataFrame([(u,) for u in once], "url string")
    twice = [r["r"] for r in df.select(url_normalize("url").alias("r")).collect()]
    assert twice == once
