"""The per-row invariant [BASELINE.json:15]: byte-identical extracted text
per url, distributed (pandas UDF) vs single-node (pure Python loop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from connected_components_3d_spark.functions.extraction import (
    extract_hrefs,
    extract_hrefs_py,
    extract_text,
    extract_text_py,
    normalize_url,
)
from connected_components_3d_spark.sources.pages import synthetic_pages


def test_extract_text_byte_parity(spark):
    pages = synthetic_pages(spark, 200, n_hosts=10)
    spark_rows = (
        pages.select("url", "html", extract_text(F.col("html")).alias("text"))
        .orderBy("url")
        .collect()
    )
    assert len(spark_rows) == 200
    for r in spark_rows:
        local = extract_text_py(bytes(r["html"]))
        assert r["text"] == local, f"text mismatch for {r['url']}"
        assert r["text"].encode("utf-8") == local.encode("utf-8")


def test_extract_hrefs_parity_and_normalization(spark):
    pages = synthetic_pages(spark, 100, n_hosts=7)
    rows = (
        pages.select(
            "url", "html", extract_hrefs(F.col("html"), F.col("url")).alias("hrefs")
        )
        .orderBy("url")
        .collect()
    )
    for r in rows:
        local = extract_hrefs_py(bytes(r["html"]), r["url"])
        assert list(r["hrefs"]) == local
        # relative "/p/N#frag" resolves against the page host, fragment gone
        assert any("/p/" in h for h in local)
        assert all("#" not in h for h in local)
        assert all(h.startswith("http") for h in local)  # mailto: rejected


def test_extract_text_rules():
    html = (
        b"<html><head><title>T</title><script>var x = '<p>no</p>';</script>"
        b"<style>p {}</style></head><body><p>Hello &amp; world</p>"
        b"<!-- comment --><div>two\n\nlines</div></body></html>"
    )
    txt = extract_text_py(html)
    assert txt == "T Hello & world two lines"
    assert extract_text_py(None) is None
    assert extract_text_py(b"") == ""


def test_normalize_url():
    base = "https://Site1.Example/p/1"
    assert normalize_url("/p/2#x", base) == "https://site1.example/p/2"
    assert normalize_url("HTTPS://A.B/c?q=1#f", None) == "https://a.b/c?q=1"
    assert normalize_url("mailto:x@y.z", base) is None
    assert normalize_url("javascript:void(0)", base) is None
    assert normalize_url("", base) is None
    assert normalize_url("#frag", base) is None


def test_pages_deterministic_under_partitioning(spark):
    a = synthetic_pages(spark, 300, n_hosts=10, num_partitions=2)
    b = synthetic_pages(spark, 300, n_hosts=10, num_partitions=16)
    ah = a.select(F.md5(F.col("html")).alias("h")).orderBy("h").collect()
    bh = b.select(F.md5(F.col("html")).alias("h")).orderBy("h").collect()
    assert ah == bh


def test_extract_text_robustness_rules():
    """Round-5 parser hardening: CDATA, non-content containers, unclosed
    script, quoted '>' inside attributes."""
    # noscript/template/svg/iframe inner text never leaks
    html = (
        b"<body>A<noscript>enable js</noscript>"
        b"<template><p>tpl</p></template>"
        b"<svg><text>vector</text></svg>"
        b"<iframe>fallback</iframe>B</body>"
    )
    assert extract_text_py(html) == "A B"
    # CDATA dropped
    assert extract_text_py(b"x<![CDATA[ <p>raw</p> ]]>y") == "x y"
    # truncated page: unclosed <script> swallows to end-of-document
    assert extract_text_py(b"keep<script>var a='leak';") == "keep"
    # '>' inside a quoted attribute does not terminate the tag
    assert extract_text_py(b'<a title="a>b">link</a>') == "link"
    # unterminated quote: fallback stripper still removes the remnant tag
    assert "href" not in (extract_text_py(b'pre<a href="u>post') or "href")
    # comment containing a full script block vanishes as one unit
    assert (
        extract_text_py(b"t<!-- <script>x</script><p>c</p> -->u") == "t u"
    )


def test_extract_hrefs_skip_dead_regions():
    html = (
        b'<a href="http://live.example/a">x</a>'
        b'<!-- <a href="http://dead.example/c">c</a> -->'
        b'<script>var s = \'<a href="http://dead.example/s">s</a>\';</script>'
        b'<![CDATA[<a href="http://dead.example/d">d</a>]]>'
        b'<a href="http://live.example/b">y</a>'
    )
    got = extract_hrefs_py(html, None)
    assert got == ["http://live.example/a", "http://live.example/b"]
