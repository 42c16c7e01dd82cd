"""Crawl snapshot diff (operators/crawldiff.py): status classification,
within-snapshot duplicate collapse, host rollup, degenerate snapshots."""

from __future__ import annotations

from connected_components_3d_spark.operators.crawldiff import crawl_diff


def snap_df(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_statuses_and_summary(spark):
    old = snap_df(
        spark,
        [
            ("https://a.example.com/keep", "same"),
            ("https://a.example.com/edit", "v1"),
            ("https://a.example.com/gone", "bye"),
            ("https://b.example.com/x", "bx"),
        ],
    )
    new = snap_df(
        spark,
        [
            ("https://a.example.com/keep", "same"),
            ("https://a.example.com/edit", "v2"),
            ("https://a.example.com/fresh", "hi"),
            ("https://b.example.com/x", "bx"),
        ],
    )
    res = crawl_diff(old, new)
    st = {r["url"]: r["status"] for r in res.statuses.collect()}
    assert st == {
        "https://a.example.com/keep": "unchanged",
        "https://a.example.com/edit": "changed",
        "https://a.example.com/gone": "removed",
        "https://a.example.com/fresh": "added",
        "https://b.example.com/x": "unchanged",
    }
    sm = {
        r["host"]: (
            r["n_added"],
            r["n_removed"],
            r["n_changed"],
            r["n_unchanged"],
        )
        for r in res.summary.collect()
    }
    assert sm["a.example.com"] == (1, 1, 1, 1)
    assert sm["b.example.com"] == (0, 0, 0, 1)


def test_duplicate_urls_collapse_min_fp(spark):
    """Dup URLs in one snapshot collapse to the lexicographically-min
    fingerprint before comparison — deterministic regardless of row
    order."""
    old = snap_df(
        spark,
        [("https://c.example.com/p", "aaa"), ("https://c.example.com/p", "bbb")],
    )
    import hashlib

    fps = sorted(
        hashlib.md5(t.encode()).hexdigest() for t in ("aaa", "bbb")
    )
    winner = "aaa" if hashlib.md5(b"aaa").hexdigest() == fps[0] else "bbb"
    new = snap_df(spark, [("https://c.example.com/p", winner)])
    res = crawl_diff(old, new)
    st = {r["url"]: r["status"] for r in res.statuses.collect()}
    assert st["https://c.example.com/p"] == "unchanged"


def test_empty_snapshots(spark):
    e = snap_df(spark, [])
    s = snap_df(spark, [("https://d.example.com/p", "t")])
    assert {
        r["status"] for r in crawl_diff(e, s).statuses.collect()
    } == {"added"}
    assert {
        r["status"] for r in crawl_diff(s, e).statuses.collect()
    } == {"removed"}
    assert crawl_diff(e, e).statuses.count() == 0
