"""Path-prefix rollup (operators/pathtree.py): hierarchical counting
(each page counted once per ancestor prefix), depth capping, root pages,
query stripping, byte sums, host isolation, validation."""

from __future__ import annotations

import pytest

from connected_components_3d_spark.operators.pathtree import (
    path_prefix_rollup,
)


def pages_df(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def roll_map(res):
    return {
        (r["host"], r["depth"], r["prefix"]): (r["n_pages"], r["n_bytes"])
        for r in res.rollup.collect()
    }


def test_hierarchy_counts(spark):
    rows = [
        ("https://a.example.com/docs/intro?x=1", "12345"),
        ("https://a.example.com/docs/api/v1", "123"),
        ("https://a.example.com/blog", "1"),
        ("https://a.example.com/", "22"),
    ]
    got = roll_map(path_prefix_rollup(pages_df(spark, rows), max_depth=2))
    assert got[("a.example.com", 0, "/")] == (4, 11)
    assert got[("a.example.com", 1, "/docs")] == (2, 8)
    assert got[("a.example.com", 2, "/docs/intro")] == (1, 5)
    assert got[("a.example.com", 2, "/docs/api")] == (1, 3)
    assert got[("a.example.com", 1, "/blog")] == (1, 1)
    # depth-3 segment (api/v1) is capped away at max_depth=2
    assert ("a.example.com", 3, "/docs/api/v1") not in got


def test_depth_cap_vs_full(spark):
    rows = [("https://b.example.com/a/b/c/d", "x")]
    d2 = roll_map(path_prefix_rollup(pages_df(spark, rows), max_depth=2))
    d4 = roll_map(path_prefix_rollup(pages_df(spark, rows), max_depth=4))
    assert max(k[1] for k in d2) == 2
    assert ("b.example.com", 4, "/a/b/c/d") in d4


def test_hosts_isolated_and_empty_path(spark):
    rows = [
        ("https://h1.example.com", "aa"),
        ("https://h2.example.com/p", "bbb"),
    ]
    got = roll_map(path_prefix_rollup(pages_df(spark, rows)))
    assert got[("h1.example.com", 0, "/")] == (1, 2)
    assert got[("h2.example.com", 0, "/")] == (1, 3)
    assert got[("h2.example.com", 1, "/p")] == (1, 3)


def test_validation():
    with pytest.raises(AssertionError):
        path_prefix_rollup(None, max_depth=0)
