"""URL path-prefix rollup — the site-structure summary every crawl
operator keeps: for each host and each path prefix up to ``max_depth``
segments, how many pages live under the prefix and how much text they
carry. This is the hierarchical aggregate behind sitemap diffing, crawl
budgeting per directory, and "which section of the site exploded"
dashboards; at 10^12 pages it is the cheap first query against a fresh
crawl (Common-Crawl-style host/path reports).

Contract (native column expressions; the DuckDB gate oracle restates it
with string_split/UNNEST(range) — hash-exact): per page, host =
functions/urls.py ``url_host``, segments = non-empty '/'-separated chunks
of ``url_path`` (query/fragment excluded). The page contributes one row to
every depth d in [0, min(max_depth, #segments)]: depth 0 is the host root
(prefix '/'), depth d the prefix '/' || seg_1/…/seg_d. Per (host, depth,
prefix): n_pages and n_bytes = Σ length(text).

Scale shape: one bounded explode (≤ max_depth + 1 rows per page) + one
(host, depth, prefix)-keyed aggregate with map-side partials. Prefix keys
are high-cardinality; a genuinely hot directory is a genuinely hot key and
salts like any aggregate. No joins, no iteration, no Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_host, url_path


@dataclass
class PathRollupResult:
    # (host, depth:int, prefix, n_pages:long, n_bytes:long)
    rollup: DataFrame
    max_depth: int


def path_prefix_rollup(
    pages: DataFrame, *, max_depth: int = 3
) -> PathRollupResult:
    """Hierarchical per-host path-prefix aggregate over ``pages``
    (columns ``url``, ``text``) — see module docstring."""
    assert 1 <= max_depth <= 32
    segs = F.filter(
        F.split(url_path("url"), "/"), lambda s: s != F.lit("")
    )
    d = pages.select(
        url_host("url").alias("host"),
        segs.alias("segs"),
        F.length("text").cast("long").alias("nb"),
    )
    lv = d.select(
        "host",
        "segs",
        "nb",
        F.explode(
            F.sequence(F.lit(0), F.least(F.lit(max_depth), F.size("segs")))
        ).alias("depth"),
    ).select(
        "host",
        "depth",
        F.concat(
            F.lit("/"), F.array_join(F.slice("segs", 1, F.col("depth")), "/")
        ).alias("prefix"),
        "nb",
    )
    rollup = lv.groupBy("host", "depth", "prefix").agg(
        F.count("*").alias("n_pages"), F.sum("nb").alias("n_bytes")
    )
    return PathRollupResult(rollup, max_depth)
