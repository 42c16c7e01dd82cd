"""Crawl snapshot diffing — the between-crawls delta report (what
Common-Crawl publishes as crawl-over-crawl stats, and what every recrawl
scheduler consumes upstream of operators/recrawl.py's rate estimates):
given two snapshots of (url, text), classify every URL as added / removed
/ changed / unchanged and roll the counts up per host.

Contract (the DuckDB gate oracle restates it as a full-outer-join SQL —
hash-exact): a URL present only in ``new`` is *added*; only in ``old`` is
*removed*; present in both with different md5(text) *changed*, else
*unchanged*. Host = functions/urls.py ``url_host`` of the surviving URL.
Duplicate URLs within a snapshot collapse to their lexicographically-min
fingerprint first (deterministic, order-free). Outputs:

  statuses — (url, host, status) per URL in either snapshot
  summary  — (host, n_added, n_removed, n_changed, n_unchanged)

Scale shape: two md5-collapse aggregates (url-keyed — the natural
partitioning of a crawl store, so with both snapshots bucketed by url the
join is co-located / zero-exchange), ONE url-keyed full outer join, one
host rollup with map-side partials. No iteration, no Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_host


@dataclass
class CrawlDiffResult:
    # statuses: (url, host, status in {added, removed, changed, unchanged})
    statuses: DataFrame
    # summary: (host, n_added, n_removed, n_changed, n_unchanged)
    summary: DataFrame


def _collapse(snap: DataFrame, fp_name: str) -> DataFrame:
    return (
        snap.select(F.col("url"), F.md5(F.col("text")).alias("fp"))
        .groupBy("url")
        .agg(F.min("fp").alias(fp_name))
    )


def crawl_diff(old: DataFrame, new: DataFrame) -> CrawlDiffResult:
    """Diff two crawl snapshots (columns ``url``, ``text``) — see module
    docstring for the exact contract."""
    o = _collapse(old, "fp_old")
    n = _collapse(new, "fp_new")
    joined = o.join(n, "url", "full")
    statuses = joined.select(
        "url",
        url_host("url").alias("host"),
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
    summary = statuses.groupBy("host").agg(
        *[
            F.sum(F.when(F.col("status") == s, 1).otherwise(0))
            .cast("long")
            .alias(f"n_{s}")
            for s in ("added", "removed", "changed", "unchanged")
        ]
    )
    return CrawlDiffResult(statuses, summary)
