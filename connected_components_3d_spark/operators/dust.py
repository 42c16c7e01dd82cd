"""DUST rule mining for URL query parameters — "Different URLs with
Similar Text" (Bar-Yossef, Keidar, Schonfeld: "Do Not Crawl in the DUST",
WWW 2007), restricted to the rule family that dominates real crawls:
*content-irrelevant query parameters* (session ids, tracking tags,
sort/view toggles that don't change the page). A crawler that learns
``sessionid`` is irrelevant on ``host`` collapses every URL differing only
in that parameter — fewer fetches, fewer dup documents downstream.

Contract (native column expressions end to end; the DuckDB gate oracle
restates it with list_filter/list_sort — hash-exact):

  1. Per page, strip the fragment, split at the first '?': base and query.
     Host = functions/urls.py ``url_host`` (lowercased, creds/port
     stripped). Query tokens = non-empty '&'-separated chunks; the
     parameter key of a token is the part before the first '='.
  2. For each DISTINCT parameter key k of the URL: the *residual* is
     base || '?' || the OTHER tokens sorted lexicographically — the
     canonical "URL minus k". URLs agreeing on (host, k, residual) differ
     only in k's value(s).
  3. A *group* is a (host, k, residual) class with ≥ 2 distinct URLs; it
     is *consistent* when all its pages carry one distinct content
     fingerprint (md5 of ``text``).
  4. Per (host, k): n_groups, n_consistent, and
     irrelevant ⇔ n_groups ≥ min_support AND n_consistent = n_groups —
     the DustBuster support/precision test with precision pinned to 1.

Scale shape: one explode of per-URL parameter keys (output rows =
Σ #distinct params per URL — bounded small multiple of the input), one
(host, k, residual)-keyed aggregate (high-cardinality keys — no skew
hazard beyond genuinely hot hosts, which salt like any groupBy), one
(host, k) rollup. No joins, no iteration, no Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_host


@dataclass
class DustRulesResult:
    # (host, param, n_groups, n_consistent, irrelevant)
    rules: DataFrame
    min_support: int


def param_dust_rules(
    pages: DataFrame, *, min_support: int = 2
) -> DustRulesResult:
    """Mine content-irrelevant query-parameter rules from ``pages``
    (columns ``url``, ``text``) — see module docstring for the exact
    contract."""
    assert min_support >= 1
    nofrag = F.split(F.col("url"), "#", 2).getItem(0)
    base = F.split(nofrag, "\\?", 2).getItem(0)
    query = F.when(
        F.instr(nofrag, "?") > 0, F.split(nofrag, "\\?", 2).getItem(1)
    ).otherwise(F.lit(""))
    toks = F.filter(F.split(query, "&"), lambda t: t != F.lit(""))
    d = pages.select(
        F.col("url"),
        url_host("url").alias("host"),
        base.alias("base"),
        toks.alias("toks"),
        F.md5(F.col("text")).alias("fp"),
    ).where(F.size("toks") > 0)
    keys = F.array_distinct(
        F.transform(F.col("toks"), lambda t: F.split(t, "=", 2).getItem(0))
    )
    per_param = d.select(
        "url",
        "host",
        "base",
        "toks",
        "fp",
        F.explode(keys).alias("param"),
    ).select(
        "url",
        "host",
        "param",
        "fp",
        F.concat(
            F.col("base"),
            F.lit("?"),
            F.array_join(
                F.array_sort(
                    F.filter(
                        F.col("toks"),
                        lambda t: F.split(t, "=", 2).getItem(0)
                        != F.col("param"),
                    )
                ),
                "&",
            ),
        ).alias("residual"),
    )
    groups = (
        per_param.groupBy("host", "param", "residual")
        .agg(
            F.countDistinct("url").alias("n_urls"),
            F.countDistinct("fp").alias("n_fps"),
        )
        .where(F.col("n_urls") >= 2)
    )
    rules = groups.groupBy("host", "param").agg(
        F.count("*").alias("n_groups"),
        F.sum(F.when(F.col("n_fps") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_consistent"),
    ).select(
        "host",
        "param",
        "n_groups",
        "n_consistent",
        (
            (F.col("n_groups") >= F.lit(min_support))
            & (F.col("n_consistent") == F.col("n_groups"))
        ).alias("irrelevant"),
    )
    return DustRulesResult(rules, min_support)
