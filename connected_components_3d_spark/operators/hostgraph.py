"""Host-graph projection — collapse a page-level link graph to a host-level
weighted graph (the classic web-graph aggregation behind host-level
PageRank, spam-mass, and site-level crawl scheduling).

All expression-only (native Spark SQL functions, JVM-side, whole-stage
codegen — no UDFs): host parsing is a single regexp_extract + lower +
trailing-dot strip, the projection one groupBy. The oracle replays the same
expressions in DuckDB (Java regex and RE2 agree on this pattern), so the
driver gate hash-compares the whole path (`host_graph_orders`).

Scale shape (100 TB): the groupBy((src_host, dst_host)) shuffle carries one
row per DISTINCT host pair after map-side partial aggregation — hosts are
~10^7-ish on a web corpus vs ~10^11 page edges, so the shuffle is tiny
relative to the scan; host skew (a mega-site's intra links) lands on
distinct (src,dst) keys, not one hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme (optional) → userinfo@ (optional) → host (stop at :port / path /
# query / fragment). Compatible with both Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround.
_HOST_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/?#@]*@)?([^/?#:]+)"


def host_of(url: Column | str) -> Column:
    """Registrable host of a URL (lowercased, userinfo/port/path stripped,
    trailing dot removed). Empty string for unparseable input — native
    expressions only."""
    c = F.col(url) if isinstance(url, str) else url
    return F.rtrim(F.lower(F.regexp_extract(c, _HOST_RE, 1)), F.lit("."))


def host_graph(
    edges: DataFrame,
    *,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    drop_intra: bool = True,
) -> DataFrame:
    """Project page-level link edges to (src_host, dst_host, weight).

    ``drop_intra`` removes same-host (navigational) edges — the standard
    host-graph convention; keep them to measure intra-host link mass.
    Output: (src_host, dst_host, weight:long), hosts non-empty.
    """
    g = edges.select(
        host_of(src_col).alias("src_host"), host_of(dst_col).alias("dst_host")
    ).where((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if drop_intra:
        g = g.where(F.col("src_host") != F.col("dst_host"))
    return g.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("weight")
    )


def domain_graph(
    edges: DataFrame,
    *,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    drop_intra: bool = True,
) -> DataFrame:
    """Project page-level link edges to the REGISTRABLE-DOMAIN level
    (eTLD+1 via functions/urls.registrable_domain) — the site unit that
    host aggregation splits apart (blog.example.co.uk and
    shop.example.co.uk are one owner): the right granularity for
    ownership-level spam mass, crawl budgets, and dedup attribution.

    Same shape as host_graph — map-side string algebra + one
    (src_domain, dst_domain) groupBy carrying one row per DISTINCT
    domain pair after partial aggregation. ``drop_intra`` removes
    same-domain edges. Output: (src_domain, dst_domain, weight:long)."""
    from ..functions.urls import registrable_domain

    g = edges.select(
        registrable_domain(src_col).alias("src_domain"),
        registrable_domain(dst_col).alias("dst_domain"),
    ).where((F.col("src_domain") != "") & (F.col("dst_domain") != ""))
    if drop_intra:
        g = g.where(F.col("src_domain") != F.col("dst_domain"))
    return g.groupBy("src_domain", "dst_domain").agg(
        F.count("*").alias("weight")
    )


def host_link_stats(
    edges: DataFrame,
    *,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """Per-host link profile over the RAW page edges: outgoing page-link
    count, distinct destination hosts, and intra-host fraction — the
    features a site-level spam/quality model starts from.

    Output: (host, out_links:long, out_hosts:long, intra_frac:double).
    """
    g = edges.select(
        host_of(src_col).alias("src_host"), host_of(dst_col).alias("dst_host")
    ).where((F.col("src_host") != "") & (F.col("dst_host") != ""))
    return g.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").alias("out_links"),
        F.count_distinct(
            F.when(F.col("dst_host") != F.col("src_host"), F.col("dst_host"))
        ).alias("out_hosts"),
        F.round(
            F.sum(
                F.when(F.col("dst_host") == F.col("src_host"), 1).otherwise(0)
            ).cast("double")
            / F.count("*"),
            8,
        ).alias("intra_frac"),
    )
