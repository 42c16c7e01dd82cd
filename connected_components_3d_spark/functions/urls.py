"""URL parsing / canonicalization — the crawl-side primitive the link
operators consume: redirects (operators/redirects.py), host graphs
(operators/hostgraph.py) and dedup all assume SOME canonical URL key;
this module is where that key comes from.

Pure JVM-side Column expressions (split/substring_index/array ops — no
Python UDFs, no regex beyond the literal '.' split), deliberately written
as engine-portable string algebra so the DuckDB oracle
(`driver_queries._url_normalize_sql`) states the SAME steps with
string_split/list_filter/list_sort and hash-matches bit-for-bit
(`url_normalize_docs` gate row).

Canonicalization contract (each step deterministic, order fixed):
  1. scheme and host lowercased; userinfo (user:pass@) stripped.
  2. fragment (#…) dropped.
  3. default ports stripped (:80 for http, :443 for https); other ports
     kept.
  4. leading ``www.`` stripped from the host.
  5. query: split on '&', drop empty params and tracking params
     (utm_* prefix, gclid, fbclid, msclkid, ref, _ga), sort the
     survivors lexicographically, rejoin; '?' dropped when none survive.
  6. path: empty path becomes '/'; otherwise kept verbatim (stripping a
     trailing slash changes semantics for non-root paths).

``registrable_domain`` uses a compact multi-part-suffix table (the
common two-label public suffixes: co.uk, ac.uk, com.au, co.jp, …) — a
HEURISTIC subset of the public-suffix list, good for grouping crawl
hosts; swap in the full PSL as a broadcast lookup for production.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "ref", "_ga")
TRACKING_PREFIX = "utm_"

# common two-label public suffixes (heuristic subset)
MULTI_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "co.za", "com.tr", "com.ar",
)


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _tail_join(parts: Column, sep: str) -> Column:
    """parts[2:] joined with sep. Length is size-derived — a literal
    INT_MAX length overflows slice's start+length under the lambda-filter
    evaluation path and silently yields [], so never pass one."""
    return F.array_join(
        F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))), sep
    )


def url_scheme(col: str | Column) -> Column:
    """Lowercased scheme, '' when no '://' present."""
    u = _c(col)
    return F.when(
        F.instr(u, "://") > 0,
        F.lower(F.substring_index(u, "://", 1)),
    ).otherwise(F.lit(""))


def _rest(col: str | Column) -> Column:
    """Everything after the FIRST '://' (or the whole string when no
    scheme), with the fragment dropped. Split-and-rejoin rather than
    substring_index(…, -1), which would cut at the LAST '://' if one
    appeared again later (e.g. inside a query param)."""
    u = _c(col)
    parts = F.split(u, "://")
    tail = _tail_join(parts, "://")
    r = F.when(F.instr(u, "://") > 0, tail).otherwise(u)
    return F.substring_index(r, "#", 1)


def _hostport(col: str | Column) -> Column:
    """host[:port] — rest up to the first '/' or '?', userinfo stripped,
    lowercased."""
    hp = F.substring_index(F.substring_index(_rest(col), "/", 1), "?", 1)
    return F.lower(F.substring_index(hp, "@", -1))


def url_host(col: str | Column) -> Column:
    """Lowercased host, port and userinfo stripped."""
    return F.substring_index(_hostport(col), ":", 1)


def url_port(col: str | Column) -> Column:
    """Explicit port as string, '' when absent."""
    hp = _hostport(col)
    return F.when(
        F.instr(hp, ":") > 0, F.substring_index(hp, ":", -1)
    ).otherwise(F.lit(""))


def _path_raw(col: str | Column) -> Column:
    """Path component without query; '' when the URL has no '/' after
    the host."""
    r = _rest(col)
    after = _tail_join(F.split(r, "/"), "/")
    return F.substring_index(
        F.when(F.instr(r, "/") > 0, F.concat(F.lit("/"), after)).otherwise(
            F.lit("")
        ),
        "?",
        1,
    )


def url_path(col: str | Column) -> Column:
    """Path component, '' → '/'; query stripped."""
    p = _path_raw(col)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query_norm(col: str | Column) -> Column:
    """Normalized query: empty + tracking params dropped, survivors
    sorted lexicographically; '' when nothing survives."""
    r = _rest(col)
    # everything after the FIRST '?' (split-and-rejoin keeps later '?'s)
    qtail = _tail_join(F.split(r, r"\?"), "?")
    q = F.when(F.instr(r, "?") > 0, qtail).otherwise(F.lit(""))
    params = F.split(q, "&")
    kept = F.filter(
        params,
        lambda x: (x != "")
        & ~F.substring_index(x, "=", 1).startswith(TRACKING_PREFIX)
        & ~F.substring_index(x, "=", 1).isin(*TRACKING_PARAMS),
    )
    return F.array_join(F.array_sort(kept), "&")


def url_normalize(col: str | Column) -> Column:
    """Full canonical form per the module contract. NULL/'' stay ''."""
    u = _c(col)
    scheme = url_scheme(u)
    host0 = url_host(u)
    host = F.when(
        host0.startswith("www."), F.substring(host0, 5, 2147483647)
    ).otherwise(host0)
    port = url_port(u)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = url_path(u)
    qn = url_query_norm(u)
    return F.when(u.isNull() | (u == ""), F.lit("")).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            path,
            F.when(qn != "", F.concat(F.lit("?"), qn)).otherwise(F.lit("")),
        )
    )


def registrable_domain(col: str | Column) -> Column:
    """Heuristic eTLD+1 from a URL: last 2 host labels, or last 3 when
    the trailing two form a known multi-part suffix. Hosts with ≤2
    labels (or IPs — not special-cased) return the host itself."""
    host = url_host(col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    return F.when(n <= 2, host).otherwise(
        F.when(last2.isin(*MULTI_SUFFIXES) & (n >= 3), last3).otherwise(last2)
    )
