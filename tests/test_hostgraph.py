"""Host-graph projection (operators/hostgraph.py): host parsing edge cases,
projection weights vs a single-node fold, intra-host handling, stats."""

from __future__ import annotations

from collections import Counter, defaultdict
from urllib.parse import urlsplit

import pytest

from connected_components_3d_spark.operators.hostgraph import (
    host_graph,
    host_link_stats,
    host_of,
)
from pyspark.sql import functions as F

URLS = [
    ("https://WWW.Example.COM/a", "http://example.com/b"),
    ("https://www.example.com:8080/x?q=1#f", "https://Sub.Example.com./y"),
    ("http://user:pw@host.net/p", "https://www.example.com/z"),
    ("ftp://files.example.org/f", "https://host.net/"),
    ("www.example.com/relativeish", "https://host.net/q"),
    ("https://host.net/1", "https://host.net/2"),  # intra
    ("", "https://host.net/x"),  # unparseable src
]


def _py_host(u):
    # reference fold: mirror host_of with stdlib parsing
    if "://" not in u:
        u = "http://" + u
    h = (urlsplit(u).hostname or "").rstrip(".")
    return h


def test_host_of_cases(spark):
    df = spark.createDataFrame([(a,) for a, _ in URLS], "u string")
    got = [r[0] for r in df.select(host_of("u")).collect()]
    want = [_py_host(a) for a, _ in URLS]
    assert got == want
    assert got[0] == "www.example.com"
    assert got[1] == "www.example.com"  # port stripped
    assert got[2] == "host.net"  # userinfo stripped
    assert got[3] == "files.example.org"  # non-http scheme still parses
    assert got[4] == "www.example.com"  # schemeless
    assert got[6] == ""  # empty input -> empty host


def test_host_graph_weights_match_single_node(spark):
    df = spark.createDataFrame(URLS, "src_url string, dst_url string")
    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_graph(df).collect()
    }
    want = Counter()
    for a, b in URLS:
        ha, hb = _py_host(a), _py_host(b)
        if ha and hb and ha != hb:
            want[(ha, hb)] += 1
    assert got == dict(want)


def test_host_graph_keep_intra(spark):
    df = spark.createDataFrame(URLS, "src_url string, dst_url string")
    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_graph(df, drop_intra=False).collect()
    }
    assert got[("host.net", "host.net")] == 1


def test_host_link_stats(spark):
    df = spark.createDataFrame(URLS, "src_url string, dst_url string")
    rows = {r["host"]: r for r in host_link_stats(df).collect()}
    exp_links = defaultdict(int)
    exp_hosts = defaultdict(set)
    exp_intra = defaultdict(int)
    for a, b in URLS:
        ha, hb = _py_host(a), _py_host(b)
        if not (ha and hb):
            continue
        exp_links[ha] += 1
        if hb != ha:
            exp_hosts[ha].add(hb)
        else:
            exp_intra[ha] += 1
    assert set(rows) == set(exp_links)
    for h in exp_links:
        assert rows[h]["out_links"] == exp_links[h], h
        assert rows[h]["out_hosts"] == len(exp_hosts[h]), h
        assert rows[h]["intra_frac"] == pytest.approx(
            exp_intra[h] / exp_links[h], abs=1e-8
        ), h


def test_host_graph_plan_is_all_codegen(spark):
    # the projection must stay JVM-side: no BatchEvalPython / ArrowEval
    # nodes anywhere in the physical plan
    df = spark.createDataFrame(URLS, "src_url string, dst_url string")
    plan = host_graph(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_domain_graph_etld1_rollup(spark):
    """Subdomain hosts of one registrable domain collapse to a single
    vertex; multi-part suffixes use three labels; intra-domain edges are
    dropped by default and kept on request."""
    from connected_components_3d_spark.operators.hostgraph import (
        domain_graph,
    )

    pairs = [
        # two subdomains of example.co.uk → one domain; target a.com
        ("https://blog.example.co.uk/p1", "https://a.com/x"),
        ("https://shop.example.co.uk/p2", "https://a.com/y"),
        # www and bare host are the same domain
        ("http://www.a.com/z", "https://cdn.b.org/q"),
        # intra-domain (dropped by default)
        ("https://a.com/1", "https://www.a.com/2"),
        ("not a url at all", ""),  # unparseable → filtered via ''
    ]
    df = spark.createDataFrame(pairs, "src_url string, dst_url string")
    got = {
        (r["src_domain"], r["dst_domain"]): r["weight"]
        for r in domain_graph(df).collect()
    }
    assert got == {
        ("example.co.uk", "a.com"): 2,
        ("a.com", "b.org"): 1,
    }
    kept = {
        (r["src_domain"], r["dst_domain"]): r["weight"]
        for r in domain_graph(df, drop_intra=False).collect()
    }
    assert kept[("a.com", "a.com")] == 1
