"""Condensation parity vs networkx ``condensation`` (SCC quotient DAG is
acyclic, quotient edges + multiplicities match a brute contraction),
self-loop-keeping mode, and missing-assignment drop semantics."""

from __future__ import annotations

from collections import Counter

import networkx as nx

from connected_components_3d_spark.operators.condense import condense
from connected_components_3d_spark.operators.scc import (
    strongly_connected_components,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def assign_df(spark, mapping):
    return spark.createDataFrame(
        [(int(v), int(c)) for v, c in mapping.items()],
        "vertex long, component long",
    )


def brute_condense(pairs, mapping, drop_self_loops=True):
    out = Counter()
    for a, b in pairs:
        if a not in mapping or b not in mapping:
            continue
        ca, cb = mapping[a], mapping[b]
        if drop_self_loops and ca == cb:
            continue
        out[(ca, cb)] += 1
    return sorted((s, d, n) for (s, d), n in out.items())


def test_scc_condensation_is_acyclic_and_matches_networkx(spark):
    # two rings bridged by a chain, plus tendrils
    pairs = (
        [(i, (i + 1) % 5) for i in range(5)]
        + [(10 + i, 10 + (i + 1) % 4) for i in range(4)]
        + [(0, 10), (13, 20), (20, 21)]
    )
    e = edges_df(spark, pairs)
    comps = strongly_connected_components(spark, e).components
    mapping = {r["vertex"]: r["component"] for r in comps.collect()}
    got = sorted(
        (r["src_comp"], r["dst_comp"], r["n_edges"])
        for r in condense(e, comps).collect()
    )
    assert got == brute_condense(pairs, mapping)
    # the quotient of an SCC assignment is a DAG (networkx invariant)
    q = nx.DiGraph((s, d) for s, d, _ in got)
    assert nx.is_directed_acyclic_graph(q)
    # same number of quotient edges as networkx's condensation multigraph
    # collapsed to simple edges
    nxc = nx.condensation(nx.DiGraph(pairs))
    assert len(got) == nxc.number_of_edges()


def test_multiplicity_and_self_loop_mode(spark):
    pairs = [(0, 1), (0, 1), (2, 3), (0, 2)]  # dup edge kept as weight 2
    e = edges_df(spark, pairs)
    mapping = {0: 0, 1: 0, 2: 2, 3: 2}
    a = assign_df(spark, mapping)
    dropped = sorted(
        (r["src_comp"], r["dst_comp"], r["n_edges"])
        for r in condense(e, a).collect()
    )
    assert dropped == [(0, 2, 1)]
    kept = sorted(
        (r["src_comp"], r["dst_comp"], r["n_edges"])
        for r in condense(e, a, drop_self_loops=False).collect()
    )
    assert kept == brute_condense(pairs, mapping, drop_self_loops=False)
    assert (0, 0, 2) in kept  # duplicate edge multiplicity preserved


def test_missing_assignment_drops_edge(spark):
    e = edges_df(spark, [(0, 1), (1, 99)])  # 99 unassigned
    a = assign_df(spark, {0: 0, 1: 1})
    got = sorted(
        (r["src_comp"], r["dst_comp"], r["n_edges"])
        for r in condense(e, a).collect()
    )
    assert got == [(0, 1, 1)]
