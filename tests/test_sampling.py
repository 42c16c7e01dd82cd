"""Neighbor-sampling parity: Spark vs the single-node replay of the
pick-index determinism contract (operators/sampling.py docstring), fanout
budget, frontier chaining, sink handling, start-set restriction, id guard."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.sampling import (
    neighbor_sample,
    neighbor_sample_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def assert_samples_match(spark, pairs, fanouts, seed=42, starts=None):
    expected = neighbor_sample_single_node(
        pairs, fanouts, seed=seed, starts=starts
    )
    sdf = None
    if starts is not None:
        sdf = spark.createDataFrame([(int(s),) for s in starts], "vertex long")
    res = neighbor_sample(
        spark, edges_df(spark, pairs), fanouts, seed=seed, starts=sdf
    )
    got = sorted(
        (r["hop"], r["src"], r["dst"]) for r in res.blocks.collect()
    )
    assert got == expected
    return res, got


def test_random_digraph_parity(spark):
    g = nx.gnp_random_graph(120, 0.05, seed=7, directed=True)
    assert_samples_match(spark, list(g.edges()), [3, 2])


def test_fanout_budget_and_subset(spark):
    """Every sampled edge is a real edge; per (hop, src) at most fanout
    distinct dst; a vertex with deg <= fanout still emits <= fanout rows."""
    g = nx.gnp_random_graph(80, 0.1, seed=3, directed=True)
    pairs = list(g.edges())
    res, got = assert_samples_match(spark, pairs, [4])
    eset = set(pairs)
    from collections import Counter

    per_src = Counter((h, s) for h, s, d in got)
    assert all((s, d) in eset for _, s, d in got)
    assert all(c <= 4 for c in per_src.values())


def test_frontier_chains_across_hops(spark):
    """Hop-2 sources must be hop-1 destinations (the GraphSAGE frontier)."""
    g = nx.gnp_random_graph(100, 0.06, seed=11, directed=True)
    res, got = assert_samples_match(spark, list(g.edges()), [2, 3])
    h1_dst = {d for h, s, d in got if h == 1}
    h2_src = {s for h, s, d in got if h == 2}
    assert h2_src <= h1_dst


def test_sink_frontier_stops(spark):
    # 0->1, 1->2; 2 is a sink: hop 3 over starts=[0] has nothing to sample
    res, got = assert_samples_match(
        spark, [(0, 1), (1, 2)], [2, 2, 2], starts=[0]
    )
    assert got == [(1, 0, 1), (2, 1, 2)]


def test_seed_changes_picks(spark):
    g = nx.gnp_random_graph(60, 0.15, seed=9, directed=True)
    pairs = list(g.edges())
    a = neighbor_sample_single_node(pairs, [1, 1], seed=1)
    b = neighbor_sample_single_node(pairs, [1, 1], seed=2)
    assert a != b  # different seeds pick different neighbors somewhere
    assert_samples_match(spark, pairs, [1, 1], seed=1)
    assert_samples_match(spark, pairs, [1, 1], seed=2)


def test_start_set_and_duplicate_edges(spark):
    g = nx.gnp_random_graph(70, 0.08, seed=13, directed=True)
    pairs = list(g.edges())
    pairs += pairs[:15]  # duplicates must collapse (DISTINCT contract)
    assert_samples_match(spark, pairs, [3, 2], starts=[0, 5, 11])


def test_negative_id_rejected(spark):
    with pytest.raises(Exception, match="\\[0, 2\\^31\\)"):
        neighbor_sample(spark, edges_df(spark, [(-1, 2)]), [2])
