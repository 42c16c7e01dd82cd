"""CC parity: graph fixtures (FIXTURES.md §4) + networkx oracle, both
methods, partition-count invariance (the distributed-correctness property)."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from connected_components_3d_spark.operators.cc import (
    connected_components,
    num_components,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def classes_of(components_rows) -> set[frozenset]:
    by_label: dict[int, set[int]] = {}
    for r in components_rows:
        by_label.setdefault(r["component"], set()).add(r["vertex"])
    return {frozenset(s) for s in by_label.values()}


def nx_classes(pairs) -> set[frozenset]:
    g = nx.Graph()
    g.add_edges_from(pairs)
    return {frozenset(c) for c in nx.connected_components(g)}


def assert_cc_matches(spark, pairs, method, **kw):
    res = connected_components(spark, edges_df(spark, pairs), method=method, **kw)
    got = classes_of(res.components.collect())
    assert got == nx_classes(pairs)
    # canonical labels: component id == min vertex id of its class
    rows = res.components.collect()
    by_label: dict[int, set[int]] = {}
    for r in rows:
        by_label.setdefault(r["component"], set()).add(r["vertex"])
    for label, members in by_label.items():
        assert label == min(members)
    return res


def two_cliques(bridge=True):
    pairs = [(i, j) for i in range(10) for j in range(i + 1, 10)]
    pairs += [(100 + i, 100 + j) for i in range(10) for j in range(i + 1, 10)]
    if bridge:
        pairs.append((5, 105))
    return pairs


@pytest.mark.parametrize("method", ["hashmin", "blockuf"])
def test_two_cliques(spark, method):
    res = assert_cc_matches(spark, two_cliques(True), method)
    assert num_components(res.components) == 1
    assert_cc_matches(spark, two_cliques(False), method)


@pytest.mark.parametrize("method", ["hashmin", "blockuf"])
def test_chain_high_diameter(spark, method):
    pairs = [(i, i + 1) for i in range(999)]  # path of 1000 vertices
    res = assert_cc_matches(spark, pairs, method)
    assert num_components(res.components) == 1
    # pointer jumping must beat O(diameter) supersteps by a wide margin
    assert res.num_supersteps < 25


@pytest.mark.parametrize("method", ["hashmin", "blockuf"])
def test_random_er_vs_networkx(spark, method):
    g = nx.gnp_random_graph(2000, 0.002, seed=42)
    pairs = list(g.edges())
    assert_cc_matches(spark, pairs, method)


def test_partition_count_invariance(spark):
    pairs = two_cliques(True) + [(i, i + 1) for i in range(200, 400)]
    a = connected_components(
        spark, edges_df(spark, pairs), method="blockuf", num_blocks=2
    )
    b = connected_components(
        spark, edges_df(spark, pairs), method="blockuf", num_blocks=32
    )
    assert sorted(map(tuple, a.components.collect())) == sorted(
        map(tuple, b.components.collect())
    )


def test_methods_agree(spark):
    g = nx.gnp_random_graph(500, 0.004, seed=7)
    e = edges_df(spark, list(g.edges()))
    a = connected_components(spark, e, method="hashmin")
    b = connected_components(spark, e, method="blockuf")
    assert sorted(map(tuple, a.components.collect())) == sorted(
        map(tuple, b.components.collect())
    )


def test_directed_input_treated_undirected(spark):
    # CC symmetrizes internally: direction must not matter
    res = connected_components(spark, edges_df(spark, [(2, 1), (3, 2)]), method="hashmin")
    assert classes_of(res.components.collect()) == {frozenset({1, 2, 3})}


def test_empty_edges(spark):
    e = edges_df(spark, [])
    res = connected_components(spark, e, method="hashmin")
    assert res.components.count() == 0


def test_metrics_recorded(spark):
    res = connected_components(
        spark, edges_df(spark, two_cliques(True)), method="blockuf"
    )
    assert res.metrics
    m = res.metrics[-1]
    assert m["converged"] is True
    assert m["labels_changed"] == 0
    assert m["edges_per_sec"] is None or m["edges_per_sec"] >= 0


def test_chain_converges_in_logarithmic_supersteps(spark):
    """Pointer jumping must stay load-bearing on high-diameter graphs: a
    3000-vertex path converges in O(log d) supersteps. Guards the skip-jump
    optimization's stall detector — a naive 'skip when frontier is small'
    rule degrades this to O(d) (observed as ~2.5k-label crawls on lattice
    root graphs)."""
    pairs = [(i, i + 1) for i in range(3000)]
    res = connected_components(spark, edges_df(spark, pairs), method="hashmin")
    assert res.num_supersteps <= 40, res.num_supersteps
    assert res.components.select("component").distinct().count() == 1


def test_blockuf_range_blocks_match_hashmin(spark):
    """block_key='range' (locality-preserving contraction) must yield the
    same components as hash blocks and as plain hashmin — including with
    negative vertex ids (the range partitioner offsets by the min id)."""
    pairs = [(i, i + 1) for i in range(-50, 400)] + [
        (1000 + i, 1000 + (i * 7) % 60) for i in range(60)
    ]
    e = edges_df(spark, pairs)
    want = sorted(map(tuple, connected_components(
        spark, e, method="hashmin").components.collect()))
    for nb in (3, 8):
        got = sorted(map(tuple, connected_components(
            spark, e, method="blockuf", num_blocks=nb, block_key="range"
        ).components.collect()))
        assert got == want, nb


def test_broadcast_jump_map_is_exact(spark):
    """The convergence-skew guard (broadcast contracted jump map) must be
    bit-identical to the plain V-by-V SMJ jump — same graph, gate forced on
    vs forced off (jump_broadcast_max_labels=0 never broadcasts)."""
    g = nx.gnp_random_graph(1500, 0.003, seed=11)
    pairs = list(g.edges()) + [(i, i + 1) for i in range(3000, 3400)]
    e = edges_df(spark, pairs)
    on = connected_components(
        spark, e, method="hashmin", jump_broadcast_max_labels=2_000_000
    )
    off = connected_components(
        spark, e, method="hashmin", jump_broadcast_max_labels=0
    )
    assert sorted(map(tuple, on.components.collect())) == sorted(
        map(tuple, off.components.collect())
    )


@pytest.mark.parametrize("method", ["hashmin", "blockuf"])
def test_half_scan_path_is_exact(spark, method):
    """The half-scan neighbor-min (E-row single-orientation cache, frontier
    broadcast-probed on both endpoints) must be bit-identical to the
    symmetric-table SMJ path — gate forced on (every post-identity
    superstep qualifies) vs forced off, on a graph whose fixpoint takes
    several supersteps; plus duplicate/self-loop/reversed-edge hygiene."""
    g = nx.gnp_random_graph(1200, 0.004, seed=23)
    pairs = list(g.edges()) + [(i, i + 1) for i in range(5000, 5300)]
    # stress the canonical-subset derivation: both orientations, dups, loops
    pairs += [(b, a) for a, b in pairs[:50]] + [(7, 7), (5000, 5000)]
    e = edges_df(spark, pairs)
    on = connected_components(
        spark, e, method=method, half_scan_max_frontier=10_000_000
    )
    off = connected_components(
        spark, e, method=method, half_scan_max_frontier=0
    )
    assert sorted(map(tuple, on.components.collect())) == sorted(
        map(tuple, off.components.collect())
    )
    got = classes_of(on.components.collect())
    assert got == nx_classes(pairs)
