"""Property tests (hypothesis) for the block-local union-find kernel —
the single-node heart of the blockuf contraction. Mirrors the reference's
randomized-grid-vs-oracle strategy (SURVEY.md §5.1) at the kernel level:
any edge list, any order, any duplicates → equivalence classes must match
networkx exactly and labels must be the component minima."""

from __future__ import annotations

import networkx as nx
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from connected_components_3d_spark.operators.cc import _local_cc_numpy

edge_lists = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)),
    min_size=1,
    max_size=200,
)


def _classes_from_labels(ids, roots):
    by_root: dict[int, set[int]] = {}
    for v, r in zip(ids.tolist(), roots.tolist()):
        by_root.setdefault(r, set()).add(v)
    return frozenset(frozenset(s) for s in by_root.values())


@settings(max_examples=200, deadline=None)
@given(edge_lists)
def test_local_uf_matches_networkx(edges):
    src = np.array([u for u, _ in edges], dtype=np.int64)
    dst = np.array([v for _, v in edges], dtype=np.int64)
    ids, roots = _local_cc_numpy(src, dst)

    g = nx.Graph()
    g.add_edges_from(edges)
    want = frozenset(frozenset(c) for c in nx.connected_components(g))
    assert _classes_from_labels(ids, roots) == want


@settings(max_examples=100, deadline=None)
@given(edge_lists)
def test_local_uf_labels_are_component_minima(edges):
    src = np.array([u for u, _ in edges], dtype=np.int64)
    dst = np.array([v for _, v in edges], dtype=np.int64)
    ids, roots = _local_cc_numpy(src, dst)
    for cls in _classes_from_labels(ids, roots):
        root_of = {
            v: r for v, r in zip(ids.tolist(), roots.tolist()) if v in cls
        }
        assert set(root_of.values()) == {min(cls)}


@settings(max_examples=50, deadline=None)
@given(edge_lists, st.randoms())
def test_local_uf_order_invariant(edges, rnd):
    """Permuting the edge order must not change the labeling at all."""
    src = np.array([u for u, _ in edges], dtype=np.int64)
    dst = np.array([v for _, v in edges], dtype=np.int64)
    ids1, roots1 = _local_cc_numpy(src, dst)
    perm = list(range(len(edges)))
    rnd.shuffle(perm)
    ids2, roots2 = _local_cc_numpy(src[perm], dst[perm])
    assert np.array_equal(ids1, ids2)
    assert np.array_equal(roots1, roots2)
