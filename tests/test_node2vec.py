"""node2vec second-order walk parity: Spark vs the single-node replay of
the categorical-sampling determinism contract (operators/walks.py
``node2vec_walks`` docstring), (p, q) bias direction on a cycle (large p
suppresses backtracking, small p forces it), sink stopping, start sets,
duplicate-edge hygiene, validation."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.walks import (
    node2vec_walks,
    node2vec_walks_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def assert_n2v_match(
    spark, pairs, walk_length=6, p=(1, 1), q=(1, 1), seed=42, starts=None
):
    expected = sorted(
        node2vec_walks_single_node(
            pairs, walk_length=walk_length, p=p, q=q, seed=seed, starts=starts
        )
    )
    sdf = None
    if starts is not None:
        sdf = spark.createDataFrame([(int(s),) for s in starts], "vertex long")
    res = node2vec_walks(
        spark,
        edges_df(spark, pairs),
        walk_length=walk_length,
        p=p,
        q=q,
        seed=seed,
        starts=sdf,
    )
    got = sorted(
        (r["walk_id"], r["step"], r["vertex"]) for r in res.corpus.collect()
    )
    assert got == expected
    return res


def test_random_digraph_parity_pq_grid(spark):
    g = nx.gnp_random_graph(120, 0.04, seed=7, directed=True)
    pairs = list(g.edges())
    for p, q in [((1, 1), (1, 1)), ((4, 1), (1, 4)), ((1, 4), (4, 1))]:
        assert_n2v_match(spark, pairs, walk_length=5, p=p, q=q)


def _backtrack_fraction(corpus_rows):
    """Fraction of steps t ≥ 2 where the walk returned to its t−2 vertex."""
    walks: dict[int, dict[int, int]] = {}
    for wid, step, v in corpus_rows:
        walks.setdefault(wid, {})[step] = v
    back = total = 0
    for seq in walks.values():
        for t in range(2, max(seq) + 1):
            if t in seq and (t - 2) in seq:
                total += 1
                back += seq[t] == seq[t - 2]
    assert total > 0
    return back / total


def test_large_p_suppresses_backtracking(spark):
    g = nx.cycle_graph(30)
    pairs = [(a, b) for a, b in g.edges()] + [(b, a) for a, b in g.edges()]
    res = assert_n2v_match(spark, pairs, walk_length=8, p=(10_000, 1))
    rows = [
        (r["walk_id"], r["step"], r["vertex"]) for r in res.corpus.collect()
    ]
    assert _backtrack_fraction(rows) < 0.05


def test_small_p_forces_backtracking(spark):
    g = nx.cycle_graph(30)
    pairs = [(a, b) for a, b in g.edges()] + [(b, a) for a, b in g.edges()]
    res = assert_n2v_match(spark, pairs, walk_length=8, p=(1, 10_000))
    rows = [
        (r["walk_id"], r["step"], r["vertex"]) for r in res.corpus.collect()
    ]
    assert _backtrack_fraction(rows) > 0.95


def test_sink_stops_walk(spark):
    res = assert_n2v_match(spark, [(0, 1), (1, 2)], walk_length=9, p=(2, 1))
    rows = sorted(
        (r["step"], r["vertex"])
        for r in res.corpus.where("walk_id = 0").collect()
    )
    assert rows == [(0, 0), (1, 1), (2, 2)]


def test_start_set_and_duplicate_edges(spark):
    g = nx.gnp_random_graph(70, 0.08, seed=3, directed=True)
    pairs = list(g.edges())
    pairs += pairs[:15]  # duplicates must collapse (DISTINCT contract)
    assert_n2v_match(
        spark, pairs, walk_length=4, p=(1, 3), q=(3, 1), starts=[0, 4, 9]
    )


def test_seed_changes_walks():
    g = nx.gnp_random_graph(60, 0.15, seed=11, directed=True)
    pairs = list(g.edges())
    a = node2vec_walks_single_node(pairs, walk_length=6, seed=1, p=(2, 1))
    b = node2vec_walks_single_node(pairs, walk_length=6, seed=2, p=(2, 1))
    assert a != b


def test_validation(spark):
    with pytest.raises(Exception, match="\\[0, 2\\^31\\)"):
        node2vec_walks(spark, edges_df(spark, [(-1, 2)]), walk_length=3)
    with pytest.raises(AssertionError, match="\\[1, 10\\^4\\]"):
        node2vec_walks(
            spark, edges_df(spark, [(0, 1)]), walk_length=3, p=(0, 1)
        )
