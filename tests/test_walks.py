"""Random-walk corpus parity: Spark vs the single-node replay of the
argmin-of-mix determinism contract (operators/walks.py docstring), sink
stopping, start-set restriction, duplicate-edge hygiene, id-range guard."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.walks import (
    random_walks,
    random_walks_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def assert_walks_match(spark, pairs, walk_length=6, seed=42, starts=None):
    expected = sorted(
        random_walks_single_node(
            pairs, walk_length=walk_length, seed=seed, starts=starts
        )
    )
    sdf = None
    if starts is not None:
        sdf = spark.createDataFrame([(int(s),) for s in starts], "vertex long")
    res = random_walks(
        spark, edges_df(spark, pairs), walk_length=walk_length, seed=seed,
        starts=sdf,
    )
    got = sorted(
        (r["walk_id"], r["step"], r["vertex"]) for r in res.corpus.collect()
    )
    assert got == expected
    return res


def test_random_digraph_parity(spark):
    g = nx.gnp_random_graph(150, 0.03, seed=5, directed=True)
    assert_walks_match(spark, list(g.edges()), walk_length=7)


def test_symmetric_graph_full_length(spark):
    """On a symmetrized connected graph no walk hits a sink: every walk has
    exactly walk_length+1 rows."""
    g = nx.cycle_graph(40)
    pairs = [(a, b) for a, b in g.edges()] + [(b, a) for a, b in g.edges()]
    res = assert_walks_match(spark, pairs, walk_length=5)
    counts = res.corpus.groupBy("walk_id").count().collect()
    assert all(r["count"] == 6 for r in counts)


def test_sink_stops_walk(spark):
    # 0→1→2, 2 is a sink; walk from 0 has rows for steps 0,1,2 only
    res = assert_walks_match(spark, [(0, 1), (1, 2)], walk_length=9)
    rows = sorted(
        (r["step"], r["vertex"])
        for r in res.corpus.where("walk_id = 0").collect()
    )
    assert rows == [(0, 0), (1, 1), (2, 2)]


def test_seed_changes_walks(spark):
    g = nx.gnp_random_graph(60, 0.15, seed=9, directed=True)
    pairs = list(g.edges())
    a = random_walks_single_node(pairs, walk_length=6, seed=1)
    b = random_walks_single_node(pairs, walk_length=6, seed=2)
    assert a != b  # different seeds pick different hops somewhere
    assert_walks_match(spark, pairs, walk_length=6, seed=1)
    assert_walks_match(spark, pairs, walk_length=6, seed=2)


def test_start_set_and_duplicate_edges(spark):
    g = nx.gnp_random_graph(80, 0.08, seed=13, directed=True)
    pairs = list(g.edges())
    pairs += pairs[:20]  # duplicates must collapse (DISTINCT contract)
    assert_walks_match(spark, pairs, walk_length=4, starts=[0, 5, 11])


def test_negative_id_rejected(spark):
    with pytest.raises(Exception, match="\\[0, 2\\^31\\)"):
        random_walks(spark, edges_df(spark, [(-1, 2)]), walk_length=3)
