"""Multi-source BFS parity vs networkx ``multi_source_shortest_path_length``
plus a brute-force min-root-over-shortest-paths check, all three
directions, unreachable omission, and degenerate inputs."""

from __future__ import annotations

import networkx as nx

from connected_components_3d_spark.operators.bfs import bfs_distances


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def seeds_df(spark, seeds):
    return spark.createDataFrame([(int(s),) for s in seeds], "vertex long")


def brute(pairs, seeds, direction):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        if direction in ("out", "both"):
            adj.setdefault(a, set()).add(b)
        if direction in ("in", "both"):
            adj.setdefault(b, set()).add(a)
    # level-synchronous BFS carrying (dist, min root)
    state = {s: (0, s) for s in seeds}
    frontier = dict(state)
    while frontier:
        nxt = {}
        for v, (d, r) in frontier.items():
            for w in adj.get(v, ()):
                if w in state:
                    continue
                if w not in nxt or r < nxt[w][1]:
                    nxt[w] = (d + 1, r)
        state.update(nxt)
        frontier = nxt
    return state


def assert_bfs_matches(spark, pairs, seeds, direction):
    res = bfs_distances(
        spark, edges_df(spark, pairs), seeds_df(spark, seeds),
        direction=direction,
    )
    got = {
        r["vertex"]: (r["dist"], r["root"]) for r in res.distances.collect()
    }
    assert got == brute(pairs, seeds, direction)
    assert res.converged
    return res


def test_directed_vs_networkx(spark):
    g = nx.gnp_random_graph(80, 0.05, seed=7, directed=True)
    pairs = list(g.edges())
    seeds = [0, 3, 11]
    res = assert_bfs_matches(spark, pairs, seeds, "out")
    nxd = nx.multi_source_dijkstra_path_length(g, seeds)
    got = {r["vertex"]: r["dist"] for r in res.distances.collect()}
    assert got == {v: int(d) for v, d in nxd.items()}


def test_in_and_both_directions(spark):
    pairs = [(1, 2), (2, 3), (4, 3), (5, 6)]
    # out: 1→2→3
    out = assert_bfs_matches(spark, pairs, [1], "out")
    assert {r["vertex"]: r["dist"] for r in out.distances.collect()} == {
        1: 0, 2: 1, 3: 2,
    }
    # in: from 3 backwards reaches 2,4 then 1
    assert_bfs_matches(spark, pairs, [3], "in")
    # both: 5 reaches 6 and vice versa; component of 1 unreached
    both = assert_bfs_matches(spark, pairs, [5], "both")
    assert {r["vertex"] for r in both.distances.collect()} == {5, 6}


def test_multi_seed_root_tiebreak(spark):
    # 0 and 10 both reach 5 in 2 hops → root must be min(0, 10) = 0
    pairs = [(0, 1), (1, 5), (10, 11), (11, 5)]
    res = assert_bfs_matches(spark, pairs, [0, 10], "out")
    got = {r["vertex"]: (r["dist"], r["root"]) for r in res.distances.collect()}
    assert got[5] == (2, 0)


def test_seed_is_its_own_root_at_zero(spark):
    pairs = [(7, 8)]
    res = assert_bfs_matches(spark, pairs, [7, 8], "out")
    got = {r["vertex"]: (r["dist"], r["root"]) for r in res.distances.collect()}
    assert got == {7: (0, 7), 8: (0, 8)}


def test_empty_edges_and_level_cap(spark):
    res = bfs_distances(
        spark, edges_df(spark, []), seeds_df(spark, [1]), direction="out"
    )
    assert res.converged and res.num_levels == 0
    assert {r["vertex"] for r in res.distances.collect()} == {1}
    # a 6-chain capped at 2 levels keeps the exact settled prefix
    chain = [(i, i + 1) for i in range(6)]
    capped = bfs_distances(
        spark, edges_df(spark, chain), seeds_df(spark, [0]),
        direction="out", max_levels=2,
    )
    assert not capped.converged
    got = {r["vertex"]: r["dist"] for r in capped.distances.collect()}
    assert got == {0: 0, 1: 1, 2: 2}
