"""Parallel Louvain parity (operators/louvain.py): exact single-node replay
of the deterministic sweep rule (integer 2m-scaled gains, min-community
tie-breaks, vertex-parity alternation), community recovery on planted
structures, weighted semantics, modularity reporting, degenerates."""

from __future__ import annotations

from collections import defaultdict

import pytest

from connected_components_3d_spark.operators.louvain import louvain


def edges_df(spark, pairs, weights=None, parts=None):
    if weights:
        df = spark.createDataFrame(
            [(int(a), int(b), int(w)) for (a, b), w in zip(pairs, weights)],
            "src long, dst long, weight long",
        )
    else:
        df = spark.createDataFrame(
            [(int(a), int(b)) for a, b in pairs], "src long, dst long"
        )
    if parts:
        df = df.repartition(parts)
    return df


def louvain_single(pairs, weights=None, sweeps_per_level=4, max_levels=3):
    """Exact sequential replay of the operator's deterministic rule."""
    ew: dict = defaultdict(int)
    for idx, (a, b) in enumerate(pairs):
        w = weights[idx] if weights else 1
        u, v = min(a, b), max(a, b)
        ew[(u, v)] += w
    if not ew:
        return {}
    two_m = 2 * sum(ew.values())
    verts0 = sorted({x for e in ew for x in e})
    mapping = {v: v for v in verts0}
    edges = dict(ew)
    for level in range(max_levels):
        adj: dict = defaultdict(lambda: defaultdict(int))
        selfw: dict = defaultdict(int)
        for (u, v), w in edges.items():
            if u == v:
                selfw[u] += w
            else:
                adj[u][v] += w
                adj[v][u] += w
        nodes = sorted(set(adj) | set(selfw))
        k = {n: sum(adj[n].values()) + 2 * selfw.get(n, 0) for n in nodes}
        comm = {n: n for n in nodes}
        level_moves = 0
        for s in range(sweeps_per_level):
            tot: dict = defaultdict(int)
            for n in nodes:
                tot[comm[n]] += k[n]
            kic = {
                n: {c: 0 for c in set(comm[j] for j in adj[n])} for n in nodes
            }
            for n in nodes:
                for j, w in adj[n].items():
                    kic[n][comm[j]] += w
            newcomm = {}
            moved = 0
            for n in nodes:
                own = comm[n]

                def gain(c):
                    t = tot[c] - (k[n] if c == own else 0)
                    return two_m * kic[n].get(c, 0) - k[n] * t

                sg = gain(own)
                best, bg = None, None
                for c in sorted(set(kic[n]) - {own}):
                    g = gain(c)
                    if bg is None or g > bg:
                        best, bg = c, g
                if n % 2 == s % 2 and bg is not None and bg > sg:
                    newcomm[n] = best
                    moved += 1
                else:
                    newcomm[n] = own
            comm = newcomm
            level_moves += moved
            if moved == 0:
                break
        if level_moves == 0:
            break
        mapping = {v: comm[node] for v, node in mapping.items()}
        if level == max_levels - 1:
            break
        newe: dict = defaultdict(int)
        for (u, v), w in edges.items():
            cu, cv = comm[u], comm[v]
            newe[(min(cu, cv), max(cu, cv))] += w
        if len(set(comm.values())) >= len(nodes):
            break
        edges = dict(newe)
    byn: dict = defaultdict(list)
    for v, node in mapping.items():
        byn[node].append(v)
    rep = {node: min(vs) for node, vs in byn.items()}
    return {v: rep[node] for v, node in mapping.items()}


def assert_replay(spark, pairs, weights=None, **kw):
    res = louvain(
        spark,
        edges_df(spark, pairs, weights),
        weight_col="weight" if weights else None,
        **kw,
    )
    got = {r["vertex"]: r["community"] for r in res.communities.collect()}
    ref = louvain_single(pairs, weights, **kw)
    assert got == ref
    return res, got


def groups_of(labels):
    g: dict = defaultdict(set)
    for v, c in labels.items():
        g[c].add(v)
    return {frozenset(s) for s in g.values()}


def ring_of_cliques(n_cliques=5, size=5):
    pairs = []
    for g in range(n_cliques):
        base = 10 * g
        for a in range(size):
            for b in range(a + 1, size):
                pairs.append((base + a, base + b))
        pairs.append((10 * g, 10 * ((g + 1) % n_cliques)))
    return pairs


def test_ring_of_cliques_recovered(spark):
    pairs = ring_of_cliques()
    res, got = assert_replay(spark, pairs)
    expect = {frozenset(10 * g + i for i in range(5)) for g in range(5)}
    assert groups_of(got) == expect
    assert res.modularity > 0.5


def test_two_cliques_one_bridge(spark):
    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(10 + a, 10 + b) for a in range(4) for b in range(a + 1, 4)]
    res, got = assert_replay(spark, k4a + k4b + [(0, 10)])
    assert groups_of(got) == {
        frozenset(range(4)),
        frozenset(range(10, 14)),
    }


def test_random_graph_replay_parity(spark):
    import random

    rng = random.Random(911)
    n = 30
    pairs = sorted(
        {
            (a, b)
            for _ in range(90)
            for a, b in [sorted((rng.randrange(n), rng.randrange(n)))]
            if a != b
        }
    )
    assert_replay(spark, pairs)


def test_weighted_replay_and_pull(spark):
    import random

    rng = random.Random(5)
    pairs = [(i, j) for i in range(12) for j in range(i + 1, 12)]
    # heavy weights inside {0..5} and {6..11}, weight-1 across
    weights = [
        9 if (a < 6) == (b < 6) else 1 for a, b in pairs
    ]
    res, got = assert_replay(spark, pairs, weights)
    assert groups_of(got) == {frozenset(range(6)), frozenset(range(6, 12))}
    # random weighted replay
    pairs2 = sorted(
        {
            (a, b)
            for _ in range(60)
            for a, b in [sorted((rng.randrange(20), rng.randrange(20)))]
            if a != b
        }
    )
    w2 = [rng.randrange(1, 7) for _ in pairs2]
    assert_replay(spark, pairs2, w2)


def test_self_loops_and_duplicates(spark):
    pairs = [(0, 1), (1, 0), (1, 1), (1, 2), (2, 0), (5, 6)]
    assert_replay(spark, pairs)


def test_single_level_two_sweeps_matches(spark):
    pairs = ring_of_cliques(4, 4)
    assert_replay(spark, pairs, sweeps_per_level=2, max_levels=1)


def test_louvain_sweeps_gate_surface(spark):
    """louvain_sweeps (the fixed-round gate surface) must agree with the
    full operator at one level when no sweep converges early — same
    decision rule, no early stop, no contraction."""
    from connected_components_3d_spark.operators.louvain import louvain_sweeps

    pairs = ring_of_cliques(4, 5)
    df = edges_df(spark, pairs)
    got = {
        r["vertex"]: r["community"]
        for r in louvain_sweeps(spark, df, sweeps=2).collect()
    }
    ref = louvain_single(pairs, sweeps_per_level=2, max_levels=1)
    assert got == ref
    assert louvain_sweeps(spark, edges_df(spark, []).limit(0)).count() == 0
    with pytest.raises(ValueError):
        louvain_sweeps(spark, df, sweeps=0)


def test_refine_splits_disconnected_community(spark):
    """A hand-planted internally disconnected community must split into
    its connected parts; isolated labeled vertices become singletons."""
    from connected_components_3d_spark.operators.louvain import (
        refine_communities,
    )

    # community 0: {0,1} and {5,6} with NO internal path between the pairs
    # community 100: connected triangle. vertex 99: labeled but edgeless.
    edges = edges_df(
        spark,
        [(0, 1), (5, 6), (1, 100), (100, 101), (101, 102), (102, 100)],
    )
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (5, 0), (6, 0), (100, 100), (101, 100),
         (102, 100), (99, 7)],
        "vertex long, community long",
    )
    got = {
        r["vertex"]: r["community"]
        for r in refine_communities(spark, edges, labels).collect()
    }
    assert got == {0: 0, 1: 0, 5: 5, 6: 5, 100: 100, 101: 100,
                   102: 100, 99: 99}


def test_refined_louvain_communities_connected(spark):
    """After refinement, every community's induced subgraph is connected
    (networkx check) and the partition refines the input partition."""
    import networkx as nx

    from connected_components_3d_spark.operators.louvain import (
        louvain_sweeps,
        refine_communities,
    )

    import random

    rng = random.Random(11)
    pairs = ring_of_cliques(4, 5) + [
        (rng.randrange(40), rng.randrange(40)) for _ in range(25)
    ]
    df = edges_df(spark, pairs)
    raw = louvain_sweeps(spark, df, sweeps=2)
    ref = refine_communities(spark, df, raw)
    raw_l = {r["vertex"]: r["community"] for r in raw.collect()}
    ref_l = {r["vertex"]: r["community"] for r in ref.collect()}
    assert set(raw_l) == set(ref_l)
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in pairs if a != b)
    comm: dict = defaultdict(set)
    for v, c in ref_l.items():
        comm[c].add(v)
    for c, members in comm.items():
        assert c == min(members)
        assert nx.is_connected(g.subgraph(members))
    # refinement: every refined community sits inside one raw community
    for members in comm.values():
        assert len({raw_l[v] for v in members}) == 1


def test_modularity_vs_singletons(spark):
    pairs = ring_of_cliques()
    res, _ = assert_replay(spark, pairs)
    # singleton partition has modularity < 0; recovered partition must beat it
    assert res.modularity > 0.0
    assert res.num_levels >= 1
    assert res.num_sweeps >= 1


def test_empty_and_validation(spark):
    res = louvain(spark, edges_df(spark, []).limit(0))
    assert res.communities.count() == 0
    assert res.num_levels == 0
    with pytest.raises(ValueError):
        louvain(spark, edges_df(spark, [(0, 1)]), sweeps_per_level=0)
    with pytest.raises(ValueError):
        louvain(spark, edges_df(spark, [(0, 1)]), max_levels=0)


def test_partition_invariance(spark):
    pairs = ring_of_cliques(3, 4) + [(0, 100), (100, 101)]
    r1 = louvain(spark, edges_df(spark, pairs, parts=1))
    r7 = louvain(spark, edges_df(spark, pairs, parts=7))
    g1 = {r["vertex"]: r["community"] for r in r1.communities.collect()}
    g7 = {r["vertex"]: r["community"] for r in r7.communities.collect()}
    assert g1 == g7
