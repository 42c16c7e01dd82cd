"""ACL sweep cut (operators/sweepcut.py): exact single-node replay of the
prefix-conductance table, planted-community recovery, top_n capping,
degenerates."""

from __future__ import annotations

from collections import defaultdict

from connected_components_3d_spark.operators.sweepcut import sweep_cut


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def scores_df(spark, sc):
    return spark.createDataFrame(
        [(int(v), float(s)) for v, s in sc.items()], "vertex long, score double"
    )


def sweep_single(pairs, sc, top_n=None):
    """Exact sequential replay of the operator's rule."""
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    deg: dict = defaultdict(int)
    for u, v in es:
        deg[u] += 1
        deg[v] += 1
    two_m = sum(deg.values())
    sup = [
        (v, s / deg[v]) for v, s in sc.items() if s > 0 and v in deg
    ]
    sup.sort(key=lambda t: (-t[1], t[0]))
    if top_n is not None:
        sup = sup[:top_n]
    rank = {v: i + 1 for i, (v, _) in enumerate(sup)}
    rows = []
    vol = 0
    int2 = 0
    per_r: dict = defaultdict(int)
    for u, v in es:
        if u in rank and v in rank:
            per_r[max(rank[u], rank[v])] += 2
    for i, (v, ratio) in enumerate(sup, start=1):
        vol += deg[v]
        int2 += per_r.get(i, 0)
        cut = vol - int2
        den = min(vol, two_m - vol)
        phi = cut / den if den > 0 else None
        rows.append((i, v, ratio, vol, cut, phi))
    return rows


def collect_prefixes(res):
    return [
        (
            r["rank"],
            r["vertex"],
            r["ratio"],
            r["vol"],
            r["cut"],
            r["conductance"],
        )
        for r in res.prefixes.orderBy("rank").collect()
    ]


def two_cliques(k=5):
    a = [(i, j) for i in range(k) for j in range(i + 1, k)]
    b = [(10 + i, 10 + j) for i in range(k) for j in range(i + 1, k)]
    return a + b + [(0, 10)]


def test_planted_clique_recovered(spark):
    pairs = two_cliques()
    # diffusion-like scores: high mass on clique A, trickle on B
    sc = {v: 1.0 - 0.01 * v for v in range(5)}
    sc.update({10 + v: 0.05 - 0.001 * v for v in range(5)})
    res = sweep_cut(spark, edges_df(spark, pairs), scores_df(spark, sc))
    assert collect_prefixes(res) == sweep_single(pairs, sc)
    got = {r["vertex"] for r in res.community.collect()}
    assert got == set(range(5))
    assert res.best_k == 5
    # cut = the single bridge; vol(A) = 4*4 + 5
    assert abs(res.best_conductance - 1 / 21) < 1e-12


def test_random_replay_parity(spark):
    import random

    rng = random.Random(7)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(80)]
    sc = {v: round(rng.random(), 8) for v in range(30)}
    res = sweep_cut(spark, edges_df(spark, pairs), scores_df(spark, sc))
    assert collect_prefixes(res) == sweep_single(pairs, sc)
    ref = sweep_single(pairs, sc)
    phis = [(p, k) for k, _, _, _, _, p in ref if p is not None]
    assert res.best_conductance == min(phis)[0]


def test_top_n_cap(spark):
    pairs = two_cliques()
    sc = {v: 1.0 / (v + 1) for v in range(5)}
    sc.update({10 + v: 0.01 / (v + 1) for v in range(5)})
    res = sweep_cut(
        spark, edges_df(spark, pairs), scores_df(spark, sc), top_n=3
    )
    assert collect_prefixes(res) == sweep_single(pairs, sc, top_n=3)
    assert res.prefixes.count() == 3


def test_degenerates(spark):
    res = sweep_cut(
        spark, edges_df(spark, []).limit(0), scores_df(spark, {1: 1.0})
    )
    assert res.best_k == 0 and res.best_conductance is None
    assert res.prefixes.count() == 0
    # no positive scores → empty sweep
    res2 = sweep_cut(
        spark, edges_df(spark, [(0, 1)]), scores_df(spark, {0: 0.0})
    )
    assert res2.best_k == 0 and res2.prefixes.count() == 0
    # zero-score and isolated vertices excluded, sweep still works
    res3 = sweep_cut(
        spark,
        edges_df(spark, [(0, 1), (1, 2)]),
        scores_df(spark, {0: 1.0, 1: 0.5, 99: 5.0}),
    )
    assert {r["vertex"] for r in res3.prefixes.collect()} == {0, 1}
