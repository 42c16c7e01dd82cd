"""Attack robustness curve (operators/robustness.py): single-node replay
of the whole-degree-class removal contract on random graphs (networkx CC
as the component oracle), planted hub fragmentation, budget-too-small
no-op, singleton survivor accounting, degenerates."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.robustness import (
    attack_robustness,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def expected_curve(pairs, fractions):
    g = nx.Graph()
    for a, b in pairs:
        if a != b:
            g.add_edge(a, b)
    n = g.number_of_nodes()
    hist: dict[int, int] = {}
    for v in g:
        hist[g.degree(v)] = hist.get(g.degree(v), 0) + 1
    out = {}
    for f in fractions:
        budget = int(f * n)
        tail, cutoff = 0, None
        for d in sorted(hist, reverse=True):
            if tail + hist[d] > budget:
                break
            tail += hist[d]
            cutoff = d
        if f == 0.0 or cutoff is None:
            h = g
            cutoff_out, removed = None, 0
        else:
            keep = [v for v in g if g.degree(v) < cutoff]
            h = g.subgraph(keep)
            cutoff_out, removed = cutoff, n - len(keep)
        comps = list(nx.connected_components(h)) if h.number_of_nodes() else []
        out[f] = (
            cutoff_out,
            removed,
            h.number_of_nodes(),
            h.number_of_edges(),
            len(comps),
            max((len(c) for c in comps), default=0),
        )
    return out


def assert_curve_match(spark, pairs, fractions):
    res = attack_robustness(spark, edges_df(spark, pairs), fractions)
    got = {
        r["fraction"]: (
            r["cutoff_degree"],
            r["n_removed"],
            r["n_vertices_left"],
            r["n_edges_left"],
            r["n_components"],
            r["gcc_size"],
        )
        for r in res.curve.collect()
    }
    assert got == expected_curve(pairs, fractions)
    return got


def test_random_graph_parity(spark):
    g = nx.gnp_random_graph(80, 0.06, seed=29)
    assert_curve_match(spark, list(g.edges()), [0.0, 0.1, 0.3])


def test_hub_removal_fragments_star(spark):
    """Star + pendant chain: removing the single hub class disconnects
    everything into singletons + the chain remnant."""
    pairs = [(0, i) for i in range(1, 21)] + [(21, 20), (22, 21)]
    got = assert_curve_match(spark, pairs, [0.0, 0.05])
    intact = got[0.0]
    attacked = got[0.05]
    assert intact[4] == 1  # one component intact
    assert attacked[0] == 20  # cutoff = hub degree class
    assert attacked[4] > 10  # fragmentation into many components
    assert attacked[5] == 3  # remnant chain 20-21-22 is the new GCC


def test_budget_smaller_than_top_class_is_noop(spark):
    """If even the largest degree class exceeds the budget, nothing is
    removed (whole-class contract)."""
    g = nx.cycle_graph(30)  # all vertices degree 2: one class of 30
    got = assert_curve_match(spark, list(g.edges()), [0.5])
    assert got[0.5] == (None, 0, 30, 30, 1, 30)


def test_scale_free_vs_random_attack_sensitivity(spark):
    """The Albert–Jeong–Barabási signature: at equal removal fractions the
    scale-free graph's GCC collapses far harder than the ER graph's."""
    ba = nx.barabasi_albert_graph(150, 2, seed=7)
    er = nx.gnp_random_graph(150, 4 / 150, seed=7)
    ga = assert_curve_match(spark, list(ba.edges()), [0.0, 0.15])
    ge = assert_curve_match(spark, list(er.edges()), [0.0, 0.15])
    drop_ba = ga[0.15][5] / ga[0.0][5]
    drop_er = ge[0.15][5] / ge[0.0][5]
    assert drop_ba < drop_er


def test_empty_and_validation(spark):
    assert attack_robustness(spark, edges_df(spark, []), [0.0]).curve.count() == 0
    with pytest.raises(AssertionError):
        attack_robustness(spark, edges_df(spark, [(0, 1)]), [])
    with pytest.raises(AssertionError):
        attack_robustness(spark, edges_df(spark, [(0, 1)]), [1.0])


# --- random-failure control arm -------------------------------------------


def test_random_failure_replay_and_ajb_contrast(spark):
    """Predicate-replay parity vs networkx on the kept vertex set, and the
    AJB signature: on a BA graph, random failure at 30% hurts the GCC far
    less than the targeted attack at 15%."""
    import networkx as nx

    from connected_components_3d_spark.operators.robustness import (
        attack_robustness,
        random_failure_robustness,
    )

    M, A, seed = 2147483647, 1103515245, 42
    ba = nx.barabasi_albert_graph(150, 2, seed=11)
    pairs = list(ba.edges())
    e = edges_df(spark, pairs)
    res = random_failure_robustness(spark, e, [(0, 1), (3, 10)], seed=seed)
    got = {
        r["fraction"]: (
            r["cutoff_degree"],
            r["n_removed"],
            r["n_vertices_left"],
            r["n_edges_left"],
            r["n_components"],
            r["gcc_size"],
        )
        for r in res.curve.collect()
    }
    # replay 30% row against networkx
    keep = [v for v in ba if ((seed * A + v) % M) % 10 >= 3]
    h = ba.subgraph(keep)
    comps = list(nx.connected_components(h))
    assert got[0.3] == (
        None,
        150 - len(keep),
        len(keep),
        h.number_of_edges(),
        len(comps),
        max(len(c) for c in comps),
    )
    assert got[0.0][5] == 150  # intact BA graph is connected
    # AJB contrast: random 30% keeps a large GCC fraction of survivors...
    rand_frac = got[0.3][5] / got[0.3][2]
    # ...while the targeted 15% attack shatters (from the earlier test's
    # own run on a same-model graph)
    att = attack_robustness(spark, e, [0.15]).curve.collect()[0]
    att_frac = att["gcc_size"] / att["n_vertices_left"]
    assert rand_frac > 2 * att_frac
