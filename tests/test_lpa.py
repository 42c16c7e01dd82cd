"""LPA parity: exact vs single-node same-tie-rule implementation
(FIXTURES.md §4 g_lpa: two planted communities)."""

from __future__ import annotations

import networkx as nx

from connected_components_3d_spark.operators.lpa import (
    label_propagation,
    lpa_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def planted_two_communities():
    g = nx.planted_partition_graph(2, 200, 0.1, 0.002, seed=42)
    return list(g.edges())


def test_lpa_exact_vs_single_node_fixed_iters(spark):
    pairs = planted_two_communities()
    for k in (1, 3, 5):
        res = label_propagation(spark, edges_df(spark, pairs), fixed_iters=k)
        got = {r["vertex"]: r["label"] for r in res.labels.collect()}
        want = lpa_single_node(pairs, iters=k)
        assert got == want, f"k={k}"


def test_lpa_finds_planted_communities(spark):
    pairs = planted_two_communities()
    res = label_propagation(spark, edges_df(spark, pairs), fixed_iters=5)
    labels = {r["vertex"]: r["label"] for r in res.labels.collect()}
    # dominant label within each planted block covers almost all of it
    for block in (range(0, 200), range(200, 400)):
        from collections import Counter

        c = Counter(labels[v] for v in block)
        assert c.most_common(1)[0][1] >= 180


def test_lpa_with_initial_labels(spark):
    pairs = [(1, 2), (2, 3), (10, 11)]
    init = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (10, 7), (11, 7)], "vertex long, label long"
    )
    res = label_propagation(
        spark, edges_df(spark, pairs), initial_labels=init, fixed_iters=2
    )
    got = {r["vertex"]: r["label"] for r in res.labels.collect()}
    assert got == {1: 100, 2: 100, 3: 100, 10: 7, 11: 7}


def test_lpa_isolated_vertex_keeps_label(spark):
    # vertex 5 appears only as an edge endpoint pair with itself removed →
    # use a disconnected pair instead
    pairs = [(1, 2), (5, 6)]
    res = label_propagation(spark, edges_df(spark, pairs), fixed_iters=3)
    got = {r["vertex"]: r["label"] for r in res.labels.collect()}
    assert got[5] in (5, 6) and got[1] in (1, 2)


# --- durable checkpoint/resume (label_propagation_checkpointed) ------------


def test_lpa_checkpointed_equals_uninterrupted(spark, tmp_path):
    import networkx as nx

    from connected_components_3d_spark.operators.lpa import (
        label_propagation,
        label_propagation_checkpointed,
    )

    g = nx.gnp_random_graph(90, 0.07, seed=25)
    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in g.edges()], "src long, dst long"
    )
    cold = label_propagation(spark, e, fixed_iters=4)
    ck = label_propagation_checkpointed(
        spark, e, checkpoint_dir=str(tmp_path / "lck"), fixed_iters=4,
        checkpoint_every=2,
    )
    a = {r["vertex"]: r["label"] for r in cold.labels.collect()}
    b = {r["vertex"]: r["label"] for r in ck.labels.collect()}
    assert a == b


def test_lpa_checkpointed_resume_extends(spark, tmp_path):
    import networkx as nx

    from connected_components_3d_spark.operators.lpa import (
        label_propagation,
        label_propagation_checkpointed,
    )
    from connected_components_3d_spark.sources import checkpoint as ckpt

    g = nx.gnp_random_graph(70, 0.08, seed=26)
    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in g.edges()], "src long, dst long"
    )
    d = str(tmp_path / "lck2")
    label_propagation_checkpointed(
        spark, e, checkpoint_dir=d, fixed_iters=2, checkpoint_every=2
    )
    res = label_propagation_checkpointed(
        spark, e, checkpoint_dir=d, fixed_iters=4, checkpoint_every=2
    )
    assert ckpt.read_manifest(d, 2) is not None  # resumed, not cleared
    cold = label_propagation(spark, e, fixed_iters=4)
    a = {r["vertex"]: r["label"] for r in cold.labels.collect()}
    b = {r["vertex"]: r["label"] for r in res.labels.collect()}
    assert a == b


def test_lpa_self_loop_parity(spark):
    # (v,v) edges are dropped after symmetrize: a vertex never counts its
    # own label, and a self-loop-only vertex (9,9) is absent from the
    # output — exactly lpa_single_node's u==v skip convention.
    pairs = [(1, 2), (2, 3), (3, 1), (2, 2), (4, 5), (4, 4), (9, 9)]
    for k in (1, 2, 4):
        res = label_propagation(spark, edges_df(spark, pairs), fixed_iters=k)
        got = {r["vertex"]: r["label"] for r in res.labels.collect()}
        want = lpa_single_node(pairs, iters=k)
        assert got == want, f"k={k}"
    assert 9 not in got
