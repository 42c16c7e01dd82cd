"""Temporal earliest-arrival parity and time-respecting semantics
(operators/temporal.py contract)."""

from __future__ import annotations

import random

from connected_components_3d_spark.operators.temporal import (
    earliest_arrival,
    earliest_arrival_single_node,
    latest_departure,
    latest_departure_single_node,
)


def dfs(spark, tedges, seeds):
    te = spark.createDataFrame(
        [(int(a), int(b), int(t)) for a, b, t in tedges],
        "src long, dst long, t long",
    )
    sd = spark.createDataFrame(
        [(int(v), int(t)) for v, t in seeds], "vertex long, t0 long"
    )
    return te, sd


def assert_parity(spark, tedges, seeds, **kw):
    te, sd = dfs(spark, tedges, seeds)
    res = earliest_arrival(spark, te, sd, **kw)
    got = {r["vertex"]: r["arrival"] for r in res.arrivals.collect()}
    assert got == earliest_arrival_single_node(tedges, seeds)
    return res, got


def test_random_temporal_graph_parity(spark):
    rng = random.Random(13)
    tedges = [
        (rng.randrange(0, 40), rng.randrange(0, 40), rng.randrange(0, 50))
        for _ in range(400)
    ]
    res, got = assert_parity(spark, tedges, [(0, 0), (7, 10)])
    assert res.converged and got[0] == 0


def test_time_respecting_beats_static_reachability(spark):
    # 0 -(t=5)-> 1 -(t=3)-> 2 : statically 2 is reachable, temporally NOT
    # (the 1->2 edge fires before the information reaches 1)
    res, got = assert_parity(spark, [(0, 1, 5), (1, 2, 3)], [(0, 0)])
    assert got == {0: 0, 1: 5}


def test_later_parallel_edge_is_the_traversable_one(spark):
    # two parallel 1->2 edges; only the later one satisfies t >= ea(1)=5:
    # collapsing parallel edges to their min-t would lose reachability
    res, got = assert_parity(
        spark, [(0, 1, 5), (1, 2, 3), (1, 2, 8)], [(0, 0)]
    )
    assert got == {0: 0, 1: 5, 2: 8}


def test_waiting_allowed_and_seed_time_gates(spark):
    # seed starts at t0=4: the t=3 out-edge is already gone, t=6 works
    res, got = assert_parity(spark, [(0, 1, 3), (0, 1, 6)], [(0, 4)])
    assert got == {0: 4, 1: 6}


def test_multi_seed_min_and_self_loop_ignored(spark):
    res, got = assert_parity(
        spark,
        [(0, 2, 10), (1, 2, 4), (2, 2, 1)],
        [(0, 0), (1, 0), (1, 2)],
    )
    assert got == {0: 0, 1: 0, 2: 4}


def assert_ld_parity(spark, tedges, targets, **kw):
    te = spark.createDataFrame(
        [(int(a), int(b), int(t)) for a, b, t in tedges],
        "src long, dst long, t long",
    )
    tg = spark.createDataFrame(
        [(int(v), int(t)) for v, t in targets], "vertex long, t1 long"
    )
    res = latest_departure(spark, te, tg, **kw)
    got = {r["vertex"]: r["departure"] for r in res.arrivals.collect()}
    assert got == latest_departure_single_node(tedges, targets)
    return res, got


def test_latest_departure_parity_random(spark):
    rng = random.Random(29)
    tedges = [
        (rng.randrange(0, 30), rng.randrange(0, 30), rng.randrange(0, 40))
        for _ in range(300)
    ]
    res, got = assert_ld_parity(spark, tedges, [(0, 100), (9, 100)])
    assert res.converged and got[0] >= 100


def test_latest_departure_chain(spark):
    # 0 -(t=2)-> 1 -(t=5)-> 2 (target, deadline 10): leave 0 no later
    # than 2; leave 1 no later than 5
    res, got = assert_ld_parity(
        spark, [(0, 1, 2), (1, 2, 5)], [(2, 10)]
    )
    assert got == {0: 2, 1: 5, 2: 10}
    # deadline below the 1->2 edge time cuts the whole chain
    res, got = assert_ld_parity(
        spark, [(0, 1, 2), (1, 2, 5)], [(2, 4)]
    )
    assert got == {2: 4}


def test_latest_departure_duality_with_earliest_arrival(spark):
    # on the reversed graph with negated times, ld(targets at -0) is the
    # mirror of ea(seeds at 0): verify reachability sets coincide
    tedges = [(0, 1, 3), (1, 2, 7), (2, 3, 9), (4, 0, 1)]
    _, ea = assert_parity(spark, tedges, [(0, 0)])
    rev = [(b, a, -t) for a, b, t in tedges]
    _, ld = assert_ld_parity(spark, rev, [(0, 0)])
    assert set(ea) == set(ld)
    for v in ea:
        assert ld[v] == -ea[v]


def test_unreachable_omitted_and_empty(spark):
    res, got = assert_parity(spark, [(5, 6, 1)], [(0, 0)])
    assert got == {0: 0}
    te, sd = dfs(spark, [], [])
    res = earliest_arrival(spark, te, sd)
    assert res.arrivals.count() == 0 and res.converged
