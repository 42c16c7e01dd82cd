"""Redirect-chain resolution parity: single-node walk oracle, ρ-shapes,
loops, validation (operators/redirects.py contract)."""

from __future__ import annotations

import pytest

from connected_components_3d_spark.operators.redirects import (
    resolve_redirects,
    resolve_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def rows_of(res):
    return {
        r["src"]: (r["final"], r["hops"], r["status"])
        for r in res.resolved.collect()
    }


def assert_parity(spark, pairs):
    got = rows_of(resolve_redirects(spark, edges_df(spark, pairs)))
    want = resolve_single_node(list(pairs))
    assert got == want
    return got


def mix_graph(n, mod, keep):
    # the deterministic functional-graph family the gate row uses
    return [
        (v, (v * 1103515245 + 7) % 2147483647 % mod)
        for v in range(n)
        if v % keep != 0
    ]


def test_parity_random_functional_graph(spark):
    got = assert_parity(spark, mix_graph(300, 200, 7))
    statuses = {s for (_, _, s) in got.values()}
    # the fixture must exercise all three verdicts
    assert statuses == {"ok", "on_cycle", "enters_cycle"}


def test_pure_chain_exact_hops(spark):
    pairs = [(i, i + 1) for i in range(50)]
    got = assert_parity(spark, pairs)
    for i in range(50):
        assert got[i] == (50, 50 - i, "ok")


def test_pure_cycle_and_tail(spark):
    # ρ: tail 0→1→2 entering cycle 2→3→4→2
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 2)]
    got = assert_parity(spark, pairs)
    assert got[0] == (2, -1, "enters_cycle")
    assert got[1] == (2, -1, "enters_cycle")
    for v in (2, 3, 4):
        assert got[v] == (2, -1, "on_cycle")


def test_self_loop(spark):
    got = assert_parity(spark, [(5, 5), (4, 5)])
    assert got[5] == (5, -1, "on_cycle")
    assert got[4] == (5, -1, "enters_cycle")


def test_two_disjoint_cycles_get_own_minima(spark):
    pairs = [(10, 11), (11, 10), (20, 21), (21, 22), (22, 20)]
    got = assert_parity(spark, pairs)
    assert got[10] == (10, -1, "on_cycle")
    assert got[21] == (20, -1, "on_cycle")


def test_duplicate_edges_collapse_conflicts_raise(spark):
    got = assert_parity(spark, [(0, 1), (0, 1), (1, 2)])
    assert got[0] == (2, 2, "ok")
    with pytest.raises(ValueError):
        resolve_redirects(spark, edges_df(spark, [(0, 1), (0, 2)]))
    with pytest.raises(ValueError):
        resolve_single_node([(0, 1), (0, 2)])


def test_empty(spark):
    res = resolve_redirects(spark, edges_df(spark, []))
    assert res.resolved.count() == 0 and res.rounds == 0


def test_rounds_logarithmic(spark):
    res = resolve_redirects(
        spark, edges_df(spark, [(i, i + 1) for i in range(200)])
    )
    # 200-long chain resolves in ≤ ⌈log₂ 200⌉+1 = 9 doubling rounds,
    # never 200 sequential steps
    assert res.rounds <= 9
