"""Transition-matrix parity with the single-node reference, deterministic
tie order, and normalization (operators/transitions.py)."""

from __future__ import annotations

import datetime as dt
import random

from connected_components_3d_spark.operators.transitions import (
    transition_matrix,
    transition_matrix_single_node,
)

EPOCH = dt.datetime(2024, 1, 1)


def events_df(spark, rows):
    """rows: (entity, ts_us, tiebreak, state)."""
    data = [
        (int(e), EPOCH + dt.timedelta(microseconds=int(us)), int(tb), s)
        for e, us, tb, s in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp_ntz, event_id long, event_type string"
    )


def assert_parity(spark, rows):
    # n compared exactly; p within 1e-9 (Spark ROUND is half-up, the
    # single-node reference uses Python's banker's round — ties at the
    # 7th digit don't occur in these fixtures)
    got = {
        (r["src_state"], r["dst_state"]): (r["n"], r["p"])
        for r in transition_matrix(events_df(spark, rows)).collect()
    }
    want = transition_matrix_single_node(
        [(e, us, tb, s) for e, us, tb, s in rows]
    )
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 1e-9, (k, got[k], want[k])
    return got


def test_random_streams_parity(spark):
    rng = random.Random(7)
    states = ["view", "click", "buy", "exit"]
    rows = [
        (rng.randrange(0, 15), rng.randrange(0, 10**9), i, rng.choice(states))
        for i in range(500)
    ]
    got = assert_parity(spark, rows)
    assert len(got) > 4
    # per-source probabilities sum to 1 (within rounding)
    from collections import defaultdict

    sums = defaultdict(float)
    for (a, _), (_, p) in got.items():
        sums[a] += p
    for a, s in sums.items():
        assert abs(s - 1.0) < 1e-4, (a, s)


def test_no_cross_entity_pairs(spark):
    # each entity has one event: no transitions at all
    rows = [(i, 1000 * i, i, "view") for i in range(20)]
    assert transition_matrix(events_df(spark, rows)).count() == 0


def test_tie_order_deterministic(spark):
    # same ts: order falls back to event_id
    rows = [(1, 0, 2, "b"), (1, 0, 1, "a"), (1, 0, 3, "c")]
    got = assert_parity(spark, rows)
    # per-source normalization: each src has exactly one outgoing transition
    assert got == {("a", "b"): (1, 1.0), ("b", "c"): (1, 1.0)}
