"""Co-occurrence graph parity with the single-node reference, including the
hub-cap semantics and window-boundary exactness (operators/cooccurrence.py)."""

from __future__ import annotations

import datetime as dt
import random

from connected_components_3d_spark.operators.cooccurrence import (
    cooccurrence_graph,
    cooccurrence_single_node,
)

EPOCH = dt.datetime(2024, 1, 1)


def events_df(spark, rows):
    """rows: (epoch_us offset from EPOCH, user) pairs."""
    data = [
        (EPOCH + dt.timedelta(microseconds=int(us)), int(u)) for us, u in rows
    ]
    return spark.createDataFrame(data, "ts timestamp_ntz, user_id long")


def assert_parity(spark, rows, *, window_s, max_users):
    got = {
        (r["user_a"], r["user_b"]): r["n_windows"]
        for r in cooccurrence_graph(
            events_df(spark, rows), window_s=window_s, max_users=max_users
        ).collect()
    }
    want = cooccurrence_single_node(
        [(int(us), int(u)) for us, u in rows],
        window_us=window_s * 1_000_000,
        max_users=max_users,
    )
    assert got == want
    return got


def test_random_log_parity(spark):
    rng = random.Random(11)
    rows = [
        (rng.randrange(0, 50 * 3600 * 1_000_000), rng.randrange(0, 40))
        for _ in range(600)
    ]
    # ~12 events/window: cap 8 binds on some windows, passes others
    got = assert_parity(spark, rows, window_s=3600, max_users=8)
    assert got  # non-degenerate


def test_window_boundary_exact(spark):
    w = 3600 * 1_000_000
    # u0/u1 in window 0; u1/u2 in window 1 (u1's second event lands exactly
    # on the boundary, which belongs to window 1, not 0)
    rows = [(0, 0), (w - 1, 1), (w, 1), (w + 5, 2)]
    got = assert_parity(spark, rows, window_s=3600, max_users=8)
    assert got == {(0, 1): 1, (1, 2): 1}


def test_hub_cap_drops_burst_window(spark):
    w = 3600 * 1_000_000
    # window 0: 10 users (burst, dropped at cap 4); window 1: users 0..2
    rows = [(i, i) for i in range(10)] + [(w + i, i) for i in range(3)]
    got = assert_parity(spark, rows, window_s=3600, max_users=4)
    assert got == {(0, 1): 1, (0, 2): 1, (1, 2): 1}
    # cap off the cliff: with a high cap the burst window counts
    got2 = assert_parity(spark, rows, window_s=3600, max_users=64)
    assert got2[(0, 1)] == 2 and got2[(3, 9)] == 1


def test_duplicate_events_count_once_per_window(spark):
    rows = [(0, 5), (1, 5), (2, 5), (3, 7)]  # u5 active 3× in one window
    got = assert_parity(spark, rows, window_s=3600, max_users=8)
    assert got == {(5, 7): 1}
