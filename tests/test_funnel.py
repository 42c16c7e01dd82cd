"""Funnel-analysis parity and semantics (operators/funnel.py contract)."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from connected_components_3d_spark.operators.funnel import (
    funnel,
    funnel_single_node,
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


def assert_parity(spark, rows, steps, **kw):
    got = {
        r["step"]: (r["step_name"], r["n_entities"])
        for r in funnel(events_df(spark, rows), steps, **kw).collect()
    }
    want = funnel_single_node(rows, steps, **kw)
    assert {k: v[1] for k, v in got.items()} == want
    assert [got[i + 1][0] for i in range(len(steps))] == steps
    # funnel shape: non-increasing
    ns = [got[i + 1][1] for i in range(len(steps))]
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    return got


def test_random_log_parity(spark):
    rng = random.Random(21)
    states = ["view", "click", "buy", "other"]
    rows = [
        (rng.randrange(0, 25), rng.randrange(0, 10**8), i, rng.choice(states))
        for i in range(800)
    ]
    got = assert_parity(spark, rows, ["view", "click", "buy"])
    assert got[1][1] > 0
    # windowed variant also agrees
    assert_parity(
        spark, rows, ["view", "click", "buy"], window_us=5 * 10**6
    )


def test_order_matters(spark):
    # entity 1 does click before view: completes only step 1 (view later)
    rows = [(1, 10, 0, "click"), (1, 20, 1, "view")]
    got = assert_parity(spark, rows, ["view", "click"])
    assert got[1][1] == 1 and got[2][1] == 0
    # entity 2 in proper order completes both
    rows += [(2, 10, 2, "view"), (2, 20, 3, "click")]
    got = assert_parity(spark, rows, ["view", "click"])
    assert got[1][1] == 2 and got[2][1] == 1


def test_first_touch_window_anchor(spark):
    # first view at t=0; click at t=100 is outside the 50us window even
    # though a second view at t=90 would have anchored a valid window —
    # the documented first-touch contract counts step 1 only
    rows = [(1, 0, 0, "view"), (1, 90, 1, "view"), (1, 100, 2, "click")]
    got = assert_parity(spark, rows, ["view", "click"], window_us=50)
    assert got[1][1] == 1 and got[2][1] == 0
    # without the window it completes
    got = assert_parity(spark, rows, ["view", "click"])
    assert got[2][1] == 1


def test_same_ts_tiebreak_order(spark):
    # view and click at the same ts: click's event_id is later -> counts
    rows = [(1, 5, 1, "view"), (1, 5, 2, "click")]
    got = assert_parity(spark, rows, ["view", "click"])
    assert got[2][1] == 1
    # reversed event_ids: click precedes view in stream order -> step 1 only
    rows = [(2, 5, 9, "view"), (2, 5, 8, "click")]
    got = assert_parity(spark, rows, ["view", "click"])
    assert got[2][1] == 0


def test_validation(spark):
    with pytest.raises(ValueError):
        funnel(events_df(spark, []), [])
    with pytest.raises(ValueError):
        funnel(events_df(spark, []), ["a", "a"])
