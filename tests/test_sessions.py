"""Sessionization parity and semantics (operators/sessions.py contract)."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from connected_components_3d_spark.operators.sessions import (
    session_stats,
    sessionize,
    sessionize_single_node,
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


def spark_assignments(spark, rows, gap_us):
    out = sessionize(events_df(spark, rows), gap_us)
    return {
        (r["user_id"], r["event_id"]): (r["session_idx"], r["session_seq"])
        for r in out.collect()
    }


def test_random_parity_vs_single_node(spark):
    rng = random.Random(7)
    rows = []
    tb = 0
    for _ in range(400):
        rows.append(
            (
                rng.randrange(12),
                rng.randrange(0, 5_000_000, 7),
                tb,
                rng.choice("abc"),
            )
        )
        tb += 1
    gap = 250_000
    got = spark_assignments(spark, rows, gap)
    want = sessionize_single_node([(e, us, t) for e, us, t, _ in rows], gap)
    assert got == want


def test_exact_gap_stays_in_session(spark):
    # strictly-greater boundary rule: gap == gap_us does NOT split
    rows = [(1, 0, 0, "a"), (1, 100, 1, "a"), (1, 201, 2, "a")]
    got = spark_assignments(spark, rows, 100)
    assert got == {(1, 0): (1, 1), (1, 1): (1, 2), (1, 2): (2, 1)}


def test_tiebreak_orders_equal_timestamps(spark):
    rows = [(1, 50, 9, "a"), (1, 50, 3, "a"), (1, 50, 5, "a")]
    got = spark_assignments(spark, rows, 10)
    assert got == {(1, 3): (1, 1), (1, 5): (1, 2), (1, 9): (1, 3)}


def test_entities_independent(spark):
    rows = [(1, 0, 0, "a"), (2, 1_000_000, 1, "a"), (1, 2_000_000, 2, "a")]
    got = spark_assignments(spark, rows, 500_000)
    assert got[(2, 1)] == (1, 1)
    assert got[(1, 0)] == (1, 1)
    assert got[(1, 2)] == (2, 1)


def test_session_stats_rollup(spark):
    rows = [
        (1, 0, 0, "view"),
        (1, 60, 1, "click"),
        (1, 1_000_000, 2, "view"),
        (2, 5, 3, "view"),
    ]
    stats = {
        (r["user_id"], r["session_idx"]): r.asDict()
        for r in session_stats(events_df(spark, rows), 1000).collect()
    }
    epoch_us = int(EPOCH.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    assert stats[(1, 1)]["n_events"] == 2
    assert stats[(1, 1)]["start_us"] == epoch_us
    assert stats[(1, 1)]["end_us"] == epoch_us + 60
    assert stats[(1, 1)]["duration_us"] == 60
    assert stats[(1, 1)]["n_types"] == 2
    assert stats[(1, 2)]["n_events"] == 1
    assert stats[(1, 2)]["duration_us"] == 0
    assert stats[(2, 1)]["n_events"] == 1


def test_single_event_and_empty(spark):
    assert spark_assignments(spark, [(1, 0, 0, "a")], 10) == {(1, 0): (1, 1)}
    assert spark_assignments(spark, [], 10) == {}


def test_validation(spark):
    with pytest.raises(ValueError, match="gap_us"):
        sessionize(events_df(spark, []), 0)
