"""Hopping-window aggregation (operators/windows.py): hand-computed
window membership (hop count, boundary inclusion/exclusion), tumbling
degenerate, distinct users, single-node replay on pseudo-random events."""

from __future__ import annotations

import datetime as dt

from connected_components_3d_spark.operators.windows import (
    hopping_window_counts,
)


def ev_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )


def T(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s)


def test_hand_computed_membership(spark):
    rows = [
        (1, T(0), 10, "a", 1.0),   # windows starting -10, -5, 0
        (2, T(7), 10, "a", 2.0),   # windows starting -5, 0, 5
        (3, T(15), 11, "a", 4.0),  # windows starting 5, 10, 15
    ]
    got = {
        (r["window_start"].minute if r["window_start"].day == 1 else
         r["window_start"].minute - 60, r["event_type"]): (
            r["n_events"], r["n_users"], r["sum_value"])
        for r in hopping_window_counts(
            ev_df(spark, rows), window="15 minutes", slide="5 minutes"
        ).collect()
        if r["window_start"].day == 1 and r["window_start"].hour == 0
    }
    # window [0, 15) holds events at 0 and 7 but NOT 15 (end-exclusive)
    assert got[(0, "a")] == (2, 1, 3.0)
    # window [5, 20) holds 7 and 15
    assert got[(5, "a")] == (2, 2, 6.0)
    # window [15, 30) holds only 15
    assert got[(15, "a")] == (1, 1, 4.0)


def test_tumbling_degenerate(spark):
    rows = [(i, T(i), i % 2, "x", 1.0) for i in range(10)]
    got = hopping_window_counts(
        ev_df(spark, rows), window="5 minutes", slide="5 minutes"
    ).collect()
    assert sum(r["n_events"] for r in got) == 10  # each event in ONE window
    assert len(got) == 2


def test_every_event_in_exactly_three_hops(spark):
    rows = [(i, T(i % 50), i, "y", 0.5) for i in range(40)]
    got = hopping_window_counts(
        ev_df(spark, rows), window="15 minutes", slide="5 minutes"
    ).collect()
    assert sum(r["n_events"] for r in got) == 3 * 40  # window/slide = 3


def test_hopping_window_custom_columns(spark):
    # same data, renamed columns: parameterized user_col/value_col must
    # reproduce the default-schema result exactly
    import datetime as dt

    from connected_components_3d_spark.operators.windows import (
        hopping_window_counts,
    )

    rows = [
        (dt.datetime(2024, 1, 1, 0, m), "a", u, float(m)) for m, u in
        [(1, 10), (4, 11), (7, 10), (12, 12), (31, 10)]
    ]
    base = spark.createDataFrame(
        rows, "ts timestamp, event_type string, user_id long, value double"
    )
    renamed = (
        base.withColumnRenamed("user_id", "uid")
        .withColumnRenamed("value", "amount")
    )
    want = sorted(map(tuple, hopping_window_counts(base).collect()))
    got = sorted(
        map(
            tuple,
            hopping_window_counts(
                renamed, user_col="uid", value_col="amount"
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
