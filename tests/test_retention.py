"""Cohort-retention parity and invariants (operators/retention.py)."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from connected_components_3d_spark.operators.retention import (
    cohort_retention,
    cohort_retention_single_node,
)

EPOCH = dt.datetime(2024, 1, 1)
EPOCH_US = int(EPOCH.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
DAY_US = 86_400 * 1_000_000


def events_df(spark, rows):
    """rows: (entity, epoch_us)."""
    data = [
        (int(u), EPOCH + dt.timedelta(microseconds=int(us))) for u, us in rows
    ]
    return spark.createDataFrame(data, "user_id long, ts timestamp_ntz")


def assert_parity(spark, rows, period_s=86_400):
    got = {
        (r["cohort"], r["k"]): (r["n_active"], r["retention"])
        for r in cohort_retention(
            events_df(spark, rows), period_s=period_s
        ).collect()
    }
    # the DataFrame timestamps are EPOCH-anchored; feed the reference the
    # same absolute microseconds (cohort/period ids are absolute)
    want = cohort_retention_single_node(
        [(u, EPOCH_US + us) for u, us in rows],
        period_us=period_s * 1_000_000,
    )
    assert set(got) == set(want)
    for ck in want:
        assert got[ck][0] == want[ck][0], ck
        assert abs(got[ck][1] - want[ck][1]) < 1e-9, ck
    return got


def test_random_log_parity(spark):
    rng = random.Random(31)
    rows = [
        (rng.randrange(0, 30), rng.randrange(0, 12 * DAY_US))
        for _ in range(600)
    ]
    got = assert_parity(spark, rows)
    # k=0 of every cohort is retention 1.0 (every member is active in its
    # own first period by definition)
    for (c, k), (_, r) in got.items():
        if k == 0:
            assert r == 1.0, c
        assert k >= 0


def test_two_cohorts_exact(spark):
    # u1,u2 first on day 0; u2 returns day 2; u3 first on day 1
    rows = [
        (1, 0),
        (2, 10),
        (2, 2 * DAY_US + 5),
        (3, DAY_US + 1),
    ]
    base = EPOCH_US // DAY_US  # EPOCH is midnight-aligned: day id 19723
    got = assert_parity(spark, rows)
    assert got == {
        (base, 0): (2, 1.0),
        (base, 2): (1, 0.5),
        (base + 1, 0): (1, 1.0),
    }


def test_duplicate_presence_counts_once(spark):
    rows = [(7, 0), (7, 5), (7, DAY_US), (7, DAY_US + 9)]
    base = EPOCH_US // DAY_US
    got = assert_parity(spark, rows)
    assert got == {(base, 0): (1, 1.0), (base, 1): (1, 1.0)}


def test_period_validation(spark):
    with pytest.raises(ValueError):
        cohort_retention(events_df(spark, []), period_s=0)
