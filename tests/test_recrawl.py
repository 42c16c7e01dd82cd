"""Recrawl freshness scheduling (operators/recrawl.py): exact python
replay, change counting under ties, priority ordering, degenerates."""

from __future__ import annotations

from collections import defaultdict

from connected_components_3d_spark.operators.recrawl import recrawl_priority


def obs_df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, ts_us long, content string, oid long"
    )


def replay(rows, now=None, s=0.5):
    by: dict = defaultdict(list)
    for u, t, c, oid in rows:
        by[u].append((t, oid, c))
    if now is None:
        now = max(r[1] for r in rows)
    out = {}
    for u, items in by.items():
        items.sort()
        changes = sum(
            1 for a, b in zip(items, items[1:]) if a[2] != b[2]
        )
        ts = [t for t, _, _ in items]
        span = max(ts) - min(ts)
        rate = (changes + s) / (span + 1)
        age = now - max(ts)
        out[u] = (len(items), changes, span, age, rate, rate * age)
    return out


ROWS = [
    ("a", 100, "x", 1), ("a", 200, "y", 2), ("a", 300, "y", 3),
    ("a", 400, "z", 4),
    ("b", 100, "k", 5), ("b", 500, "k", 6),
    ("c", 250, "q", 7),
    # same-timestamp pair: tiebreak oid orders them deterministically
    ("d", 100, "m", 9), ("d", 100, "n", 8), ("d", 600, "n", 10),
]


def test_replay_parity(spark):
    res = recrawl_priority(
        obs_df(spark, ROWS), content_col="content", tiebreak_col="oid"
    )
    got = {
        r["url"]: (
            r["n_obs"], r["n_changes"], r["span_us"], r["age_us"],
            r["rate"], r["priority"],
        )
        for r in res.schedule.collect()
    }
    assert got == replay(ROWS)
    assert res.now_us == 600
    # a changed twice in 300us and is stale → outranks the static b
    assert got["a"][5] > got["b"][5]
    # d: (100,"n") sorts before (100,"m")? no — oid 8 ("n") then 9 ("m"):
    # n→m→n = 2 changes
    assert got["d"][1] == 2


def test_explicit_now_and_empty(spark):
    res = recrawl_priority(
        obs_df(spark, ROWS[:2]), content_col="content", tiebreak_col="oid",
        now_us=1000,
    )
    row = res.schedule.collect()[0]
    assert row["age_us"] == 800 and res.now_us == 1000
    res0 = recrawl_priority(
        obs_df(spark, []).limit(0), content_col="content", tiebreak_col="oid"
    )
    assert res0.schedule.count() == 0
