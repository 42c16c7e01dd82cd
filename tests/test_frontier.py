"""Politeness frontier scheduling (operators/frontier.py): exact replay
of host/shard/rank/wave, per-wave rate invariant, shard ownership,
repartition stability."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest

from connected_components_3d_spark.operators.frontier import (
    politeness_schedule,
    shard_boundaries,
)

URLS = [
    (f"https://h{i % 7}.example.com/p{j}", (i * 13 + j * 7) % 50)
    for i in range(21)
    for j in range(4)
]


def shard_single(host, num_shards, salt="v1"):
    h = hashlib.md5(f"{host}:shard:{salt}".encode()).hexdigest()[:15]
    for i, b in enumerate(shard_boundaries(num_shards)[:-1]):
        if h <= b:
            return i
    return num_shards - 1


def schedule_single(rows, rate, num_shards):
    by_host = defaultdict(list)
    for url, pr in rows:
        host = url.split("://")[1].split("/")[0].lower()
        by_host[host].append((url, pr))
    out = {}
    for host, items in by_host.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        for r, (url, _) in enumerate(items, start=1):
            out[url] = (host, shard_single(host, num_shards), r, (r - 1) // rate)
    return out


def test_schedule_replay_and_invariants(spark):
    df = spark.createDataFrame(URLS, "url string, prio long")
    got = {
        r["url"]: (r["host"], r["shard"], r["rank"], r["wave"])
        for r in politeness_schedule(
            df, priority_col="prio", per_host_rate=2, num_shards=8
        ).collect()
    }
    assert got == schedule_single(URLS, 2, 8)
    # invariants: same host → same shard; ≤ rate URLs per (host, wave)
    per = defaultdict(int)
    shard_of = {}
    for url, (host, shard, rank, wave) in got.items():
        per[(host, wave)] += 1
        assert shard_of.setdefault(host, shard) == shard
    assert all(c <= 2 for c in per.values())
    # repartition stability
    got2 = {
        r["url"]: (r["host"], r["shard"], r["rank"], r["wave"])
        for r in politeness_schedule(
            df.repartition(11), priority_col="prio",
            per_host_rate=2, num_shards=8,
        ).collect()
    }
    assert got2 == got


def test_validation(spark):
    df = spark.createDataFrame(URLS[:2], "url string, prio long")
    with pytest.raises(ValueError):
        politeness_schedule(df, priority_col="prio", per_host_rate=0,
                            num_shards=4)
    with pytest.raises(ValueError):
        shard_boundaries(0)
    assert shard_boundaries(1) == ["f" * 15]
