"""Corpus splitting / per-group caps (operators/split.py): exact hash
replay, proportion concentration, stability, cap determinism."""

from __future__ import annotations

import hashlib

import pytest

from connected_components_3d_spark.operators.split import (
    cap_per_group,
    split_boundaries,
    split_by_hash,
)


def split_single(keys, fractions, salt="v1"):
    bounds = split_boundaries(fractions)
    out = {}
    for k in keys:
        h = hashlib.md5(f"{k}:{salt}".encode()).hexdigest()[:15]
        for name, b in bounds[:-1]:
            if h <= b:
                out[k] = name
                break
        else:
            out[k] = bounds[-1][0]
    return out


FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_hash_replay_parity(spark):
    keys = list(range(500))
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    got = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(df, "doc_id", FRACS).collect()
    }
    assert got == split_single(keys, FRACS)


def test_proportions_and_stability(spark):
    keys = list(range(5000))
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in split_by_hash(df, "doc_id", FRACS).collect()}
    counts = {s: sum(1 for v in a.values() if v == s) for s in FRACS}
    for s, f in FRACS.items():
        assert abs(counts[s] / 5000 - f) < 0.02
    # same salt → identical under repartition; different salt → differs
    b = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(df.repartition(17), "doc_id", FRACS).collect()
    }
    assert a == b
    c = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(df, "doc_id", FRACS, salt="v2").collect()
    }
    assert a != c


def test_boundary_validation():
    with pytest.raises(ValueError):
        split_boundaries({})
    with pytest.raises(ValueError):
        split_boundaries({"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        split_boundaries({"a": 1.2, "b": -0.2})
    assert split_boundaries({"all": 1.0}) == [("all", "f" * 15)]


def test_cap_per_group(spark):
    rows = [
        ("h1", i, 100 - (i % 7)) for i in range(20)
    ] + [("h2", 100 + i, 50) for i in range(2)]
    df = spark.createDataFrame(rows, "host string, doc_id long, q long")
    got = cap_per_group(
        df, ["host"], 3, order_col="q", tiebreak_col="doc_id", rank_col="rk"
    ).collect()
    by_host: dict = {}
    for r in got:
        by_host.setdefault(r["host"], []).append((r["rk"], r["doc_id"], r["q"]))
    # h1: best q=100 at doc_ids 0,7,14 — tiebreak ascending doc_id
    assert sorted(by_host["h1"]) == [(1, 0, 100), (2, 7, 100), (3, 14, 100)]
    # h2 has only 2 rows — both kept
    assert sorted(by_host["h2"]) == [(1, 100, 50), (2, 101, 50)]
    with pytest.raises(ValueError):
        cap_per_group(df, ["host"], 0, order_col="q", tiebreak_col="doc_id")
