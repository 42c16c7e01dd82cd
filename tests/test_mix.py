"""Deterministic corpus mixing (operators/mix.py): exact hash replay of
copy counts, zero-weight drop, default weight, temperature math."""

from __future__ import annotations

import hashlib
import math

import pytest

from connected_components_3d_spark.operators.mix import (
    _frac_bound,
    mix_corpus,
    temperature_weights,
)

WEIGHTS = {"a": 2.3, "b": 0.5, "c": 0.0}


def mix_single(rows, weights, default=1.0, salt="v1"):
    out = []
    for k, g in rows:
        w = weights.get(g, default)
        n = int(w)
        bound = _frac_bound(w - int(w))
        h = hashlib.md5(f"{k}:mix:{salt}".encode()).hexdigest()[:15]
        if bound and h <= bound:
            n += 1
        out.extend((k, g, i) for i in range(n))
    return sorted(out)


def test_mix_replay_parity(spark):
    rows = [(i, "abcd"[i % 4]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    got = sorted(
        (r["doc_id"], r["grp"], r["copy_idx"])
        for r in mix_corpus(df, "doc_id", "grp", WEIGHTS).collect()
    )
    ref = mix_single(rows, WEIGHTS)
    assert got == ref
    # group c fully dropped; group d (unlisted) exactly once
    assert not any(g == "c" for _, g, _ in got)
    d_rows = [t for t in got if t[1] == "d"]
    assert len(d_rows) == 100 and all(i == 0 for _, _, i in d_rows)
    # group a: every row at least twice, ~30% thrice
    a_counts = {}
    for k, g, i in got:
        if g == "a":
            a_counts[k] = a_counts.get(k, 0) + 1
    assert set(a_counts.values()) <= {2, 3}
    frac3 = sum(1 for v in a_counts.values() if v == 3) / len(a_counts)
    assert 0.1 < frac3 < 0.5


def test_mix_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, grp string")
    with pytest.raises(ValueError):
        mix_corpus(df, "doc_id", "grp", {"a": -1.0})


def test_temperature_weights():
    counts = {"big": 900, "small": 100}
    w1 = temperature_weights(counts, 1.0)
    assert all(abs(w - 1.0) < 1e-12 for w in w1.values())
    w = temperature_weights(counts, 2.0)
    # flattening: small source upweighted, big downweighted
    assert w["small"] > 1.0 > w["big"]
    # expected corpus size preserved
    total = sum(w[g] * counts[g] for g in counts)
    assert math.isclose(total, 1000)
    with pytest.raises(ValueError):
        temperature_weights(counts, 0.0)
    with pytest.raises(ValueError):
        temperature_weights({}, 1.0)
