"""TrustRank / spam mass (operators/trustrank.py): composition parity vs
the single-node PR/PPR oracles and the spam-farm semantics the operator
exists for."""

from __future__ import annotations

import random

import pytest

from connected_components_3d_spark.operators.pagerank import (
    pagerank_single_node,
)
from connected_components_3d_spark.operators.ppr import ppr_single_node
from connected_components_3d_spark.operators.trustrank import (
    spam_mass,
    trustrank,
)


def _rand_edges(seed, n=200, v=30):
    rng = random.Random(seed)
    return sorted({(rng.randrange(v), rng.randrange(v)) for _ in range(n)})


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _seeds(spark, seeds):
    return spark.createDataFrame([(s,) for s in seeds], "vertex long")


def test_trustrank_is_seeded_ppr(spark):
    pairs = _rand_edges(9)
    seeds = [0, 1, 2]
    got = {
        r["vertex"]: r["trust"]
        for r in trustrank(
            spark, _df(spark, pairs), _seeds(spark, seeds), fixed_iters=6
        ).collect()
    }
    want = ppr_single_node(pairs, seeds, fixed_iters=6)
    assert set(got) == set(want)
    for v, t in want.items():
        assert got[v] == pytest.approx(t, rel=1e-6, abs=1e-9)


def test_spam_mass_matches_single_node_composition(spark):
    pairs = _rand_edges(13)
    seeds = [3, 4]
    rows = {
        r["vertex"]: r
        for r in spam_mass(
            spark, _df(spark, pairs), _seeds(spark, seeds), fixed_iters=5
        ).collect()
    }
    pr = pagerank_single_node(pairs, fixed_iters=5)
    tr = ppr_single_node(pairs, seeds, fixed_iters=5)
    for v in pr:
        p, t = round(pr[v], 8), round(tr[v], 8)
        want = round((p - t) / p, 8) if p > 0 else 0.0
        assert rows[v]["rank"] == pytest.approx(p, rel=1e-6, abs=1e-8)
        assert rows[v]["trust"] == pytest.approx(t, rel=1e-6, abs=1e-8)
        assert rows[v]["rel_spam_mass"] == pytest.approx(want, abs=5e-6)


def test_spam_farm_has_high_relative_mass(spark):
    # trusted cluster {0,1,2} interlinked; spam farm {10..15} interlinked,
    # boosting target 20; one honest link 0->20 as well
    good = [(0, 1), (1, 2), (2, 0)]
    farm = [(a, b) for a in range(10, 16) for b in range(10, 16) if a != b]
    boost = [(a, 20) for a in range(10, 16)]
    edges = good + farm + boost + [(0, 20), (20, 0)]
    rows = {
        r["vertex"]: r["rel_spam_mass"]
        for r in spam_mass(
            spark, _df(spark, edges), _seeds(spark, [0, 1, 2]),
            fixed_iters=20,
        ).collect()
    }
    # farm pages get ~all rank from untrusted regions (nothing trusted
    # reaches them); the trusted core is over-accounted (negative rel mass)
    assert min(rows[v] for v in range(10, 16)) > 0.9
    assert max(rows[v] for v in (0, 1, 2)) < 0.0
    # the boosted target sits strictly between: the honest link 0->20
    # carries half of seed 0's trust, so only the farm's (teleport-only)
    # rank share goes unaccounted — small but positive
    assert max(rows[v] for v in (0, 1, 2)) < rows[20]
    assert 0.0 < rows[20] < min(rows[v] for v in range(10, 16))
