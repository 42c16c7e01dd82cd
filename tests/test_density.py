"""DBSCAN parity with the single-node reference and density semantics
(operators/density.py contract)."""

from __future__ import annotations

import random

import pytest

from connected_components_3d_spark.operators.density import (
    dbscan,
    dbscan_single_node,
)


def emb_df(spark, vecs):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )


def assert_parity(spark, vecs, **kw):
    got = {
        r["id"]: (r["cluster"], r["role"])
        for r in dbscan(spark, emb_df(spark, vecs), **kw).collect()
    }
    want = dbscan_single_node(vecs, **{k: v for k, v in kw.items()})
    assert got == want
    return got


def blob(rng, center, n, spread=0.15, dim=8):
    out = []
    for _ in range(n):
        out.append([c + rng.uniform(-spread, spread) for c in center])
    return out


def test_two_blobs_and_noise(spark):
    rng = random.Random(42)
    vecs = {}
    i = 0
    for v in blob(rng, [1.0] + [0.0] * 7, 8):
        vecs[i] = v
        i += 1
    for v in blob(rng, [0.0] * 4 + [1.0] + [0.0] * 3, 8):
        vecs[i] = v
        i += 1
    # lone outlier direction: noise
    vecs[i] = [0.5] * 8
    got = assert_parity(spark, vecs, tau=0.9, min_pts=4)
    clusters = {c for c, _ in got.values()}
    assert len(clusters) == 2
    # blob memberships are disjoint and aligned with construction
    c0 = got[0][0]
    assert all(got[j][0] == c0 for j in range(8) if j in got)
    assert 16 not in got  # the outlier is noise


def test_random_parity(spark):
    rng = random.Random(7)
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(6)] for i in range(40)
    }
    assert_parity(spark, vecs, tau=0.5, min_pts=3)
    assert_parity(spark, vecs, tau=0.7, min_pts=2)


def test_min_pts_one_everything_core(spark):
    vecs = {i: [float(i + 1), 0.0] for i in range(4)}
    got = assert_parity(spark, vecs, tau=0.99, min_pts=1)
    assert all(role == "core" for _, role in got.values())
    # all colinear vectors: cosine 1 -> one cluster, min id 0
    assert {c for c, _ in got.values()} == {0}


def test_validation(spark):
    with pytest.raises(ValueError):
        dbscan(spark, emb_df(spark, {}), min_pts=0)


def test_dbscan_lsh_pairs_two_blobs(spark):
    """The pairs= scale path with LSH candidates reproduces the brute
    path's core/noise sets (and full cluster assignment) on the two-blobs
    fixture — generous tables give the within-blob pairs full recall."""
    from connected_components_3d_spark.operators.similarity import (
        lsh_cosine_pairs,
    )

    rng = random.Random(42)
    vecs = {}
    i = 0
    for v in blob(rng, [1.0] + [0.0] * 7, 8):
        vecs[i] = v
        i += 1
    for v in blob(rng, [0.0] * 4 + [1.0] + [0.0] * 3, 8):
        vecs[i] = v
        i += 1
    vecs[i] = [0.5] * 8  # noise outlier
    emb = emb_df(spark, vecs)
    brute = {
        r["id"]: (r["cluster"], r["role"])
        for r in dbscan(spark, emb, tau=0.9, min_pts=4).collect()
    }
    cand = lsh_cosine_pairs(emb, num_planes=2, num_tables=8)
    got = {
        r["id"]: (r["cluster"], r["role"])
        for r in dbscan(spark, emb, tau=0.9, min_pts=4, pairs=cand).collect()
    }
    assert got == brute
    assert 16 not in got  # outlier still noise on the LSH path


def test_dbscan_brute_guard(spark):
    """Above brute_max_rows without pairs= the quadratic default refuses;
    an explicit pairs= (or a raised threshold) still runs."""
    from connected_components_3d_spark.operators.similarity import (
        cosine_pairs,
    )

    vecs = {i: [float(i + 1), 1.0] for i in range(12)}
    emb = emb_df(spark, vecs)
    with pytest.raises(ValueError, match="brute_max_rows"):
        dbscan(spark, emb, tau=0.5, min_pts=2, brute_max_rows=10)
    ok = dbscan(
        spark, emb, tau=0.5, min_pts=2, brute_max_rows=10,
        pairs=cosine_pairs(emb),
    )
    assert ok.count() > 0
    ok2 = dbscan(spark, emb, tau=0.5, min_pts=2, brute_max_rows=1000)
    assert ok2.count() == ok.count()
