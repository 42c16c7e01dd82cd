"""Derived operators R7–R15: statistics, largest_k, dust, region_graph,
contacts, adjacency, each, estimate_provisional_labels."""

from __future__ import annotations

import numpy as np

from connected_components_3d_spark.operators import stats as S
from connected_components_3d_spark.operators.cc import connected_components
from connected_components_3d_spark.operators.grid import (
    grid_components,
    grid_from_array,
    grid_vertex_id,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def comp_df(spark, pairs):
    return connected_components(spark, edges_df(spark, pairs), method="hashmin").components


def test_statistics_on_grid(spark):
    a = np.zeros((4, 3, 2), dtype=np.int64)
    a[0:2, 0, 0] = 1  # component A: 2 voxels
    a[3, 2, 1] = 5  # component B: 1 voxel
    g = grid_from_array(spark, a)
    comp = grid_components(spark, g, (4, 3, 2), 6)
    coords = g.where("value != 0").select(
        grid_vertex_id((4, 3, 2)).alias("vertex"), "x", "y", "z"
    )
    rows = {r["component"]: r for r in S.statistics(comp, coords).collect()}
    assert len(rows) == 2
    big = rows[min(rows)]
    assert big["size"] == 2
    assert (big["x_min"], big["x_max"]) == (0, 1)
    assert abs(big["cx"] - 0.5) < 1e-12
    small = rows[max(rows)]
    assert small["size"] == 1 and small["cx"] == 3.0


def test_largest_k_and_dust(spark):
    pairs = (
        [(i, i + 1) for i in range(0, 9)]  # comp of 10
        + [(100, 101), (101, 102)]  # comp of 3
        + [(200, 201)]  # comp of 2
    )
    comp = comp_df(spark, pairs)
    top = S.largest_k(comp, 2)
    got = {(r["component"], r["size"], r["rk"]) for r in top.collect()}
    assert {c for c, _, _ in got} == {0, 100}
    assert {s for _, s, _ in got} == {10, 3}
    kept = S.dust(comp, threshold=3)
    assert {r["component"] for r in kept.collect()} == {0, 100}
    assert kept.count() == 13


def test_region_graph_and_contacts(spark):
    # two labeled segments touching: labels via vertex→label map
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
    labels = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 20), (5, 30)], "vertex long, label long"
    )
    e = edges_df(spark, pairs)
    rg = sorted(map(tuple, S.region_graph(e, labels).collect()))
    assert rg == [(10, 20), (20, 30)]
    ct = {(r["label_a"], r["label_b"]): r["area"] for r in S.contacts(e, labels).collect()}
    assert ct == {(10, 20): 1, (20, 30): 1}


def test_adjacency_summary(spark):
    e = edges_df(spark, [(1, 2), (1, 3), (3, 1)])
    adj = {r["vertex"]: (list(r["neighbors"]), r["deg"]) for r in
           S.adjacency_summary(e).collect()}
    assert adj[1] == ([2, 3], 2)
    assert adj[2] == ([1], 1)
    assert adj[3] == ([1], 1)


def test_each_component_partitioned_write(spark, tmp_path):
    comp = comp_df(spark, [(1, 2), (10, 11)])
    out = str(tmp_path / "each")
    S.each_component(comp, out)
    import os

    parts = sorted(d for d in os.listdir(out) if d.startswith("component="))
    assert parts == ["component=1", "component=10"]
    only = spark.read.parquet(out + "/component=1")
    assert sorted(r["vertex"] for r in only.collect()) == [1, 2]


def test_estimate_provisional_labels(spark):
    pairs = [(i, i + 1) for i in range(1000)]
    est = S.estimate_provisional_labels(edges_df(spark, pairs))
    assert 900 <= est <= 1100  # ±5% of 1001


def test_adjacency_summary_max_neighbors_cap(spark):
    """Hub guard (VERDICT r1 #7): a high-degree vertex keeps only its
    max_neighbors smallest neighbor ids, deg stays the TRUE degree, and
    low-degree vertices are unaffected (cap ≥ deg → identical to uncapped)."""
    hub = 0
    pairs = [(hub, i) for i in range(1, 501)] + [(900, 901), (901, 902)]
    e = edges_df(spark, pairs)
    capped = {
        r.vertex: (list(r.neighbors), r.deg)
        for r in S.adjacency_summary(e, max_neighbors=10).collect()
    }
    assert capped[hub] == (list(range(1, 11)), 500)
    assert capped[901] == ([900, 902], 2)
    # vertices under the cap match the exact variant
    exact = {
        r.vertex: (list(r.neighbors), r.deg)
        for r in S.adjacency_summary(e).collect()
    }
    for v in (900, 901, 902, 5, 250):
        assert capped[v] == exact[v]


def test_adjacency_capped_plan_has_no_window(spark):
    """The capped path must be a decomposable two-stage bottom-k (VERDICT r2
    #4): no Window operator anywhere in the plan — a per-src window would
    concentrate a hub's whole edge list into one sorted partition — and the
    result on a Zipf-ish hub stays exact."""
    from connected_components_3d_spark.plans import explain_str

    hub = 0
    pairs = [(hub, i) for i in range(1, 2001)] + [(i, i + 1) for i in range(5000, 5050)]
    e = edges_df(spark, pairs)
    capped = S.adjacency_summary(e, max_neighbors=5)
    plan = explain_str(capped)
    assert "Window" not in plan, plan
    got = {r.vertex: (list(r.neighbors), r.deg) for r in capped.collect()}
    assert got[hub] == ([1, 2, 3, 4, 5], 2000)
    assert got[5025] == ([5024, 5026], 2)
