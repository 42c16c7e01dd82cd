"""cc3d-parity grid fixtures (FIXTURES.md §3): exact equivalence-class match
under canonical relabeling for 6/18/26-connectivity multilabel labeling,
binary mode, continuous delta mode, periodic boundaries [BASELINE.json:2,6]."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest

from connected_components_3d_spark.operators.grid import (
    _STENCILS,
    grid_components,
    grid_from_array,
    stencil_edges,
)


def classes_of(rows) -> set[frozenset]:
    by_label: dict[int, set[int]] = {}
    for r in rows:
        by_label.setdefault(r["component"], set()).add(r["vertex"])
    return {frozenset(s) for s in by_label.values()}


def nx_grid_classes(arr, connectivity, *, delta=0.0, binary=False, periodic=False):
    """Independent single-node oracle: build the stencil graph in networkx."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    X, Y, Z = arr.shape
    offs = _STENCILS[connectivity]
    g = nx.Graph()
    vid = lambda x, y, z: x + X * (y + Y * z)
    for x in range(X):
        for y in range(Y):
            for z in range(Z):
                if arr[x, y, z] == 0:
                    continue
                g.add_node(vid(x, y, z))
                for dx, dy, dz in offs + [(-a, -b, -c) for a, b, c in offs]:
                    nx_, ny_, nz_ = x + dx, y + dy, z + dz
                    if periodic:
                        nx_, ny_, nz_ = nx_ % X, ny_ % Y, nz_ % Z
                    if not (0 <= nx_ < X and 0 <= ny_ < Y and 0 <= nz_ < Z):
                        continue
                    v2 = arr[nx_, ny_, nz_]
                    if v2 == 0:
                        continue
                    ok = (
                        abs(float(arr[x, y, z]) - float(v2)) <= delta
                        if delta > 0
                        else (True if binary else arr[x, y, z] == v2)
                    )
                    if ok:
                        g.add_edge(vid(x, y, z), vid(nx_, ny_, nz_))
    return {frozenset(c) for c in nx.connected_components(g)}


def run_grid(spark, arr, connectivity, **kw):
    df = grid_from_array(spark, arr)
    shape = arr.shape if arr.ndim == 3 else (*arr.shape, 1)
    rows = grid_components(spark, df, shape, connectivity, **kw).collect()
    return classes_of(rows)


def test_g1_cross(spark):
    a = np.zeros((3, 3, 3), dtype=np.int64)
    a[1, 1, 1] = 1
    for d in [(0, 1, 1), (2, 1, 1), (1, 0, 1), (1, 2, 1), (1, 1, 0), (1, 1, 2)]:
        a[d] = 1
    for conn in (6, 18, 26):
        got = run_grid(spark, a, conn)
        assert len(got) == 1, f"conn={conn}"


def test_g2_diag_face_separates_connectivity(spark):
    a = np.zeros((2, 2, 1), dtype=np.int64)
    a[0, 0, 0] = 1
    a[1, 1, 0] = 1
    assert len(run_grid(spark, a, 6)) == 2
    assert len(run_grid(spark, a, 18)) == 1
    assert len(run_grid(spark, a, 26)) == 1
    # 2D stencils too
    assert len(run_grid(spark, a[:, :, 0], 4)) == 2
    assert len(run_grid(spark, a[:, :, 0], 8)) == 1


def test_g3_corner_separates_18_vs_26(spark):
    a = np.zeros((2, 2, 2), dtype=np.int64)
    a[0, 0, 0] = 1
    a[1, 1, 1] = 1
    assert len(run_grid(spark, a, 6)) == 2
    assert len(run_grid(spark, a, 18)) == 2
    assert len(run_grid(spark, a, 26)) == 1


def test_g4_multilabel_never_merges(spark):
    a = np.array([[[1]], [[1]], [[2]], [[2]]], dtype=np.int64)  # 4x1x1
    got = run_grid(spark, a, 6)
    assert got == {frozenset({0, 1}), frozenset({2, 3})}
    # binary mode DOES merge them (R5)
    got_bin = run_grid(spark, a, 6, binary_image=True)
    assert got_bin == {frozenset({0, 1, 2, 3})}


def test_g5_checkerboard(spark):
    x, y, z = np.indices((4, 4, 4))
    a = (1 + ((x + y + z) % 2)).astype(np.int64)
    assert len(run_grid(spark, a, 6)) == 64  # every face nbr flips parity
    assert len(run_grid(spark, a, 26)) == 2  # one per parity class
    assert run_grid(spark, a, 18) == nx_grid_classes(a, 18)


def test_g6_periodic_boundary(spark):
    a = np.array([[[1]], [[0]], [[0]], [[0]], [[1]]], dtype=np.int64)  # 5x1x1
    assert len(run_grid(spark, a, 6)) == 2
    assert len(run_grid(spark, a, 6, periodic_boundary=True)) == 1


@pytest.mark.parametrize("conn", [6, 18, 26])
def test_g7_random_vs_networkx(spark, conn):
    rng = np.random.RandomState(42)
    a = rng.randint(0, 4, size=(12, 12, 12)).astype(np.int64)
    a[rng.rand(12, 12, 12) < 0.5] = 0
    assert run_grid(spark, a, conn) == nx_grid_classes(a, conn)


def test_g7_delta_continuous(spark):
    rng = np.random.RandomState(42)
    a = (rng.rand(8, 8, 8) * 0.5).astype(np.float64)
    a[rng.rand(8, 8, 8) < 0.4] = 0.0
    got = run_grid(spark, a, 6, delta=0.1)
    assert got == nx_grid_classes(a, 6, delta=0.1)


def test_g8_dense_equals_relational(spark):
    """The dense slab kernel and the relational stencil join are independent
    in-engine implementations — equivalence classes must match exactly on a
    fixture that exercises multilabel + background + all 3 axes."""
    rng = np.random.RandomState(7)
    a = rng.randint(0, 3, size=(9, 7, 5)).astype(np.int64)
    a[rng.rand(9, 7, 5) < 0.4] = 0
    df = grid_from_array(spark, a)
    for conn in (6, 26):
        dense = classes_of(
            grid_components(spark, df, a.shape, conn, impl="dense").collect()
        )
        rel = classes_of(
            grid_components(spark, df, a.shape, conn, impl="relational").collect()
        )
        assert dense == rel, f"conn={conn}"


def test_g9_slab_count_invariance(spark):
    """Labels are a pure function of the grid, not of the slab partitioning:
    any slab count (1 = single dense block, many = thin slabs + halo chains)
    must produce identical equivalence classes — the halo construction is
    exactly what this pins."""
    rng = np.random.RandomState(3)
    a = rng.randint(0, 4, size=(11, 6, 6)).astype(np.int64)
    a[rng.rand(11, 6, 6) < 0.5] = 0
    df = grid_from_array(spark, a)
    expected = nx_grid_classes(a, 18)
    for ns in (1, 2, 5, 11):
        got = classes_of(
            grid_components(spark, df, a.shape, 18, num_slabs=ns).collect()
        )
        assert got == expected, f"num_slabs={ns}"


def test_g10_periodic_dense_all_modes(spark):
    """Periodic wrap through the dense kernel: slab-axis wrap via the
    duplicated halo plane, in-slab axes via roll — vs the networkx oracle,
    across slab counts (incl. the single-slab self-halo case)."""
    rng = np.random.RandomState(5)
    a = rng.randint(0, 3, size=(8, 4, 4)).astype(np.int64)
    a[rng.rand(8, 4, 4) < 0.4] = 0
    df = grid_from_array(spark, a)
    expected = nx_grid_classes(a, 6, periodic=True)
    for ns in (1, 4):
        got = classes_of(
            grid_components(
                spark, df, a.shape, 6, periodic_boundary=True, num_slabs=ns
            ).collect()
        )
        assert got == expected, f"num_slabs={ns}"


def test_return_n_consistency(spark):
    """R3: N == number of equivalence classes."""
    rng = np.random.RandomState(1)
    a = rng.randint(0, 3, size=(6, 6, 6)).astype(np.int64)
    df = grid_from_array(spark, a)
    comp = grid_components(spark, df, (6, 6, 6), 26)
    rows = comp.collect()
    assert len(classes_of(rows)) == comp.select("component").distinct().count()


def test_g11_tagged_stars_fast_path_equals_generic(spark):
    """cc.components_from_stars has two stitches: the generic full groupBy
    and the owner/face fast path (face rows only + broadcast label join).
    The dense kernel's tagged output must produce identical classes through
    BOTH — dropping the tag columns forces the generic path."""
    from connected_components_3d_spark.operators.cc import components_from_stars
    from connected_components_3d_spark.operators.grid import dense_grid_stars

    rng = np.random.RandomState(11)
    a = rng.randint(0, 3, size=(13, 5, 4)).astype(np.int64)
    a[rng.rand(13, 5, 4) < 0.45] = 0
    df = grid_from_array(spark, a)
    stars = dense_grid_stars(spark, df, a.shape, 26, num_slabs=4).persist()
    fast = classes_of(components_from_stars(spark, stars).collect())
    generic = classes_of(
        components_from_stars(spark, stars.select("vertex", "root")).collect()
    )
    stars.unpersist()
    assert fast == generic == nx_grid_classes(a, 26)
