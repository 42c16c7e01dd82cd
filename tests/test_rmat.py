"""R-MAT generator (sources/rmat.py): single-node replay parity,
partitioning invariance (pure map over the id space), hub-skew signature
vs the uniform (a=b=c=d) setting, quadrant-probability sanity, seed
sensitivity, validation."""

from __future__ import annotations

import pytest

from connected_components_3d_spark.sources.rmat import (
    rmat_edges,
    rmat_edges_single_node,
)


def collect_edges(df):
    return sorted(
        (r["edge_id"], r["src"], r["dst"]) for r in df.collect()
    )


def test_single_node_parity_and_partition_invariance(spark):
    exp = rmat_edges_single_node(8, 500)
    got1 = collect_edges(rmat_edges(spark, 8, 500, num_partitions=1))
    got8 = collect_edges(rmat_edges(spark, 8, 500, num_partitions=8))
    assert got1 == exp and got8 == exp


def test_vertex_range_and_count(spark):
    rows = collect_edges(rmat_edges(spark, 6, 300))
    assert len(rows) == 300
    assert all(0 <= s < 64 and 0 <= t < 64 for _, s, t in rows)


def test_hub_skew_vs_uniform():
    """Canonical (0.57,0.19,0.19,0.05) produces a much hotter max degree
    than the uniform quadrant split on the same edge budget."""
    from collections import Counter

    skewed = rmat_edges_single_node(10, 4000)
    uniform = rmat_edges_single_node(
        10, 4000, a=0.25, b=0.25, c=0.25
    )
    mx_s = max(Counter(s for _, s, _ in skewed).values())
    mx_u = max(Counter(s for _, s, _ in uniform).values())
    assert mx_s > 2 * mx_u


def test_quadrant_frequencies_roughly_match():
    """Level-0 src-bit frequency ≈ c + d (the lower-half mass)."""
    edges = rmat_edges_single_node(1, 8000, a=0.57, b=0.19, c=0.19)
    frac_src1 = sum(1 for _, s, _ in edges if s == 1) / len(edges)
    assert abs(frac_src1 - 0.24) < 0.02


def test_seed_changes_edges():
    a = rmat_edges_single_node(8, 100, seed=1)
    b = rmat_edges_single_node(8, 100, seed=2)
    assert a != b


def test_validation(spark):
    with pytest.raises(AssertionError):
        rmat_edges(spark, 0, 10)
    with pytest.raises(AssertionError, match=">= 0"):
        rmat_edges(spark, 8, 10, a=0.9, b=0.2, c=0.2)
