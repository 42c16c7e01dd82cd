"""Motif pattern matching parity and semantics (operators/motif.py)."""

from __future__ import annotations

import random

import pytest

from connected_components_3d_spark.operators.motif import (
    find_motifs,
    find_motifs_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def spark_bindings(spark, pairs, pattern):
    out = find_motifs(edges_df(spark, pairs), pattern)
    return set(tuple(r) for r in out.collect()), out.columns


PATTERNS = [
    "a->b; b->c",
    "a->b; b->a",
    "a->b; a->c",
    "a->b; b->c; c->a",
    "a->b; b->c; !c->a",
    "a->b; b->c; !a->c",
    "a->b; a->c; b->d; c->d",
    "a->a",
    "a->b; !b->b",
]


def test_random_parity_vs_brute_force(spark):
    rng = random.Random(17)
    pairs = list(
        {(rng.randrange(9), rng.randrange(9)) for _ in range(22)}
    )
    for pat in PATTERNS:
        got, _ = spark_bindings(spark, pairs, pat)
        want = find_motifs_single_node(pairs, pat)
        assert got == want, pat


def test_column_order_first_appearance(spark):
    _, cols = spark_bindings(spark, [(1, 2), (2, 3)], "x->y; y->z")
    assert cols == ["x", "y", "z"]


def test_homomorphism_semantics(spark):
    # a and c may bind the same vertex: 1->2->1 matches a->b; b->c
    got, _ = spark_bindings(spark, [(1, 2), (2, 1)], "a->b; b->c")
    assert (1, 2, 1) in got


def test_parallel_edges_do_not_multiply(spark):
    df = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 3)], "src long, dst long"
    )
    out = find_motifs(df, "a->b; b->c")
    assert out.count() == 1


def test_feedforward_vs_cycle(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6)]
    cyc, _ = spark_bindings(spark, pairs, "a->b; b->c; c->a")
    assert cyc == {(1, 2, 3), (2, 3, 1), (3, 1, 2)}
    ff, _ = spark_bindings(spark, pairs, "a->b; b->c; !c->a")
    assert ff == {(4, 5, 6)}


def test_validation():
    with pytest.raises(ValueError, match="disconnected"):
        find_motifs_single_node([(1, 2)], "a->b; c->d")
    with pytest.raises(ValueError, match="bad term"):
        find_motifs_single_node([(1, 2)], "a=>b")
    with pytest.raises(ValueError, match="positive"):
        find_motifs_single_node([(1, 2)], "!a->b")
    with pytest.raises(ValueError, match="not bound"):
        find_motifs_single_node([(1, 2)], "a->b; !a->z")
    with pytest.raises(ValueError, match="empty"):
        find_motifs_single_node([(1, 2)], " ; ")
