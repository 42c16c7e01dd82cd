"""Diameter lower bound by double sweep — the standard cheap certificate
for "how wide is this graph" (Magnien–Latapy–Habib 2009; the first step
of iFUB): BFS from a deterministic start u, take the farthest vertex v
(the ecc(u) witness), BFS again from v; ecc(v) is a diameter LOWER bound
that is exact on trees and empirically tight on web/social graphs, for
the price of exactly TWO BFS fixpoints — no all-pairs anything.

Determinism: u defaults to the MIN vertex id; every argmax tie breaks to
the smallest vertex; so the whole procedure (and the gate row
`diameter_tree_ring`) replays bit-for-bit in a recursive-CTE oracle.

Scope: the sweep covers u's connected component (the usual contract —
run per component via operators/cc.py labels if the graph is
disconnected; vertices outside u's component are simply absent from the
BFS fixpoint and cannot affect the bound for that component).

Scale shape: two runs of the level-synchronous BFS kernel
(operators/bfs.py — frontier joins against a persisted sorted edge
cache, vertex-sized anti-join settles, scalar-only actions) plus four
scalar argmax probes (orderBy(dist DESC, vertex ASC).limit(1)) — each a
TOP-1 reduction, not a global sort materialization.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class DiameterResult:
    summary: DataFrame  # one row: (u, v, w, ecc_u, ecc_v, lower_bound)
    u: int
    v: int  # farthest from u (ecc(u) witness), BFS-2 start
    w: int  # farthest from v (the bound's far endpoint)
    ecc_u: int
    ecc_v: int
    lower_bound: int  # = ecc_v ≥ ecc_u; diameter ≥ lower_bound


def _farthest(distances: DataFrame) -> tuple[int, int]:
    """(vertex, dist) of the farthest vertex, ties to smallest id."""
    row = (
        distances.orderBy(F.col("dist").desc(), F.col("vertex").asc())
        .limit(1)
        .collect()[0]
    )
    return int(row["vertex"]), int(row["dist"])


def diameter_double_sweep(
    spark: SparkSession,
    edges: DataFrame,
    *,
    start: int | None = None,
    max_levels: int = 100,
) -> DiameterResult:
    """Double-sweep diameter lower bound over the undirected view of
    ``edges``. ``start`` overrides the deterministic min-vertex choice."""
    from .bfs import bfs_distances

    if start is None:
        lo = (
            edges.select(
                F.least(
                    F.col("src").cast("long"), F.col("dst").cast("long")
                ).alias("v")
            )
            .agg(F.min("v").alias("m"))
            .collect()[0]["m"]
        )
        if lo is None:
            raise ValueError("diameter_double_sweep: empty edge table")
        start = int(lo)
    seed = spark.createDataFrame([(start,)], "vertex long")
    b1 = bfs_distances(spark, edges, seed, direction="both",
                       max_levels=max_levels)
    v, ecc_u = _farthest(b1.distances)
    seed2 = spark.createDataFrame([(v,)], "vertex long")
    b2 = bfs_distances(spark, edges, seed2, direction="both",
                       max_levels=max_levels)
    w, ecc_v = _farthest(b2.distances)
    summary = spark.createDataFrame(
        [(start, v, w, ecc_u, ecc_v, ecc_v)],
        "u long, v long, w long, ecc_u long, ecc_v long, lower_bound long",
    )
    return DiameterResult(summary, start, v, w, ecc_u, ecc_v, ecc_v)
