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


@dataclass
class ExactDiameterResult:
    diameter: int  # exact when exact=True, else the best LOWER bound
    upper_bound: int
    exact: bool
    num_bfs: int  # total BFS fixpoints run (incl. the double sweep's two)
    witness: tuple[int, int] | None  # endpoints realizing `diameter`


def diameter_exact(
    spark: SparkSession,
    edges: DataFrame,
    *,
    start: int | None = None,
    max_bfs: int = 64,
    max_levels: int = 100,
) -> ExactDiameterResult:
    """Exact diameter via iFUB (Crescenzi–Grossi–Habib–Lanzi–Marino
    2013) seeded by the double sweep: vertices are processed in
    DECREASING level of the second sweep's BFS tree; a vertex at level i
    can only witness eccentricity ≤ 2i (both endpoints route through the
    root), so once the best eccentricity found (lb) reaches 2·(current
    level), lb IS the diameter. On web/social graphs the loop typically
    terminates after a handful of BFS runs — that's the operator's whole
    point: exact diameter for a few BFS fixpoints, not V of them.

    Each candidate BFS is one bfs_distances fixpoint (driver loop over
    SCALAR candidates only — the candidate list at one level, never
    vertex data). ``max_bfs`` bounds the worst case; if exhausted the
    result carries exact=False with the standing lower/upper bounds.
    Same per-component scope as diameter_double_sweep."""
    ds = diameter_double_sweep(
        spark, edges, start=start, max_levels=max_levels
    )
    from .bfs import bfs_distances

    seed2 = spark.createDataFrame([(ds.v,)], "vertex long")
    b2 = bfs_distances(spark, edges, seed2, direction="both",
                       max_levels=max_levels)
    levels = b2.distances.persist()
    lb = ds.lower_bound
    witness = (ds.v, ds.w)
    num_bfs = 2
    max_level = int(
        levels.agg(F.max("dist").alias("m")).collect()[0]["m"] or 0
    )
    exact = False
    ub = 2 * max_level
    for lvl in range(max_level, 0, -1):
        if lb >= 2 * lvl:
            ub = lb
            exact = True
            break
        cand = [
            int(r["vertex"])
            for r in levels.where(F.col("dist") == lvl)
            .orderBy("vertex")
            # never pull more ids than BFS budget remains for — bounds the
            # driver list on fat levels (the cap ends the run regardless)
            .limit(max(max_bfs - num_bfs + 1, 1))
            .collect()
        ]
        for u in cand:
            if num_bfs >= max_bfs:
                levels.unpersist()
                return ExactDiameterResult(lb, 2 * lvl, False, num_bfs,
                                           witness)
            bu = bfs_distances(
                spark,
                edges,
                spark.createDataFrame([(u,)], "vertex long"),
                direction="both",
                max_levels=max_levels,
            )
            far, ecc_u = _farthest(bu.distances)
            num_bfs += 1
            if ecc_u > lb:
                lb = ecc_u
                witness = (u, far)
        ub = 2 * (lvl - 1) if lvl > 1 else lb
    else:
        exact = True
        ub = lb
    if lb >= ub:
        exact = True
        ub = lb
    levels.unpersist()
    return ExactDiameterResult(lb, ub, exact, num_bfs, witness)


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
