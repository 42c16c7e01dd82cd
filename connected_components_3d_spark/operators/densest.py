"""Densest-subgraph extraction via parallel peeling — Bahmani, Kumar,
Vassilvitskii (VLDB 2012), the MapReduce-scale 2(1+ε)-approximation of
Goldberg's densest subgraph: repeatedly delete every vertex whose degree is
at most 2(1+ε)·ρ(S) (ρ = |E(S)|/|S|, the average-degree/2 density) and
return the densest iterate seen. Dense subgraphs of web link graphs are
the canonical link-farm / community-core signal — the paper's own use
case.

Exactness contract (what makes this gate-able): with ε = 1/2 the removal
test  deg_S(v) ≤ 2(1+ε)·|E|/|S|  is  deg·|S| ≤ 3·|E| — pure integer
arithmetic; and the best-iterate comparison ρ_i > ρ_best is cross-
multiplied (nE_i·nV_best > nE_best·nV_i), ties keeping the EARLIEST
round. No floats anywhere ⇒ the per-round vertex sets, the chosen round,
and the output are bit-identical across engines, and the driver gate
replays the whole peel as a fixed-round chained CTE in DuckDB
(`densest_copart`; rounds past S = ∅ are no-ops). The approximation
guarantee (density ≥ OPT/3 for ε=1/2) is the paper's Theorem 1.

Scale shape (the kcore.py peel envelope): per round one degree aggregation
over the shrinking induced edge table + one scalar (nV, nE) action + two
semi-joins to drop removed endpoints; O(log_{1+ε} V) rounds total — the
paper's bound — each edge-sized with lineage truncated. No windows, no
driver-side data collects.

Output: the vertex set of the densest iterate plus its exact density as a
ratio (num_edges, num_vertices kept as integers in the result object).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class DensestResult:
    vertices: DataFrame  # (vertex:long) — the densest iterate's vertex set
    num_edges: int  # |E(S_best)|
    num_vertices: int  # |S_best|
    num_rounds: int
    metrics: list[dict] = field(default_factory=list)

    @property
    def density(self) -> float:
        return self.num_edges / self.num_vertices if self.num_vertices else 0.0


def densest_subgraph(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_rounds: int = 100,
) -> DensestResult:
    """Densest subgraph (ε = 1/2 ⇒ 3-approximation, integer-exact peel) of
    the UNDIRECTED simple graph given by ``edges`` (direction, duplicates,
    self-loops ignored)."""
    e = (
        edges.select(
            F.least(F.col("src").cast("long"), F.col("dst").cast("long")).alias(
                "u"
            ),
            F.greatest(
                F.col("src").cast("long"), F.col("dst").cast("long")
            ).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    best_rows: DataFrame | None = None
    best_ne = 0
    best_nv = 0
    rounds = 0
    metrics: list[dict] = []
    live = e
    while rounds < max_rounds:
        t0 = time.time()
        deg = (
            live.select(F.col("u").alias("vertex"))
            .unionByName(live.select(F.col("v").alias("vertex")))
            .groupBy("vertex")
            .agg(F.count("*").alias("deg"))
            .localCheckpoint(eager=True)
        )
        stats = deg.agg(
            F.count("*").alias("nv"), F.sum("deg").alias("sdeg")
        ).collect()[0]
        nv = stats["nv"] or 0
        ne = (stats["sdeg"] or 0) // 2
        if nv == 0:
            break
        rounds += 1
        # densest-so-far: exact ratio compare, earliest round wins ties
        if best_rows is None or ne * best_nv > best_ne * nv:
            best_rows, best_ne, best_nv = deg.select("vertex"), ne, nv
        # ε = 1/2 peel: remove v iff deg(v) * nV <= 3 * nE (integer-exact)
        keep = deg.where(
            F.col("deg") * F.lit(int(nv)) > F.lit(3 * int(ne))
        ).select("vertex")
        live = (
            live.join(keep.withColumnRenamed("vertex", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("vertex", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        metrics.append(
            {
                "round": rounds,
                "nv": int(nv),
                "ne": int(ne),
                "wall_s": round(time.time() - t0, 4),
            }
        )
    if best_rows is None:
        best_rows = e.select(F.col("u").alias("vertex")).limit(0)
    return DensestResult(best_rows, int(best_ne), int(best_nv), rounds, metrics)


def densest_subgraph_single_node(
    pairs: list[tuple[int, int]],
) -> tuple[set[int], int, int]:
    """Single-node reference (identical integer contract) — returns
    (vertex set, |E|, |V|) of the densest iterate."""
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    best: tuple[set[int], int, int] = (set(), 0, 0)
    live = set(es)
    while live:
        deg: dict[int, int] = {}
        for u, v in live:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        nv, ne = len(deg), len(live)
        if best[2] == 0 or ne * best[2] > best[1] * nv:
            best = (set(deg), ne, nv)
        keep = {x for x, d in deg.items() if d * nv > 3 * ne}
        live = {(u, v) for u, v in live if u in keep and v in keep}
    return best
