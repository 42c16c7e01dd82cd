"""k-truss: the maximal subgraph in which every edge participates in at
least k−2 triangles (Cohen 2008) — the edge-strength analogue of the
vertex-strength k-core (operators/kcore.py), and the standard community-
scaffold extractor on link graphs (a k-truss is always a subgraph of the
(k−1)-core, but much denser).

Distributed shape (iterative support peeling, the textbook BSP algorithm):

  e_0 = canonical undirected simple edges
  round i: support_i = per-edge triangle count over e_{i-1}
           (degree-oriented wedge join, operators/triangles.py — the
           O(E^1.5)-work hub-safe plan)
           e_i = {edges with support_i ≥ k−2}
  fixpoint when no edge is dropped.

Each round is one full triangle enumeration over the (monotonically
shrinking) edge table; at web scale the first round removes the tail mass
(most edges have zero/low support) and later rounds run on a fast-shrinking
dense remainder. Incremental-decrement algorithms save re-enumeration but
need per-edge mutable state; the recompute-per-round shape keeps every
round a pure dataframe plan (partial+final aggs, no windows) and its round
count is small on heavy-tailed graphs. One scalar action per round.

The converged k-truss is UNIQUE (standard result), so the driver gate
hash-compares the converged Spark output against a chained-CTE DuckDB
replay with a fixed round budget ≥ the fixpoint depth (extra rounds are
no-ops) — `truss_copart`. pytest: networkx ``k_truss`` parity.

Output: surviving edges with their support inside the truss —
``(src:long, dst:long, support:long)``, src<dst; empty (same schema) when
the truss is.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import canonical_undirected
from .triangles import triangles_per_edge


@dataclass
class KTrussResult:
    truss: DataFrame  # (src:long, dst:long, support:long)
    num_rounds: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def k_truss(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    *,
    max_rounds: int = 100,
) -> KTrussResult:
    """Peel ``edges`` (treated as undirected, self-loops/dups dropped) down
    to the k-truss. ``k >= 2``; the 2-truss is the whole simple graph
    (support ≥ 0 vacuously), returned in 0 peel rounds."""
    if k < 2:
        raise ValueError("k_truss: k must be >= 2")
    e = _truncate(canonical_undirected(edges))
    metrics: list[dict] = []
    converged = False
    rounds = 0
    sup = None
    for rounds in range(max_rounds + 1):
        # full support recompute over the current generation; the input is
        # already canonical so the inner canonicalization is a no-op pass
        sup = triangles_per_edge(e)
        row = sup.agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("n_tri") >= k - 2, 1).otherwise(0)).alias(
                "kept"
            ),
        ).collect()[0]
        n_drop = row["n"] - (row["kept"] or 0)
        metrics.append(
            {"round": rounds, "edges": row["n"], "dropped": n_drop}
        )
        if n_drop == 0:
            converged = True
            break
        # truncate each generation: the plan otherwise nests a full
        # triangle enumeration per round
        e = _truncate(
            sup.where(F.col("n_tri") >= k - 2).select("src", "dst")
        )
    out = _truncate(
        sup.where(F.col("n_tri") >= k - 2).select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.col("n_tri").cast("long").alias("support"),
        )
    )
    return KTrussResult(out, rounds, converged, metrics)
