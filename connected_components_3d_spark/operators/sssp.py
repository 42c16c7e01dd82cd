"""Weighted multi-source shortest paths (SSSP) — Bellman–Ford-style
frontier relaxation over a weighted edge table: the weighted generalization
of operators/bfs.py (hop metric) for link graphs whose edges carry costs
(crawl latency, click distance, toll weights, negative-log transition
probabilities).

Recurrence (textbook frontier Bellman–Ford; non-negative integer or
decimal weights — no negative cycles to guard):

    dist_0(s) = 0 for s ∈ seeds
    round r:  cand(v) = MIN over in-edges (u, v, w) with u in frontier_{r-1}
                        of dist(u) + w
              improved = {v : cand(v) < dist(v) or v unseen}
              frontier_r = improved
    fixpoint when a round improves nothing.

With non-negative weights every vertex settles within |V| rounds and each
round is one frontier×edges join + a vertex-keyed MIN + a V-sized
merge-join — the CC-superstep cost envelope. Unlike Dijkstra there is no
global priority queue (nothing to serialize through the driver); the
price is re-relaxation of vertices whose distance later improves, the
standard trade every Pregel/GraphX SSSP makes.

Distances are unique fixpoint values, so the (vertex, dist) relation is
hash-comparable: with integer weights the driver gate replays it as a
fixed-round chained CTE in DuckDB (`sssp_tree` — rounds past the fixpoint
are no-ops, so the pinned round count only needs to be ≥ the measured
depth).

Output: ``(vertex:long, dist:long)`` — integer-weight contract for the
gate; a float-weight variant only changes the cast.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class SSSPResult:
    distances: DataFrame  # (vertex:long, dist:long)
    num_rounds: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def shortest_paths(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    *,
    weight_col: str = "weight",
    max_rounds: int = 200,
) -> SSSPResult:
    """Weighted shortest distance from the seed set (a ``vertex`` column)
    along directed edges ``(src, dst, weight)``; weights must be
    non-negative (asserted by a one-off scan). Runs to the fixpoint unless
    ``max_rounds`` stops it first (converged=False; settled distances are
    then upper bounds, exact for vertices whose final distance uses ≤
    max_rounds hops)."""
    e = (
        edges.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col(weight_col).cast("long").alias("w"),
        )
        # parallel edges: only the cheapest can ever matter
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .where(F.col("src") != F.col("dst"))
    )
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = e.repartition(p, "src").sortWithinPartitions("src").persist()
    neg = e.where(F.col("w") < 0).limit(1).count()
    if neg:
        e.unpersist()
        raise ValueError(
            "shortest_paths requires non-negative weights (Bellman–Ford"
            " frontier relaxation has no negative-cycle guard here)"
        )
    state = _truncate(
        seeds.select(F.col("vertex").cast("long"))
        .distinct()
        .select("vertex", F.lit(0).cast("long").alias("dist"))
    )
    frontier = state
    metrics: list[dict] = []
    converged = False
    rounds = 0
    for r in range(1, max_rounds + 1):
        cand = (
            e.join(
                frontier.select(
                    F.col("vertex").alias("src"), F.col("dist").alias("du")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.min(F.col("du") + F.col("w")).alias("nd"))
        )
        improved = (
            cand.join(state, "vertex", "left")
            .where(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("vertex", F.col("nd").alias("dist"))
        )
        improved = _truncate(improved)
        n_imp = improved.count()
        metrics.append({"round": r, "improved": n_imp})
        if n_imp == 0:
            converged = True
            break
        rounds = r
        state = _truncate(
            state.join(improved.select("vertex"), "vertex", "left_anti")
            .unionByName(improved)
        )
        frontier = improved
    e.unpersist()
    return SSSPResult(state, rounds, converged, metrics)
