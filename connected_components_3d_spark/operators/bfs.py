"""Multi-source BFS: shortest hop distance from a seed set, with the
nearest seed recorded per vertex — the workhorse behind crawl-frontier
analysis ("how far is every page from the seed list"), link-distance
features, and the IN/OUT sweeps the bowtie decomposition already uses
internally (operators/bowtie.py). This module makes the primitive a
first-class, gated operator.

Recurrence (textbook frontier BFS, deterministic provenance):

    state_0  = {(s, dist=0, root=s) : s ∈ seeds}
    level r: cand = frontier_{r-1} ⋈ edges → (nbr, r, root)
             settle each still-unreached nbr at dist=r with
             root = MIN root among its level-r candidates
    fixpoint when a level settles nothing.

Distances are the unique shortest-hop values; roots are deterministic by
induction (min parent root at the first-reaching level), so the full
(vertex, dist, root) relation is hash-comparable — the driver gate replays
it as a fixed-round chained CTE in DuckDB (`bfs_copart`; extra rounds past
the fixpoint are no-ops).

Scale shape: per level exactly one frontier×edges join (AQE flips it to
broadcast as the frontier shrinks; the full-V state side never re-sorts
the persisted edge cache) + one frontier-sized min agg + one V-sized
left-join to fold settles into the state — the same cost envelope as one
CC superstep (operators/cc.py), with lineage truncated per level.
Unreached vertices are omitted from the output (their absence is as
deterministic as a NULL row and keeps the result frontier-sized on
sparse reachability).

Output: ``(vertex:long, dist:long, root:long)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import symmetrize


@dataclass
class BFSResult:
    distances: DataFrame  # (vertex:long, dist:long, root:long)
    num_levels: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def bfs_distances(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    *,
    direction: str = "out",
    max_levels: int = 100,
) -> BFSResult:
    """Hop distance + nearest seed (min-root tiebreak) from ``seeds``
    (a (vertex) DataFrame) along ``direction`` ∈ {'out','in','both'}.

    Runs to the reachability fixpoint unless ``max_levels`` stops it first
    (converged=False then — the settled prefix is still exact)."""
    if direction == "out":
        e = edges.select("src", "dst")
    elif direction == "in":
        e = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction == "both":
        e = symmetrize(edges)
    else:
        raise ValueError(f"bfs_distances: bad direction {direction!r}")
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        e.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(p, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    e.count()

    state = _truncate(
        seeds.select(F.col("vertex").cast("long").alias("vertex"))
        .distinct()
        .select(
            "vertex",
            F.lit(0).cast("long").alias("dist"),
            F.col("vertex").alias("root"),
        )
    )
    frontier = state
    metrics: list[dict] = []
    converged = False
    levels = 0
    for lvl in range(1, max_levels + 1):
        cand = (
            e.join(frontier.withColumnRenamed("vertex", "src"), "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.min("root").alias("root"))
        )
        new = cand.join(state.select("vertex"), "vertex", "left_anti").select(
            "vertex", F.lit(lvl).cast("long").alias("dist"), "root"
        )
        new = _truncate(new)
        n_new = new.count()
        metrics.append({"level": lvl, "settled": n_new})
        if n_new == 0:
            converged = True
            break
        levels = lvl
        state = _truncate(state.unionByName(new))
        frontier = new
    e.unpersist()
    return BFSResult(state, levels, converged, metrics)
