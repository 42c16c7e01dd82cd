"""Landmark (pivot) distance sketches — the standard way to answer
point-to-point distance queries on a web-scale graph without running a BFS
per query (Potamias et al. CIKM 2009 "Fast shortest path distance
estimation in large networks"; the ADO/pivot scheme behind six-degrees
studies on billion-edge graphs): precompute exact hop distances from a
small landmark set L to every vertex, then sandwich any d(u,v) by

    max_l |d(u,l) − d(v,l)|   ≤   d(u,v)   ≤   min_l d(u,l) + d(l,v)

(both sides of the triangle inequality; exact when a landmark lies on a
shortest u–v path).

Contract:

- ``landmark_distances`` = per-(vertex, landmark) exact hop distance along
  ``direction`` ∈ {'out','in','both'} ('both' symmetrizes — the estimator
  bounds REQUIRE the undirected metric); unreachable pairs are absent;
- ``estimate_distances`` joins two vertex columns against the sketch and
  emits (src, dst, lower, upper, n_common) over landmarks common to both
  endpoints; pairs sharing no landmark are absent (different components —
  no finite estimate exists).

Scale shape: one frontier loop over ALL landmarks at once — state is
(vertex, landmark, dist), so a superstep shuffles |frontier|·|L| rows keyed
by vertex (the multi-source trick: |L| BFS runs for the price of one loop,
the frontier join reuses the same sorted persisted edge table every
round); settled-set anti-join keeps the frontier monotone shrinking;
per-round persist + count truncates lineage (the cc.py superstep
discipline). The estimator is two sketch joins keyed on the query
endpoints + one groupBy — no graph traversal at query time.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class LandmarkResult:
    distances: DataFrame  # (vertex: long, landmark: long, dist: long)
    rounds: int
    converged: bool


def landmark_distances(
    spark: SparkSession,
    edges: DataFrame,
    landmarks: list[int],
    *,
    direction: str = "both",
    max_radius: int = 100,
) -> LandmarkResult:
    if not landmarks:
        raise ValueError("landmark_distances: need at least one landmark")
    if max_radius < 0:
        raise ValueError(f"landmark_distances: bad max_radius {max_radius}")
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    if direction == "in":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction == "both":
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    elif direction != "out":
        raise ValueError(f"landmark_distances: bad direction {direction!r}")
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        e.where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(p, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    e.count()

    lm = spark.createDataFrame(
        [(int(x),) for x in sorted(set(landmarks))], "landmark long"
    )
    # localCheckpoint per round: the settled set's plan otherwise embeds
    # itself twice per superstep (once in the anti-join, once in the
    # union) — exponential logical-plan growth (the bfs.py lesson).
    settled = lm.select(
        F.col("landmark").alias("vertex"),
        "landmark",
        F.lit(0).cast("long").alias("dist"),
    ).localCheckpoint(eager=True)
    frontier = settled
    rounds, converged = 0, False
    while rounds < max_radius:
        nxt = (
            frontier.join(e, frontier.vertex == e.src)
            .groupBy(F.col("dst").alias("vertex"), F.col("landmark"))
            .agg((F.min("dist") + 1).alias("dist"))
            .join(settled, ["vertex", "landmark"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            converged = True
            break
        rounds += 1
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    e.unpersist()
    return LandmarkResult(
        distances=settled, rounds=rounds, converged=converged
    )


def estimate_distances(
    sketch: DataFrame, pairs: DataFrame
) -> DataFrame:
    """(src, dst, lower, upper, n_common) triangle-inequality sandwich for
    each (src, dst) query pair, over landmarks reaching both endpoints."""
    a = sketch.select(
        F.col("vertex").alias("src"),
        "landmark",
        F.col("dist").alias("da"),
    )
    b = sketch.select(
        F.col("vertex").alias("dst"),
        "landmark",
        F.col("dist").alias("db"),
    )
    return (
        pairs.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .join(a, "src")
        .join(b, ["dst", "landmark"])
        .groupBy("src", "dst")
        .agg(
            F.max(F.abs(F.col("da") - F.col("db"))).alias("lower"),
            F.min(F.col("da") + F.col("db")).alias("upper"),
            F.count("*").alias("n_common"),
        )
    )
