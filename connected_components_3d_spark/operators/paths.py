"""Shortest-path EXTRACTION — distances alone (operators/bfs.py /
operators/sssp.py) answer "how far"; this answers the debugging/link-audit
question "show me an actual shortest path from a to b" (why are these two
pages connected; through which hub does this link equity flow).

Contract (deterministic — the DuckDB gate oracle replays it with a
recursive-CTE BFS + pred-following): over the DIRECTED edge table, BFS
distances d(·) from ``source``; if ``target`` is unreached, found=False.
Otherwise every vertex v ≠ source with finite d gets ONE canonical
predecessor

    pred(v) = min{ u : edge u→v and d(u) + 1 = d(v) }

(the smallest-id in-neighbor on any shortest path — total and unique), and
THE canonical shortest path is target ← pred(target) ← … ← source. The
path is therefore the lexicographically-least shortest path read from the
target side. Output rows (pos, vertex), pos 0 = source.

Scale shape: the BFS is the O-standard frontier fixpoint (edge-sized join
+ vertex-sized min per round, localCheckpointed). The pred table is ONE
edge-sized join of d against itself over the edges (groupBy argmin —
min(u) suffices since the d(u)+1 = d(v) filter already pins the
distance). Reconstruction then walks d(target) pred pointers — one tiny
broadcast-filter lookup per hop, so extraction costs O(path length) jobs
of O(1) rows each; web-graph shortest paths are diameter-bounded (~20),
and ``max_path_len`` guards pathological chains. The demanding parts
(BFS, pred) stay fully distributed.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class PathResult:
    found: bool
    dist: int | None  # hops, None when unreached
    vertices: list[int]  # [source, ..., target]; [] when unreached
    path: DataFrame  # (pos:int, vertex:long); empty when unreached
    metrics: list[dict] = field(default_factory=list)


def extract_path(
    spark: SparkSession,
    edges: DataFrame,
    source: int,
    target: int,
    *,
    max_rounds: int = 200,
    max_path_len: int = 10_000,
) -> PathResult:
    """The canonical (lexicographically-least from the target side)
    shortest directed path source → target — see module docstring."""
    from .bfs import bfs_distances

    t0 = time.time()
    seeds = spark.createDataFrame([(int(source),)], "vertex long")
    res = bfs_distances(spark, edges, seeds, max_levels=max_rounds)
    d = res.distances.persist()
    trow = d.where(F.col("vertex") == int(target)).collect()
    metrics = [{"stage": "bfs", "wall_s": round(time.time() - t0, 4)}]
    empty = spark.createDataFrame([], "pos int, vertex long")
    if not trow:
        d.unpersist()
        return PathResult(False, None, [], empty, metrics)
    dist = int(trow[0]["dist"])
    assert dist <= max_path_len, "path longer than max_path_len"
    t1 = time.time()
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    pred = (
        e.join(
            d.select(F.col("vertex").alias("src"), F.col("dist").alias("du")),
            "src",
        )
        .join(
            d.select(F.col("vertex").alias("dst"), F.col("dist").alias("dv")),
            "dst",
        )
        .where(F.col("du") + 1 == F.col("dv"))
        .groupBy(F.col("dst").alias("vertex"))
        .agg(F.min("src").alias("pred"))
        .persist()
    )
    pred.count()
    metrics.append({"stage": "pred", "wall_s": round(time.time() - t1, 4)})
    t2 = time.time()
    chain = [int(target)]
    cur = int(target)
    for _ in range(dist):
        cur = int(
            pred.where(F.col("vertex") == cur).collect()[0]["pred"]
        )
        chain.append(cur)
    assert cur == int(source)  # BFS invariant: d(target) pred hops reach it
    d.unpersist()
    pred.unpersist()
    metrics.append({"stage": "walk", "wall_s": round(time.time() - t2, 4)})
    vertices = list(reversed(chain))
    path = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vertices)], "pos int, vertex long"
    )
    return PathResult(True, dist, vertices, path, metrics)
