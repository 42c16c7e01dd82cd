"""Neighborhood function: |ball(v, r)| — how many vertices lie within ≤ r
hops of v along out-edges (self included).

The per-vertex neighborhood function is the primitive behind effective
diameter / average-distance estimation on web graphs ("four degrees of
separation" analyses). Two implementations share one recurrence

    ball_0(v) = {v};   ball_r(v) = {v} ∪ ⋃_{v→u} ball_{r-1}(u)

1. ``neighborhood_exact`` — the set union materialized as DISTINCT
   (vertex, member) pairs. Exact, deterministic, SQL-expressible → the
   driver gate hash-compares it against a chained-CTE DuckDB replay. State
   is Σ|ball| rows, which is exponential in r on expanders: this is the
   ORACLE path, honest only for small r / gate-scale graphs.
2. ``hyperball`` — the scale path (HyperBall, Boldi–Rosa–Vigna): each
   vertex carries a fixed-size HyperLogLog sketch of its ball; one round =
   one edge join + one ``hll_union_agg`` per vertex. State is
   O(|V| · 2^lgk) bytes REGARDLESS of ball sizes, the shuffle is
   vertex-sized per round, and the union is performed JVM-side by Spark's
   built-in Datasketches HLL functions — no Python in the loop. HLL
   registers are max-reductions, so the estimate is order-independent and
   deterministic, but not exactly oracle-able against DuckDB's different
   HLL implementation: its gate is the pytest relative-error bound vs the
   exact path (the same gating split as ANN LSH vs brute force).

Output (both): ``(vertex:long, ball_count)`` — exact count (long) or HLL
estimate rounded to a long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import vertices


def _simple_edges(edges: DataFrame, p: int) -> DataFrame:
    return (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(p, "dst")
        .persist()
    )


def neighborhood_exact(
    spark: SparkSession, edges: DataFrame, radius: int
) -> DataFrame:
    """Exact |ball(v, radius)| per vertex (directed out-balls, self counted).

    Fixed-radius contract: exactly ``radius`` expansion rounds — matches
    the chained-CTE oracle round for round.
    """
    if radius < 0:
        raise ValueError("neighborhood_exact: radius must be >= 0")
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = _simple_edges(edges, p)
    ball = vertices(e).select("vertex", F.col("vertex").alias("member"))
    for _ in range(radius):
        grown = (
            e.join(ball.withColumnRenamed("vertex", "dst"), "dst")
            .select(F.col("src").alias("vertex"), "member")
            .unionAll(ball)
            .distinct()
        )
        # truncate lineage each round; the pair table is the real state
        ball = grown.localCheckpoint(eager=True)
    out = ball.groupBy("vertex").agg(F.count("*").alias("ball_count"))
    e.unpersist()
    return out.select(
        F.col("vertex").cast("long").alias("vertex"),
        F.col("ball_count").cast("long").alias("ball_count"),
    )


def hyperball(
    spark: SparkSession, edges: DataFrame, radius: int, *, lgk: int = 12
) -> DataFrame:
    """HyperBall: approximate |ball(v, radius)| with per-vertex HLL
    sketches (2^lgk registers each), unioned along edges for ``radius``
    rounds entirely with Spark's built-in sketch aggregates."""
    if radius < 0:
        raise ValueError("hyperball: radius must be >= 0")
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = _simple_edges(edges, p)
    sk = (
        vertices(e)
        .groupBy("vertex")
        .agg(F.hll_sketch_agg("vertex", F.lit(lgk)).alias("sketch"))
        .localCheckpoint(eager=True)
    )
    for _ in range(radius):
        contrib = e.join(
            sk.withColumnRenamed("vertex", "dst"), "dst"
        ).select(F.col("src").alias("vertex"), "sketch")
        sk = (
            sk.unionAll(contrib)
            .groupBy("vertex")
            .agg(F.hll_union_agg("sketch").alias("sketch"))
            .localCheckpoint(eager=True)
        )
    out = sk.select(
        F.col("vertex").cast("long").alias("vertex"),
        F.round(F.hll_sketch_estimate("sketch")).cast("long").alias("ball_count"),
    )
    e.unpersist()
    return out
