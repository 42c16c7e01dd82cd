"""Distance-based centralities — harmonic and closeness — from the same
ball-expansion recurrence as the neighborhood function (O7d/O7d').

For each vertex v let d_r(v) = |ball(v, r)| − |ball(v, r−1)| — the number of
vertices at distance EXACTLY r. Then

    harmonic(v)  = Σ_{r≥1} d_r(v) / r          (Boldi–Vigna "Axioms for
                                                centrality": the one
                                                centrality that is both
                                                monotone and rank-stable on
                                                disconnected web graphs)
    dist_sum(v)  = Σ_{r≥1} r · d_r(v)          (total distance to reachable)
    closeness(v) = (reachable(v) − 1) / dist_sum(v)   (0 when nothing else
                                                       is reachable)

``direction='out'`` measures distances FROM v along edges (matches
``neighborhood_exact``); ``direction='in'`` transposes first — the web-graph
convention (how quickly the rest of the graph reaches v), and what
networkx's ``harmonic_centrality``/``closeness_centrality`` compute.

Two paths share the loop, mirroring operators/neighborhood.py:

1. ``method='exact'`` — DISTINCT (vertex, member) pair state; per round one
   edge join + a vertex-sized count + a vertex-sized accumulator join.
   Exact and chained-CTE replayable → the driver gate hash-compares the
   fixed-radius variant against DuckDB (``harmonic_tree_r3``). State is
   Σ|ball| pairs — the ORACLE path, honest for small radii / gate graphs.
2. ``method='hyperball'`` — per-vertex HLL sketches (HyperBall, §3 of
   Boldi–Rosa–Vigna): vertex-sized state regardless of ball sizes, unions
   JVM-side via Spark's Datasketches aggregates, per-round shuffle is
   vertex-sized. Estimates are monotone under register-max union; deltas
   are clamped at 0 against rounding wobble. Gated by pytest relative-error
   bounds vs the exact path (same split as hyperball itself).

Scale shape (100 TB link graph): the hyperball path is the real one — the
accumulator ride-along keeps everything in ONE vertex-keyed table, so each
round is exactly one edge-join shuffle + one vertex-sized groupBy, with
lineage truncated per round (localCheckpoint).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import vertices
from .neighborhood import _simple_edges


@dataclass
class CentralityResult:
    scores: DataFrame  # vertex, reachable, dist_sum, harmonic, closeness
    num_rounds: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _transpose(edges: DataFrame) -> DataFrame:
    return edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )


def distance_centralities(
    spark: SparkSession,
    edges: DataFrame,
    *,
    direction: str = "in",
    method: str = "exact",
    max_radius: int = 128,
    fixed_radius: int | None = None,
    lgk: int = 12,
) -> CentralityResult:
    """Harmonic + closeness centrality per vertex.

    ``fixed_radius`` runs exactly that many expansion rounds (the
    gate-replayable contract — distances are truncated at the radius);
    otherwise the loop stops when the balls stop growing (global pair
    count / estimate-sum fixpoint), i.e. exact distances.
    """
    if direction not in ("in", "out"):
        raise ValueError(f"distance_centralities: bad direction {direction!r}")
    if method not in ("exact", "hyperball"):
        raise ValueError(f"distance_centralities: unknown method {method!r}")
    if fixed_radius is not None and fixed_radius < 0:
        raise ValueError("distance_centralities: fixed_radius must be >= 0")
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = _simple_edges(
        edges if direction == "out" else _transpose(edges), p
    )
    rounds = fixed_radius if fixed_radius is not None else max_radius
    metrics: list[dict] = []
    converged = False

    if method == "exact":
        ball = (
            vertices(e)
            .select("vertex", F.col("vertex").alias("member"))
            .localCheckpoint(eager=True)
        )
        # accumulator rides in a separate vertex-keyed table: prev ball
        # count, harmonic partial sum, total-distance partial sum
        acc = ball.select(
            "vertex",
            F.lit(1).cast("long").alias("prev"),
            F.lit(0.0).alias("harmonic"),
            F.lit(0).cast("long").alias("dist_sum"),
        ).localCheckpoint(eager=True)
        total = acc.count()  # == N(0): one pair per vertex
        r_done = 0
        for r in range(1, rounds + 1):
            grown = (
                e.join(ball.withColumnRenamed("vertex", "dst"), "dst")
                .select(F.col("src").alias("vertex"), "member")
                .unionAll(ball)
                .distinct()
            )
            ball = grown.localCheckpoint(eager=True)
            new_total = ball.count()
            cnt = ball.groupBy("vertex").agg(F.count("*").alias("cnt"))
            delta = F.col("cnt") - F.col("prev")
            acc = (
                acc.join(cnt, "vertex")  # every vertex keeps >= its self row
                .select(
                    "vertex",
                    F.col("cnt").alias("prev"),
                    (F.col("harmonic") + delta / F.lit(float(r))).alias(
                        "harmonic"
                    ),
                    (F.col("dist_sum") + F.lit(r) * delta).alias("dist_sum"),
                )
                .localCheckpoint(eager=True)
            )
            r_done = r
            metrics.append({"r": r, "pairs": new_total})
            if new_total == total:
                converged = True
                break
            total = new_total
    else:
        sk = (
            vertices(e)
            .groupBy("vertex")
            .agg(F.hll_sketch_agg("vertex", F.lit(lgk)).alias("sketch"))
            .select(
                "vertex",
                "sketch",
                F.hll_sketch_estimate("sketch").alias("prev"),
                F.lit(0.0).alias("harmonic"),
                F.lit(0.0).alias("dist_sum"),
            )
            .localCheckpoint(eager=True)
        )
        total = sk.agg(F.sum("prev")).collect()[0][0] or 0.0
        r_done = 0
        for r in range(1, rounds + 1):
            contrib = e.join(
                sk.select(F.col("vertex").alias("dst"), "sketch"), "dst"
            ).select(F.col("src").alias("vertex"), "sketch")
            merged = (
                sk.select("vertex", "sketch")
                .unionAll(contrib)
                .groupBy("vertex")
                .agg(F.hll_union_agg("sketch").alias("sketch"))
            )
            est = F.hll_sketch_estimate("sketch")
            # register-max union makes estimates monotone per vertex;
            # greatest(.,0) guards the floating estimator's wobble anyway
            delta = F.greatest(est - F.col("prev"), F.lit(0.0))
            sk = (
                merged.join(
                    sk.select("vertex", "prev", "harmonic", "dist_sum"),
                    "vertex",
                )
                .select(
                    "vertex",
                    "sketch",
                    est.alias("prev"),
                    (F.col("harmonic") + delta / F.lit(float(r))).alias(
                        "harmonic"
                    ),
                    (F.col("dist_sum") + F.lit(float(r)) * delta).alias(
                        "dist_sum"
                    ),
                )
                .localCheckpoint(eager=True)
            )
            r_done = r
            new_total = sk.agg(F.sum("prev")).collect()[0][0] or 0.0
            metrics.append({"r": r, "est_pairs": new_total})
            if new_total == total:
                converged = True
                break
            total = new_total
        acc = sk.select(
            "vertex",
            F.round("prev").cast("long").alias("prev"),
            "harmonic",
            F.round("dist_sum").cast("long").alias("dist_sum"),
        )

    e.unpersist()
    scores = acc.select(
        F.col("vertex").cast("long").alias("vertex"),
        F.col("prev").cast("long").alias("reachable"),
        F.col("dist_sum").cast("long").alias("dist_sum"),
        F.col("harmonic").cast("double").alias("harmonic"),
        F.when(F.col("dist_sum") > 0,
               (F.col("prev") - F.lit(1)).cast("double") / F.col("dist_sum"))
        .otherwise(F.lit(0.0))
        .alias("closeness"),
    )
    return CentralityResult(scores, r_done, converged, metrics)
