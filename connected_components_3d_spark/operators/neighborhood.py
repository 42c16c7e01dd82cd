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

from dataclasses import dataclass, field

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


def neighborhood_function(
    spark: SparkSession,
    edges: DataFrame,
    max_radius: int,
    *,
    method: str = "exact",
    lgk: int = 12,
) -> DataFrame:
    """The neighborhood function N(r) = Σ_v |ball(v, r)| for r = 0..max_radius
    — the number of (source, destination) pairs within distance ≤ r, the
    statistic behind average-distance / effective-diameter analyses
    ("four degrees of separation").

    ``method='exact'`` folds the DISTINCT-pair ball expansion (the oracle
    path, chained-CTE replayable → driver gate row
    ``neighborhood_function_r3``); ``method='hyperball'`` folds per-round
    HLL estimates (the scale path, vertex-sized state). One scalar action
    per radius either way.

    Output: ``(r:int, n_pairs:long)`` — max_radius+1 rows.
    """
    if max_radius < 0:
        raise ValueError("neighborhood_function: max_radius must be >= 0")
    if method not in ("exact", "hyperball"):
        raise ValueError(f"neighborhood_function: unknown method {method!r}")
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = _simple_edges(edges, p)
    counts: list[tuple[int, int]] = []
    if method == "exact":
        ball = vertices(e).select("vertex", F.col("vertex").alias("member"))
        ball = ball.localCheckpoint(eager=True)
        counts.append((0, ball.count()))
        for r in range(1, max_radius + 1):
            grown = (
                e.join(ball.withColumnRenamed("vertex", "dst"), "dst")
                .select(F.col("src").alias("vertex"), "member")
                .unionAll(ball)
                .distinct()
            )
            ball = grown.localCheckpoint(eager=True)
            counts.append((r, ball.count()))
    else:
        sk = (
            vertices(e)
            .groupBy("vertex")
            .agg(F.hll_sketch_agg("vertex", F.lit(lgk)).alias("sketch"))
            .localCheckpoint(eager=True)
        )
        est = F.round(F.hll_sketch_estimate("sketch")).cast("long")
        counts.append(
            (0, sk.agg(F.sum(est).alias("s")).collect()[0]["s"] or 0)
        )
        for r in range(1, max_radius + 1):
            contrib = e.join(
                sk.withColumnRenamed("vertex", "dst"), "dst"
            ).select(F.col("src").alias("vertex"), "sketch")
            sk = (
                sk.unionAll(contrib)
                .groupBy("vertex")
                .agg(F.hll_union_agg("sketch").alias("sketch"))
                .localCheckpoint(eager=True)
            )
            counts.append(
                (r, sk.agg(F.sum(est).alias("s")).collect()[0]["s"] or 0)
            )
    e.unpersist()
    return spark.createDataFrame(
        [(int(r), int(n)) for r, n in counts], "r int, n_pairs long"
    )


@dataclass
class EffectiveDiameterResult:
    effective_diameter: float
    alpha: float
    nf: list[tuple[int, int]]  # [(r, N(r))], r = 0..R at convergence
    converged: bool  # True iff N(r) stabilized before max_radius
    metrics: list[dict] = field(default_factory=list)


def effective_diameter(
    spark: SparkSession,
    edges: DataFrame,
    *,
    alpha: float = 0.9,
    max_radius: int = 128,
    method: str = "exact",
    lgk: int = 12,
) -> EffectiveDiameterResult:
    """Effective diameter at quantile ``alpha`` (standard HyperBall /
    Boldi–Rosa–Vigna definition): the interpolated r at which the
    neighborhood function first reaches alpha · N(∞), where N(∞) is N(r) at
    the expansion fixpoint (N stops growing — for 'exact' an exact test;
    for 'hyperball' the HLL estimates are monotone under register-max union
    so the same test holds on the estimates).

    Runs the same fold as ``neighborhood_function`` but stops as soon as
    N(r) stabilizes, then interpolates driver-side over the (tiny) N(r)
    sequence: eff_diam = (r-1) + (alpha·N∞ − N(r-1)) / (N(r) − N(r-1)).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("effective_diameter: alpha must be in (0, 1]")
    if method not in ("exact", "hyperball"):
        raise ValueError(f"effective_diameter: unknown method {method!r}")
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = _simple_edges(edges, p)
    nf: list[tuple[int, int]] = []
    converged = False
    if method == "exact":
        state = vertices(e).select("vertex", F.col("vertex").alias("member"))
        state = state.localCheckpoint(eager=True)
        nf.append((0, state.count()))
        for r in range(1, max_radius + 1):
            grown = (
                e.join(state.withColumnRenamed("vertex", "dst"), "dst")
                .select(F.col("src").alias("vertex"), "member")
                .unionAll(state)
                .distinct()
            )
            state = grown.localCheckpoint(eager=True)
            nf.append((r, state.count()))
            if nf[-1][1] == nf[-2][1]:
                converged = True
                break
    else:
        sk = (
            vertices(e)
            .groupBy("vertex")
            .agg(F.hll_sketch_agg("vertex", F.lit(lgk)).alias("sketch"))
            .localCheckpoint(eager=True)
        )
        est = F.round(F.hll_sketch_estimate("sketch")).cast("long")
        nf.append((0, sk.agg(F.sum(est).alias("s")).collect()[0]["s"] or 0))
        for r in range(1, max_radius + 1):
            contrib = e.join(
                sk.withColumnRenamed("vertex", "dst"), "dst"
            ).select(F.col("src").alias("vertex"), "sketch")
            sk = (
                sk.unionAll(contrib)
                .groupBy("vertex")
                .agg(F.hll_union_agg("sketch").alias("sketch"))
                .localCheckpoint(eager=True)
            )
            nf.append((r, sk.agg(F.sum(est).alias("s")).collect()[0]["s"] or 0))
            if nf[-1][1] == nf[-2][1]:
                converged = True
                break
    e.unpersist()
    target = alpha * nf[-1][1]
    if nf[0][1] >= target:
        eff = 0.0
    else:
        eff = float(nf[-1][0])
        for (r0, n0), (_r1, n1) in zip(nf, nf[1:]):
            if n1 >= target:
                eff = r0 + (target - n0) / (n1 - n0)
                break
    return EffectiveDiameterResult(eff, alpha, nf, converged)


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


def eccentricity_exact(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_radius: int = 100,
) -> DataFrame:
    """Per-vertex eccentricity over the symmetrized graph — the radius at
    which v's reachability ball stops growing: ecc(v) = max_u d(v, u)
    within v's component (0 for isolated vertices; unreachable pairs are
    ignored — the per-component convention networkx uses). min ecc over a
    component is its RADIUS (center vertices attain it), max is the
    diameter (periphery attains it) — the center/periphery query this
    serves (which page is structurally central to its cluster).

    Same DISTINCT (vertex, member) pair-state expansion as
    ``neighborhood_exact`` (the ORACLE path — Σ|ball| state; honest for
    gate-scale graphs and small-diameter components; HyperBall saturation
    is the scale-path estimate): per round one edge join + an anti-join
    against the accumulated pairs + a vertex-sized "grew this round"
    update. Stops at the reachability fixpoint (or ``max_radius``, ecc
    then a lower bound). The ``eccentricity_tree`` gate row replays the
    per-round ball counts in DuckDB and derives ecc as the largest
    growth round — hash-exact."""
    assert 1 <= max_radius <= 10_000
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    sym = (
        e0.unionByName(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(p, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    verts = (
        sym.select(F.col("src").alias("vertex")).distinct()
    )
    pairs = verts.select(
        F.col("vertex").alias("v"), F.col("vertex").alias("m")
    ).localCheckpoint(eager=True)
    frontier = pairs
    ecc = verts.select("vertex", F.lit(0).cast("long").alias("ecc"))
    ecc = ecc.localCheckpoint(eager=True)
    for r in range(1, max_radius + 1):
        cand = (
            frontier.join(
                sym.select(F.col("src").alias("m"), F.col("dst").alias("m2")),
                "m",
            )
            .select("v", F.col("m2").alias("m"))
            .distinct()
        )
        new = cand.join(pairs, ["v", "m"], "left_anti").localCheckpoint(
            eager=True
        )
        grew = new.select(F.col("v").alias("vertex")).distinct()
        n_grew = grew.count()
        if n_grew == 0:
            break
        ecc = (
            ecc.join(grew.withColumn("g", F.lit(1)), "vertex", "left")
            .select(
                "vertex",
                F.when(F.col("g").isNotNull(), F.lit(r).cast("long"))
                .otherwise(F.col("ecc"))
                .alias("ecc"),
            )
            .localCheckpoint(eager=True)
        )
        pairs = pairs.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    sym.unpersist()
    return ecc
