"""Attack-robustness curve — hub-removal tolerance of the giant component
(Albert, Jeong, Barabási: "Error and attack tolerance of complex
networks", Nature 2000; Broder et al. WWW 2000 ran the same ablation on
the web graph): remove the highest-degree vertices and watch what happens
to the connectivity structure. The classic finding this operator
reproduces: scale-free graphs shrug off random failures but disintegrate
under targeted hub removal.

Contract (deterministic, degree-class based — the gate oracle replays it
with window SQL + a recursive-CTE min-label closure): degree = number of
DISTINCT neighbors in the symmetrized self-loop-free graph. For each
requested fraction f with budget ⌊f · V⌋, the removal set is the union of
the LARGEST WHOLE DEGREE CLASSES that fit the budget: cutoff(f) = the
smallest degree d such that |{v : deg(v) ≥ d}| ≤ budget, and every vertex
with deg ≥ cutoff is removed (n_removed ≤ budget, reported exactly).
Whole-class removal keeps the contract scale-clean — no global top-k sort,
no tie-splitting inside a possibly-huge degree class; the cutoffs come
from the degree HISTOGRAM (one degree-keyed aggregate; #distinct degrees
≪ V on web-shaped graphs; asserted ≤ 1e6 before the driver collect).
f = 0 rows report the intact graph. Per fraction the survivors' subgraph
goes through the production CC kernel (operators/cc.py). Output row per
fraction: (fraction, cutoff_degree, n_removed, n_vertices_left,
n_edges_left, n_components, gcc_size); cutoff_degree is NULL for f = 0,
isolated survivors count as singleton components via degree-0 handling —
vertices, not edges, are what survive removal.

Scale shape: one symmetrize+distinct layout pass (persisted, reused by
every fraction), one histogram aggregate (driver sees ≤ #distinct-degrees
rows — scalars-only rule kept), then per fraction one broadcast-able
anti-join filter plus the CC kernel's own scale machinery. Fractions are
few (a curve, not a sweep); the edge cache is shared across them.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class RobustnessResult:
    # one row per fraction: (fraction, cutoff_degree, n_removed,
    #   n_vertices_left, n_edges_left, n_components, gcc_size)
    curve: DataFrame
    metrics: list[dict] = field(default_factory=list)


def attack_robustness(
    spark: SparkSession,
    edges: DataFrame,
    fractions: list[float] = [0.0, 0.01, 0.05],
    *,
    max_distinct_degrees: int = 1_000_000,
    cc_method: str = "blockuf",
) -> RobustnessResult:
    """Targeted hub-removal robustness curve over the DIRECTED edge table
    ``(src, dst)`` — see module docstring for the exact contract."""
    from .cc import connected_components

    assert fractions and all(0.0 <= f < 1.0 for f in fractions)
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    sym = (
        e0.unionByName(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(p, "src")
        .persist()
    )
    deg = (
        sym.groupBy(F.col("src").alias("vertex"))
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    n_verts = deg.count()
    if n_verts == 0:
        sym.unpersist()
        deg.unpersist()
        empty = spark.createDataFrame(
            [],
            "fraction double, cutoff_degree long, n_removed long,"
            " n_vertices_left long, n_edges_left long, n_components long,"
            " gcc_size long",
        )
        return RobustnessResult(empty, [])
    hist_rows = deg.groupBy("deg").count().collect()
    assert len(hist_rows) <= max_distinct_degrees, (
        "degree histogram too wide for the driver collect"
    )
    # survivors-above cutoff: tail counts per degree, descending
    hist = sorted(
        ((int(r["deg"]), int(r["count"])) for r in hist_rows), reverse=True
    )
    rows = []
    metrics: list[dict] = []
    for f in fractions:
        t0 = time.time()
        budget = int(f * n_verts)
        cutoff = None
        n_removed = 0
        tail = 0
        for d, c in hist:  # degrees descending
            if tail + c > budget:
                break
            tail += c
            cutoff = d
        if cutoff is not None:
            n_removed = tail
        if f == 0.0 or cutoff is None:
            cutoff_out, n_removed = None, 0
            surv_edges = sym
            n_left = n_verts
        else:
            cutoff_out = cutoff
            keep = deg.where(F.col("deg") < cutoff).select("vertex")
            surv_edges = sym.join(
                keep.withColumnRenamed("vertex", "src"), "src"
            ).join(keep.withColumnRenamed("vertex", "dst"), "dst")
            n_left = n_verts - n_removed
        n_edges_left = surv_edges.count() // 2
        if n_edges_left > 0:
            comp = connected_components(
                spark,
                surv_edges.where(F.col("src") < F.col("dst")),
                method=cc_method,
            ).components
            sizes = comp.groupBy("component").count()
            agg = sizes.agg(
                F.count("*").alias("nc"), F.max("count").alias("gcc")
            ).collect()[0]
            n_in_comps = comp.count()
            n_comp = int(agg["nc"]) + (n_left - n_in_comps)
            gcc = int(agg["gcc"]) if n_left else 0
        else:
            n_comp = n_left
            gcc = 1 if n_left else 0
        rows.append(
            (
                float(f),
                cutoff_out,
                n_removed,
                n_left,
                n_edges_left,
                n_comp,
                gcc,
            )
        )
        metrics.append(
            {"fraction": f, "wall_s": round(time.time() - t0, 4)}
        )
    sym.unpersist()
    deg.unpersist()
    curve = spark.createDataFrame(
        rows,
        "fraction double, cutoff_degree long, n_removed long,"
        " n_vertices_left long, n_edges_left long, n_components long,"
        " gcc_size long",
    )
    return RobustnessResult(curve, metrics)


_M = 2147483647
_A = 1103515245


def random_failure_robustness(
    spark: SparkSession,
    edges: DataFrame,
    fractions: list[tuple[int, int]] = [(0, 1), (1, 10), (3, 10)],
    *,
    seed: int = 42,
    cc_method: str = "blockuf",
) -> RobustnessResult:
    """The RANDOM-failure half of the Albert–Jeong–Barabási experiment —
    the control arm ``attack_robustness`` is contrasted against: remove
    each vertex independently with probability f (a rational (num, den)
    so the predicate stays integer-exact), rerun CC, report the same
    curve columns. On scale-free graphs this curve stays flat where the
    targeted curve collapses — the "robust yet fragile" signature.

    Determinism contract: vertex v is removed iff
    mix(seed, v) % den < num (the walks.py mix family; requires vertex
    ids ≥ 0, asserted). The ``fraction`` column reports num/den as a
    double; ``cutoff_degree`` is NULL (no degree cutoff exists here);
    ``n_removed`` is the realized count, which concentrates on f·V.

    Scale shape: identical to ``attack_robustness`` minus the histogram —
    the removal predicate is a map-side filter on the shared persisted
    layout; per fraction one filter + the CC kernel."""
    from .cc import connected_components

    assert fractions and all(
        0 <= num <= den and 1 <= den <= 10_000 for num, den in fractions
    )
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    sym = (
        e0.unionByName(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(p, "src")
        .persist()
    )
    deg = (
        sym.groupBy(F.col("src").alias("vertex"))
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    n_verts = deg.count()
    if n_verts == 0:
        sym.unpersist()
        deg.unpersist()
        empty = spark.createDataFrame(
            [],
            "fraction double, cutoff_degree long, n_removed long,"
            " n_vertices_left long, n_edges_left long, n_components long,"
            " gcc_size long",
        )
        return RobustnessResult(empty, [])
    lo = deg.agg(F.min("vertex").alias("lo")).collect()[0]["lo"]
    if lo < 0:
        sym.unpersist()
        deg.unpersist()
        raise ValueError(
            "random_failure_robustness requires vertex ids >= 0 (mix"
            f" predicate; got min id {lo})"
        )
    lit = lambda x: F.lit(x).cast("long")  # noqa: E731
    rows = []
    metrics: list[dict] = []
    for num, den in fractions:
        t0 = time.time()
        keep_pred = (lit(seed) * lit(_A) + F.col("vertex")) % lit(_M) % lit(
            den
        ) >= lit(num)
        keep = deg.where(keep_pred).select("vertex")
        n_left = keep.count()
        n_removed = n_verts - n_left
        surv_edges = sym.join(
            keep.withColumnRenamed("vertex", "src"), "src"
        ).join(keep.withColumnRenamed("vertex", "dst"), "dst")
        n_edges_left = surv_edges.count() // 2
        if n_edges_left > 0:
            comp = connected_components(
                spark,
                surv_edges.where(F.col("src") < F.col("dst")),
                method=cc_method,
            ).components
            sizes = comp.groupBy("component").count()
            agg = sizes.agg(
                F.count("*").alias("nc"), F.max("count").alias("gcc")
            ).collect()[0]
            n_in_comps = comp.count()
            n_comp = int(agg["nc"]) + (n_left - n_in_comps)
            gcc = int(agg["gcc"]) if n_left else 0
        else:
            n_comp = n_left
            gcc = 1 if n_left else 0
        rows.append(
            (num / den, None, n_removed, n_left, n_edges_left, n_comp, gcc)
        )
        metrics.append(
            {"fraction": num / den, "wall_s": round(time.time() - t0, 4)}
        )
    sym.unpersist()
    deg.unpersist()
    curve = spark.createDataFrame(
        rows,
        "fraction double, cutoff_degree long, n_removed long,"
        " n_vertices_left long, n_edges_left long, n_components long,"
        " gcc_size long",
    )
    return RobustnessResult(curve, metrics)
