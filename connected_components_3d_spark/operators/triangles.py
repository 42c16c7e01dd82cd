"""Per-edge triangle counting, degree-oriented (SURVEY.md O9).

Each undirected edge (src<dst) gets the number of triangles through it
(= |N(src) ∩ N(dst)|). Degree orientation (edges directed from the
(degree, id)-smaller endpoint to the larger) makes every triangle have
exactly one "apex" with two out-edges, so each triangle is generated once by
a wedge self-join + one closing equi-join — the classic O(E^1.5)-work plan
whose per-vertex wedge fan-out is bounded by arboricity instead of raw degree
(hub-safe at web scale; the same trick the reference's decision tree plays —
avoid redundant neighbor inspections — transposed to joins, SURVEY.md §4.1).

All equi-joins (sort-merge / shuffled-hash picked by Catalyst + AQE); no
disjunctive join conditions; no UDFs.

Measured negative result (round 2): int32-packing the ids — a clear win in
the iterative kernels (cc.py) — made this pipeline 2.5-3x SLOWER at sf0.1
(9.4s → 24-31s; A/B isolated the cast itself, not materialization), so the
ids stay at input width here. Lazy-plan reuse is also already optimal:
Spark's ReuseExchange dedupes the multiple consumers of the canonical edge
set, and an explicit localCheckpoint measured slightly worse (11.3s).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .edges import canonical_undirected


def _oriented(und: DataFrame) -> DataFrame:
    """Orient undirected (src<dst) edges by (deg, id); carries dst's key."""
    deg = (
        und.select(F.col("src").alias("v"))
        .unionByName(und.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        und.join(deg.withColumnRenamed("v", "src"), "src")
        .withColumnRenamed("deg", "src_deg")
        .join(deg.withColumnRenamed("v", "dst"), "dst")
        .withColumnRenamed("deg", "dst_deg")
    )
    fwd_is_src = (F.col("src_deg") < F.col("dst_deg")) | (
        (F.col("src_deg") == F.col("dst_deg")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(fwd_is_src, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd_is_src, F.col("dst")).otherwise(F.col("src")).alias("w"),
        F.when(fwd_is_src, F.col("dst_deg")).otherwise(F.col("src_deg")).alias(
            "w_deg"
        ),
    )


def triangle_list(edges: DataFrame) -> DataFrame:
    """All triangles (a, b, c) — one row each; a = orientation apex."""
    und = canonical_undirected(edges)
    o = _oriented(und)
    e1 = o.select(F.col("u").alias("a"), F.col("w").alias("b"), F.col("w_deg").alias("b_deg"))
    e2 = o.select(F.col("u").alias("a"), F.col("w").alias("c"), F.col("w_deg").alias("c_deg"))
    wedges = e1.join(e2, "a").where(
        (F.col("b_deg") < F.col("c_deg"))
        | ((F.col("b_deg") == F.col("c_deg")) & (F.col("b") < F.col("c")))
    )
    closing = o.select(F.col("u").alias("b"), F.col("w").alias("c"))
    return wedges.join(closing, ["b", "c"]).select("a", "b", "c")


def triangles_per_edge(edges: DataFrame) -> DataFrame:
    """(src, dst, n_tri) per undirected edge with src<dst; zero-triangle
    edges included (FIXTURES.md §5)."""
    und = canonical_undirected(edges)
    tris = triangle_list(edges)
    tri_edges = (
        tris.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionAll(tris.select(F.col("a").alias("x"), F.col("c").alias("y")))
        .unionAll(tris.select(F.col("b").alias("x"), F.col("c").alias("y")))
        .select(
            F.least("x", "y").alias("src"), F.greatest("x", "y").alias("dst")
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_tri"))
    )
    return und.join(tri_edges, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("n_tri", F.lit(0)).alias("n_tri")
    )


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """(vertex, n_tri): triangles incident to each vertex (networkx
    ``triangles`` parity)."""
    tris = triangle_list(edges)
    allv = (
        tris.select(F.col("a").alias("vertex"))
        .unionAll(tris.select(F.col("b").alias("vertex")))
        .unionAll(tris.select(F.col("c").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count("*").alias("n_tri"))
    )
    from .edges import vertices

    return (
        vertices(edges)
        .join(allv, "vertex", "left")
        .select("vertex", F.coalesce("n_tri", F.lit(0)).alias("n_tri"))
    )


def triangle_count(edges: DataFrame) -> int:
    """Total number of distinct triangles."""
    return triangle_list(edges).count()


# ---------------------------------------------------------------------------
# DOULION: sampled approximate total (Tsourakakis et al., KDD 2009)
# ---------------------------------------------------------------------------

_M = 2147483647
_A = 1103515245


def triangle_count_doulion(
    edges: DataFrame, p: tuple[int, int] = (1, 2), *, seed: int = 42
) -> tuple[int, int, float]:
    """Approximate total triangle count by DOULION edge sparsification
    (Tsourakakis, Kang, Miller, Faloutsos: "DOULION: counting triangles in
    massive graphs with a coin", KDD 2009): keep each canonical undirected
    edge independently with probability p, count triangles exactly on the
    sample with the degree-oriented kernel above, scale by 1/p³ — an
    unbiased estimator whose accuracy concentrates as triangles grow
    (their Thm 1), at p³ of the wedge work.

    Determinism contract (``doulion_copart`` replays it in DuckDB —
    hash-exact): ``p`` is a rational (num, den); canonical edge (src <
    dst, operators/edges.py hygiene) survives iff

        mix(mix(seed, src), dst) % den < num,
        mix(a, b) = (a·1103515245 + b) % (2^31 − 1)

    — the walks.py integer-mix family (ideal-mix uniform per edge, exactly
    replayable; vertex ids must sit in [0, 2^31), enforced below with the
    same min/max range check walks.py uses — callers with wider ids, e.g.
    xxhash64-keyed href edges, rescale first). p = (1, 1) keeps every edge
    and reproduces ``triangle_count`` exactly.

    Returns (n_edges_sampled, n_triangles_sampled, estimate)."""
    num, den = p
    assert 1 <= num <= den <= 10_000 and 0 <= seed < _M
    und = canonical_undirected(edges)
    rng = und.agg(
        F.min(F.least("src", "dst")).alias("lo"),
        F.max(F.greatest("src", "dst")).alias("hi"),
    ).collect()[0]
    if rng["lo"] is not None and (rng["lo"] < 0 or rng["hi"] >= _M):
        raise ValueError(
            "triangle_count_doulion requires vertex ids in [0, 2^31): the"
            " keep-predicate's modular mix is negative-unsafe (negative ids"
            " skew sampling probability away from p, and the mix product can"
            f" overflow int64 under ANSI mode; got range"
            f" [{rng['lo']}, {rng['hi']}]). Rescale ids first (e.g. via"
            " operators/keyed.py dense relabeling)."
        )
    lit = lambda x: F.lit(x).cast("long")  # noqa: E731
    keep = (
        (lit(seed) * lit(_A) + F.col("src")) % lit(_M) * lit(_A)
        + F.col("dst")
    ) % lit(_M) % lit(den) < lit(num)
    sampled = und.where(keep)
    n_edges = sampled.count()
    n_tri = triangle_count(sampled)
    scale = (den / num) ** 3
    return n_edges, n_tri, float(n_tri) * scale
