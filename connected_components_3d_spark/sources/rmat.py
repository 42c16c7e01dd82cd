"""Deterministic distributed R-MAT graph generator (Chakrabarti, Zhan,
Faloutsos: "R-MAT: A Recursive Model for Graph Mining", SDM 2004) — the
synthetic edge source every distributed-graph benchmark standardizes on
(Graph500 uses exactly this recursion). Emits power-law-ish, community-
structured edge tables at any scale as a PURE MAP over ``spark.range`` —
no driver-side data, no RNG object, no shuffle: each edge is a function of
its row id, so generation parallelizes embarrassingly to any cluster size
and the output is identical under any partitioning.

Contract (fixed — the DuckDB gate oracle replays it with generate_series;
all arithmetic BIGINT): vertex ids live in [0, 2^scale). Edge i chooses
one quadrant per recursion level l ∈ [0, scale):

    r(i, l)  = (mix(mix(seed, i), l) · mix(mix(seed, l), i)) % M
    mix(a,b) = (a·A + b) % M
    quadrant = 0 if r < ⌊a·M⌋ else 1 if r < ⌊(a+b)·M⌋
               else 2 if r < ⌊(a+b+c)·M⌋ else 3
    src bit l = quadrant ≥ 2,   dst bit l = quadrant odd

with A = 1103515245, M = 2^31 − 1 (the operators/walks.py mix family:
every intermediate < 2^31, every product < 2^62 — Spark long arithmetic ≡
DuckDB overflow-checked BIGINT). The PRODUCT of the two cross-mixes is
load-bearing: a single LCG chain is AFFINE in (i, l), so per-level draws
of one edge form a lattice (step A mod M) whose bit correlations visibly
distort the degree distribution (caught by the skew pytest); the product
term is quadratic in (i, l) and breaks the lattice while keeping every
intermediate DuckDB-replayable. Quadrant frequencies then follow
(a, b, c, d) and the generated graphs show R-MAT's signature skew (hub
degrees ≫ average).
Self-loops and duplicate edges are KEPT (Graph500 semantics) — callers
wanting simple graphs apply the usual hygiene (operators/edges.py).

Scale shape: ``spark.range(n_edges)`` partitions the id space evenly;
src/dst are one static scale-term expression tree per column (whole-stage-
codegen JVM arithmetic, no UDF, no higher-order function). A 10^12-edge
table is just ``n_edges=10^12`` over more partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_M = 2147483647
_A = 1103515245


def rmat_edges(
    spark: SparkSession,
    scale: int,
    n_edges: int,
    *,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """R-MAT edge table ``(edge_id, src, dst)`` with 2^scale vertices —
    see module docstring for the exact deterministic contract. ``d`` is
    implied (1 − a − b − c); defaults are the canonical Graph500/R-MAT
    skew (0.57, 0.19, 0.19, 0.05)."""
    assert 1 <= scale <= 30 and n_edges >= 1
    assert 0 <= seed < _M
    d = 1.0 - a - b - c
    assert min(a, b, c, d) >= 0.0, "quadrant probabilities must be >= 0"
    ta = int(a * _M)
    tb = int((a + b) * _M)
    tc = int((a + b + c) * _M)
    rng = (
        spark.range(n_edges, numPartitions=num_partitions)
        if num_partitions
        else spark.range(n_edges)
    )
    lit = lambda x: F.lit(x).cast("long")  # noqa: E731
    imix = _mix(lit(seed), F.col("id"))
    # per-level quadrant; the bit sums are a static scale-term expression
    # tree (whole-stage-codegen JVM arithmetic, no UDF, no higher-order fn)
    src = lit(0)
    dst = lit(0)
    for l in range(scale):
        lmix = _mix(lit((seed * _A + l) % _M), F.col("id"))
        r = (_mix(imix, lit(l)) * lmix) % lit(_M)
        quad = (
            F.when(r < lit(ta), lit(0))
            .when(r < lit(tb), lit(1))
            .when(r < lit(tc), lit(2))
            .otherwise(lit(3))
        )
        src = src + F.when(quad >= 2, lit(1 << l)).otherwise(lit(0))
        dst = dst + F.when(quad % 2 == 1, lit(1 << l)).otherwise(lit(0))
    return rng.select(
        F.col("id").alias("edge_id"), src.alias("src"), dst.alias("dst")
    )


def _mix(a, b):
    return (a * F.lit(_A).cast("long") + b) % F.lit(_M).cast("long")


def rmat_edges_single_node(
    scale: int,
    n_edges: int,
    *,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
) -> list[tuple[int, int, int]]:
    """Single-node reference — the pytest parity oracle (same contract,
    pure Python ints)."""
    ta = int(a * _M)
    tb = int((a + b) * _M)
    tc = int((a + b + c) * _M)
    out = []
    for i in range(n_edges):
        imix = (seed * _A + i) % _M
        src = dst = 0
        for l in range(scale):
            m1 = (imix * _A + l) % _M
            m2 = (((seed * _A + l) % _M) * _A + i) % _M
            r = (m1 * m2) % _M
            q = 0 if r < ta else 1 if r < tb else 2 if r < tc else 3
            if q >= 2:
                src += 1 << l
            if q % 2 == 1:
                dst += 1 << l
        out.append((i, src, dst))
    return out
