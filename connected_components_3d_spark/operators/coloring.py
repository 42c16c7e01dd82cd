"""Deterministic greedy graph coloring via Jones–Plassmann rounds — the
standard distributed colorer (Jones & Plassmann 1993): a vertex colors
itself once every higher-priority (smaller-key) neighbour is colored,
taking the smallest colour absent among its already-colored neighbours.
Colouring partitions a link graph into conflict-free batches — scheduling
crawl/recompute waves, register-allocating adjacency updates, or bounding
chromatic structure of co-citation graphs.

Priorities are the operators/mis.py tie-free integer-mix keys

    key(v) = mix(mix(seed, v), 0) * M + v,
    mix(a, b) = (a * 1103515245 + b) % M,    M = 2147483647

so Spark and DuckDB compute identical values (products < 2^62) and the
whole colouring is DETERMINISTIC: it equals the sequential greedy colouring
in key order. Proof of the round invariant: a vertex is "ready" in round r
iff it has no uncoloured smaller-key neighbour; inductively, every coloured
neighbour of a ready vertex has a SMALLER key (a larger-key neighbour
coloured earlier would itself have had an uncoloured smaller-key neighbour
— this vertex — a contradiction), so the mex each vertex takes is exactly
the sequential greedy's mex, and every round's ready set is precisely the
next block of the greedy order. Rounds = length of the longest
key-decreasing path — O(log n / log log n) w.h.p. on bounded-degree graphs,
but Θ(k) inside a k-clique (every clique member waits for all smaller-key
members: JP is inherently sequential on cliques — measured 207 rounds on
the clique-rich sf0.01 copart graph vs 5 on the tree ∪ ring fixture). Use
on SPARSE link graphs; for clique-dense graphs prefer the O33 iterated-MIS
route or accept the depth.

Scale shape (the MIS/kcore peel envelope): state is a SHRINKING uncoloured
vertex table + induced live-edge table, plus a GROWING coloured table, all
localCheckpoint-ed per round. Each round: one vertex-keyed MIN (the ready
test), one join + collect_set aggregate for the mex (the sorted-set fold is
a native higher-order ``aggregate`` — no Python), two anti/semi-joins, and
ONE scalar count action. The mex fold is exact because the colour array is
sorted-distinct: mex = fold(acc=0; x==acc ? acc+1 : acc).

The driver gate hash-compares the output against a fixed-round chained-CTE
DuckDB replay with the mex computed by candidate-range anti-join
(`coloring_copart`).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_M = 2147483647
_A = 1103515245


@dataclass
class ColoringResult:
    # (vertex:long, color:long) — proper colouring: adjacent vertices get
    # distinct colours; colours per vertex ≤ degree + 1
    colors: DataFrame
    num_colors: int
    num_rounds: int
    metrics: list[dict] = field(default_factory=list)


def greedy_coloring(
    spark: SparkSession,
    edges: DataFrame,
    *,
    seed: int = 42,
    max_rounds: int = 500,
) -> ColoringResult:
    """Jones–Plassmann greedy colouring of the UNDIRECTED graph given by
    ``edges`` (src, dst; direction and duplicates ignored, self-loops
    dropped) per the module-docstring deterministic contract. Vertex ids
    must lie in [0, 2^31) — the mis.py/matching.py determinism guard."""
    assert 0 <= seed < _M
    e = (
        edges.select(
            F.least(F.col("src").cast("long"), F.col("dst").cast("long")).alias(
                "u"
            ),
            F.greatest(
                F.col("src").cast("long"), F.col("dst").cast("long")
            ).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    rng = e.agg(F.min("u").alias("lo"), F.max("v").alias("hi")).collect()[0]
    if rng["lo"] is not None and (rng["lo"] < 0 or rng["hi"] >= _M):
        raise ValueError(
            "greedy_coloring requires vertex ids in [0, 2^31): the priority"
            " determinism contract does negative-unsafe modular arithmetic"
            f" (got range [{rng['lo']}, {rng['hi']}])"
        )

    def key_of(col):
        m1 = (
            F.lit(seed).cast("long") * F.lit(_A).cast("long") + col
        ) % F.lit(_M).cast("long")
        m2 = (m1 * F.lit(_A).cast("long")) % F.lit(_M).cast("long")
        return m2 * F.lit(_M).cast("long") + col

    # both orientations, for gathering coloured-neighbour colours
    adj = (
        e.select(F.col("u").alias("vertex"), F.col("v").alias("nbr"))
        .unionByName(e.select(F.col("v").alias("vertex"), F.col("u").alias("nbr")))
        .localCheckpoint(eager=True)
    )
    uncol = (
        adj.select("vertex")
        .distinct()
        .select("vertex", key_of(F.col("vertex")).alias("key"))
        .localCheckpoint(eager=True)
    )
    live_e = e.select(
        "u", "v", key_of(F.col("u")).alias("ku"), key_of(F.col("v")).alias("kv")
    ).localCheckpoint(eager=True)
    colored = uncol.select(
        "vertex", F.lit(0).cast("long").alias("color")
    ).limit(0)
    metrics: list[dict] = []
    rounds = 0
    n_uncol = uncol.count()
    while n_uncol > 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"greedy_coloring failed to converge in {max_rounds} rounds"
                f" ({n_uncol} vertices still uncoloured) — priorities are"
                " tie-free, so this indicates a bug, not an input property"
            )
        t0 = time.time()
        nbr_min = (
            live_e.select(F.col("u").alias("vertex"), F.col("kv").alias("nk"))
            .unionByName(
                live_e.select(F.col("v").alias("vertex"), F.col("ku").alias("nk"))
            )
            .groupBy("vertex")
            .agg(F.min("nk").alias("mn"))
        )
        ready = (
            uncol.join(nbr_min, "vertex", "left")
            .where(F.col("mn").isNull() | (F.col("key") < F.col("mn")))
            .select("vertex")
        )
        # mex over already-coloured neighbours (all smaller-key — docstring
        # invariant); sorted-distinct fold, JVM-side higher-order function
        nbr_colors = (
            adj.join(ready, "vertex", "left_semi")
            .join(
                colored.withColumnRenamed("vertex", "nbr"),
                "nbr",
            )
            .groupBy("vertex")
            .agg(F.array_sort(F.collect_set("color")).alias("cs"))
        )
        newly = (
            ready.join(nbr_colors, "vertex", "left")
            .select(
                "vertex",
                F.aggregate(
                    F.coalesce("cs", F.array().cast("array<long>")),
                    F.lit(0).cast("long"),
                    lambda acc, x: F.when(x == acc, acc + F.lit(1).cast("long"))
                    .otherwise(acc),
                ).alias("color"),
            )
            .localCheckpoint(eager=True)
        )
        colored = colored.unionByName(newly).localCheckpoint(eager=True)
        uncol = uncol.join(newly, "vertex", "left_anti").localCheckpoint(
            eager=True
        )
        live_e = (
            live_e.join(
                newly.withColumnRenamed("vertex", "u"), "u", "left_anti"
            )
            .join(newly.withColumnRenamed("vertex", "v"), "v", "left_anti")
            .localCheckpoint(eager=True)
        )
        n_uncol = uncol.count()
        metrics.append(
            {
                "round": rounds,
                "uncolored": n_uncol,
                "wall_s": round(time.time() - t0, 4),
            }
        )
    ncol_row = colored.agg(F.max("color").alias("m")).collect()[0]
    num_colors = int(ncol_row["m"]) + 1 if ncol_row["m"] is not None else 0
    return ColoringResult(colored, num_colors, rounds, metrics)


def greedy_coloring_single_node(
    pairs: list[tuple[int, int]], *, seed: int = 42
) -> dict[int, int]:
    """Single-node reference — sequential greedy mex colouring over the
    identical key order (the parallel rounds provably compute exactly
    this)."""
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    verts = {x for p in es for x in p}
    nbrs: dict[int, set[int]] = {v: set() for v in verts}
    for u, v in es:
        nbrs[u].add(v)
        nbrs[v].add(u)

    def key(v):
        return ((seed * _A + v) % _M) * _A % _M * _M + v

    colors: dict[int, int] = {}
    for v in sorted(verts, key=key):
        used = {colors[n] for n in nbrs[v] if n in colors}
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    return colors
