"""Minimum spanning forest via Borůvka rounds — the canonical distributed
MSF algorithm (Borůvka 1926; the MapReduce/Pregel standard since it needs
no priority queue): each round, every component selects its minimum-weight
incident cross edge, all selected edges join the forest at once, and the
touched components contract. O(log V) rounds (component count at least
halves per round — every component is merged by its own selection).

Determinism / uniqueness contract: edges are totally ordered by the
lexicographic key (weight, u, v) (u < v canonical). Under a total order the
MSF is UNIQUE (the cut property applied to the perturbed weights), and
Borůvka with per-component argmin over that order produces exactly it —
the same forest Kruskal would build scanning edges in (weight, u, v) order.
That is what makes the operator gate-able: the driver gate's fixture is the
TPC-H tree forest (every forest edge is trivially in the MSF) plus the
25-edge nation ring at strictly higher weights, and the DuckDB oracle
replays a 25-step Kruskal over just the ring as a chained CTE — an
INDEPENDENT computation of the same unique answer (`msf_tree_ring`).

Scale shape: per round (a) one E-sized double label-join re-labelling edge
endpoints (the standard Borůvka shuffle), after which INTRA-component edges
are dropped for good — the edge table shrinks monotonically; (b) one
component-keyed MIN over the lexicographic struct (native min on struct =
lexicographic — no UDF); (c) the contraction, delegated to the engine's CC
kernel over the SELECTED component graph only (≤ one edge per component,
shrinking geometrically); (d) one V-sized label-update join. ONE scalar
count action per round; forest edges accumulate by union with lineage
truncated via localCheckpoint.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cc import connected_components


@dataclass
class MSFResult:
    # (u:long, v:long, weight:long) with u < v — the unique MSF under the
    # (weight, u, v) total order
    forest: DataFrame
    total_weight: int
    num_edges: int
    num_rounds: int
    metrics: list[dict] = field(default_factory=list)


def minimum_spanning_forest(
    spark: SparkSession,
    edges: DataFrame,
    *,
    weight_col: str = "weight",
    max_rounds: int = 64,
) -> MSFResult:
    """Minimum spanning forest of the UNDIRECTED weighted graph given by
    ``edges`` (src, dst, ``weight_col``; direction and duplicates ignored,
    self-loops dropped, parallel edges collapsed to their minimum
    (weight, u, v) key). Integer weights required — the exactness contract
    (float weights would make cross-engine argmin hash-fragile)."""
    wtype = dict(edges.dtypes).get(weight_col)
    if wtype not in ("int", "bigint", "smallint", "tinyint"):
        raise ValueError(
            f"minimum_spanning_forest requires an integer weight column"
            f" (got {weight_col!r}: {wtype}) — the exactness contract"
        )
    e = (
        edges.select(
            F.least(F.col("src").cast("long"), F.col("dst").cast("long")).alias(
                "u"
            ),
            F.greatest(
                F.col("src").cast("long"), F.col("dst").cast("long")
            ).alias("v"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    # labels start as identity over the vertex set
    labels = (
        e.select(F.col("u").alias("vertex"))
        .unionByName(e.select(F.col("v").alias("vertex")))
        .distinct()
        .select("vertex", F.col("vertex").alias("comp"))
        .localCheckpoint(eager=True)
    )
    live = e  # cross-component edges only (pruned as labels coarsen)
    forest_parts: list[DataFrame] = []
    metrics: list[dict] = []
    rounds = 0
    n_live = live.count()
    while n_live > 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"minimum_spanning_forest failed to converge in {max_rounds}"
                f" rounds ({n_live} cross edges live) — components at least"
                " halve per round, so this indicates a bug"
            )
        t0 = time.time()
        # relabel endpoints, drop intra-component edges for good
        lab_u = labels.select(
            F.col("vertex").alias("u"), F.col("comp").alias("cu")
        )
        lab_v = labels.select(
            F.col("vertex").alias("v"), F.col("comp").alias("cv")
        )
        cross = (
            live.join(lab_u, "u")
            .join(lab_v, "v")
            .where(F.col("cu") != F.col("cv"))
            .localCheckpoint(eager=True)
        )
        live = cross.select("u", "v", "w")
        n_live = cross.count()
        if n_live == 0:
            break
        # per-component argmin over the (w, u, v) lexicographic order:
        # native min on a struct IS lexicographic — no UDF
        sel_key = F.struct(
            F.col("w"), F.col("u"), F.col("v"), F.col("cu"), F.col("cv")
        )
        picked = (
            cross.select(F.col("cu").alias("c"), sel_key.alias("k"))
            .unionByName(cross.select(F.col("cv").alias("c"), sel_key.alias("k")))
            .groupBy("c")
            .agg(F.min("k").alias("k"))
            .select("k.w", "k.u", "k.v", "k.cu", "k.cv")
            .distinct()  # an edge may be both endpoints' pick
            .localCheckpoint(eager=True)
        )
        forest_parts.append(picked.select("u", "v", "w"))
        # contract: CC over the selected component graph (≤1 edge/component)
        comp_cc = connected_components(
            spark,
            picked.select(F.col("cu").alias("src"), F.col("cv").alias("dst")),
            method="hashmin",
        ).components
        labels = (
            labels.join(
                comp_cc.withColumnRenamed("vertex", "comp"),
                "comp",
                "left",
            )
            .select(
                "vertex",
                F.coalesce("component", "comp").alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        metrics.append(
            {
                "round": rounds,
                "cross_edges": n_live,
                "picked": picked.count(),
                "wall_s": round(time.time() - t0, 4),
            }
        )
    if forest_parts:
        forest = reduce(DataFrame.unionByName, forest_parts).localCheckpoint(
            eager=True
        )
    else:
        forest = e.select("u", "v", "w").limit(0)
    agg = forest.agg(
        F.coalesce(F.sum("w"), F.lit(0)).alias("tw"),
        F.count("*").alias("n"),
    ).collect()[0]
    return MSFResult(
        forest.select(
            "u", "v", F.col("w").alias("weight")
        ),
        int(agg["tw"]),
        int(agg["n"]),
        rounds,
        metrics,
    )


def minimum_spanning_forest_single_node(
    triples: list[tuple[int, int, int]],
) -> list[tuple[int, int, int]]:
    """Single-node reference — Kruskal over the identical (w, u, v) total
    order with union-find (the unique MSF Borůvka must reproduce)."""
    best: dict[tuple[int, int], int] = {}
    for a, b, w in triples:
        if a == b:
            continue
        u, v = (a, b) if a < b else (b, a)
        if (u, v) not in best or w < best[(u, v)]:
            best[(u, v)] = w
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out: list[tuple[int, int, int]] = []
    for (u, v), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.append((u, v, w))
    return sorted(out)
