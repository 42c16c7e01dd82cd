"""Weisfeiler–Leman (1-WL) color refinement — the canonical structural-role
/ graph-fingerprint iteration (Weisfeiler & Leman 1968; the WL-kernel of
Shervashidze et al. 2011, and the expressiveness yardstick of the GNN
literature): vertices start colored by degree and repeatedly re-color by
``hash(own color, sorted multiset of neighbor colors)`` — after r rounds two
vertices share a color iff 1-WL cannot distinguish their r-hop unrolled
neighborhoods.  Uses: role discovery over a link graph, near-isomorphism
bucketing of extracted subgraphs (e.g. template detection across site
boilerplate), and cheap graph-level fingerprints for dedup of structures.

Contract (replayed bit-for-bit by the gate oracle and the single-node
reference):

- the graph is SYMMETRIZED and deduplicated (classic undirected 1-WL);
  self-loops count as a single neighbor occurrence of the vertex itself;
- round-0 color = md5(CAST(degree AS STRING)) (degree in the symmetrized
  distinct-edge graph);
- round t+1 color = md5(prev_color || '|' || ','-join of the ASCENDING-
  sorted list of neighbor prev_colors) — md5 is the cross-engine hash
  (driver_queries.py float-parity rules);
- vertex set = edge endpoints (an edge-list carries no isolated vertices);
- ``wl_signature`` = md5 of the ';'-joined ascending-sorted
  ``color:count`` class histogram — equal for isomorphic graphs by
  construction (relabel-invariant).

Scale shape: per round, ONE edge⋈color join + ONE vertex-keyed
collect_list/sort aggregation — vertex-sized shuffles on high-cardinality
keys, scalar-free, no windows, no Python.  The per-vertex sorted-concat
string is O(degree); on hub-heavy web graphs cap the working degree
upstream (operators/edges.py fanout cap) or accept the skew — the same
caveat every published distributed WL implementation carries.  Lineage is
truncated by persisting each round's color table (rounds are typically
2–4; WL stabilizes in O(diameter) rounds).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class WLResult:
    colors: DataFrame  # (vertex: long, color: string md5-hex)
    rounds: int


def _symmetrize(edges: DataFrame) -> DataFrame:
    e = edges.select(
        F.col("src").cast("long").alias("u"), F.col("dst").cast("long").alias("v")
    )
    return e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()


def wl_colors(
    spark: SparkSession, edges: DataFrame, *, rounds: int = 2
) -> WLResult:
    """1-WL refinement for ``rounds`` iterations over the symmetrized
    graph; returns the per-vertex color table."""
    if rounds < 0:
        raise ValueError(f"wl_colors: rounds must be >= 0, got {rounds}")
    e = _symmetrize(edges).persist()
    color = (
        e.groupBy(F.col("u").alias("vertex"))
        .agg(F.count("*").alias("d"))
        .select("vertex", F.md5(F.col("d").cast("string")).alias("color"))
        .persist()
    )
    color.count()
    for _ in range(rounds):
        nb = (
            e.join(color.withColumnRenamed("vertex", "v"), "v")
            .groupBy(F.col("u").alias("vertex"))
            .agg(
                F.array_join(
                    F.sort_array(F.collect_list("color")), ","
                ).alias("nbc")
            )
        )
        nxt = (
            color.join(nb, "vertex")
            .select(
                "vertex",
                F.md5(F.concat_ws("|", "color", "nbc")).alias("color"),
            )
            .persist()
        )
        nxt.count()
        color.unpersist()
        color = nxt
    e.unpersist()
    return WLResult(colors=color, rounds=rounds)


def wl_signature(
    spark: SparkSession, edges: DataFrame, *, rounds: int = 2
) -> DataFrame:
    """One-row (signature: string, n_classes: long, n_vertices: long) —
    the relabel-invariant graph fingerprint over the WL color histogram."""
    colors = wl_colors(spark, edges, rounds=rounds).colors
    hist = colors.groupBy("color").agg(F.count("*").alias("n"))
    return hist.agg(
        F.md5(
            F.array_join(
                F.sort_array(
                    F.collect_list(F.concat_ws(":", "color", "n"))
                ),
                ";",
            )
        ).alias("signature"),
        F.count("*").alias("n_classes"),
        F.sum("n").alias("n_vertices"),
    )


def wl_colors_single_node(
    edge_list: list[tuple[int, int]], rounds: int = 2
) -> dict[int, str]:
    """{vertex: color} under the module contract — pytest parity oracle."""
    import hashlib

    def h(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    adj: dict[int, set[tuple[int, int]]] = {}
    und = set()
    for s, d in edge_list:
        und.add((s, d))
        und.add((d, s))
    for u, v in und:
        adj.setdefault(u, set()).add((u, v))
    color = {u: h(str(len(nbrs))) for u, nbrs in adj.items()}
    for _ in range(rounds):
        color = {
            u: h(
                color[u]
                + "|"
                + ",".join(sorted(color[v] for (_, v) in nbrs))
            )
            for u, nbrs in adj.items()
        }
    return color
